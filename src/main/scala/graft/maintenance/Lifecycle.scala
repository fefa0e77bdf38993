package graft.maintenance

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse pause/resume lifecycle — the engine-side analog of the
  * reference's suspend/resume automation (reference:
  * samples/automation/SuspendOrPauseAzureSQLDataWarehouse/suspendorpauseazuresqldatawarehouse.ps1,
  * samples/automation/ResumeAzureSQLDataWarehouse/resumeazuresqldwhdatabase.ps1)
  * and the ADF management-operations Pause/Resume action pair
  * (reference: samples/adf/management-operations/ActionType.cs).
  *
  * Semantics kept from the reference model:
  *  - Pause releases COMPUTE while storage and the warehouse catalog
  *    persist: here the session (Spark's unit of compute posture — its
  *    function registry, temp views, cached blocks, conf) is torn down,
  *    while the shared external catalog (permanent tables, their
  *    [[graft.catalog.TablePolicy]] TBLPROPERTIES, schemas) survives —
  *    exactly the split the reference has between the paused compute
  *    tier and durable storage;
  *  - session-scoped temp state DIES with the pause, as the reference's
  *    #temp tables die when pause kills sessions — documented, asserted,
  *    not an accident;
  *  - pausing an already-paused warehouse and resuming an online one are
  *    polite no-ops with a journal entry, matching the runbooks' state
  *    checks ("already paused"/"already online") rather than errors;
  *  - connection attempts against a paused warehouse fail fast (the
  *    reference returns a not-available error to logins);
  *  - every transition lands in an append-only journal surfaced as a
  *    DataFrame — the engine's uniform observability channel, like
  *    [[Autoscaler]]'s DwScaleLogs;
  *  - resume rebuilds the compute posture: engine function surface
  *    ([[graft.functions.TSqlRegistry]]) re-registered, and the current
  *    service objective re-applied through the paired [[Autoscaler]] so
  *    the parallelism knob survives the pause (the reference resumes at
  *    the pre-pause DWU).
  *
  * On a real cluster the teardown maps to dynamic-allocation-to-zero /
  * releasing executors; `builder` is where a deployment hooks its cluster
  * manager. Locally `spark.newSession()` models it: fresh session state
  * over the same durable shared catalog.
  */
object Lifecycle {

  sealed abstract class State(val name: String)
  case object Online extends State("Online")
  case object Paused extends State("Paused")

  final case class LifecycleLog(dw_name: String, action: String,
      state_before: String, state_after: String, detail: String)

  /** ADF management-operations action names (ActionType.cs). */
  val ActionPause = "Pause"
  val ActionResume = "Resume"

  /** Wrap a lifecycle action as an [[Orchestrator.Activity]] — the ADF
    * management-operations pipeline runs Pause/Resume as first-class
    * pipeline activities wired by dataset dependencies.
    */
  def activity(lc: Lifecycle, action: String,
      inputs: Set[String] = Set.empty, outputs: Set[String] = Set.empty,
      policy: Orchestrator.Policy = Orchestrator.Policy())
      : Orchestrator.Activity =
    Orchestrator.Activity(s"${action.toLowerCase}-${lc.dwName}",
      inputs, outputs, policy) { _ =>
      action match {
        case ActionPause => lc.suspend()
        case ActionResume => lc.resume()
        case other =>
          throw new IllegalArgumentException(
            s"unknown lifecycle action: $other")
      }
      ()
    }
}

final class Lifecycle(val dwName: String, builder: () => SparkSession,
    autoscaler: Option[Autoscaler] = None) {
  import Lifecycle._

  private var current: Option[SparkSession] = None
  private val logs = ArrayBuffer.empty[LifecycleLog]

  def state: State = if (current.isDefined) Online else Paused

  /** The live session; connecting to a paused warehouse fails fast, as the
    * reference's paused database refuses logins.
    */
  def session: SparkSession = current.getOrElse(
    throw new IllegalStateException(
      s"warehouse $dwName is paused — resume before querying"))

  /** Pause (SuspendOrPauseAzureSQLDataWarehouse): release compute, keep
    * the durable catalog. Idempotent with a journalled no-op.
    */
  def suspend(): State = current match {
    case None =>
      logs += LifecycleLog(dwName, ActionPause, Paused.name, Paused.name,
        "already paused")
      state
    case Some(s) =>
      // dynamic-allocation-to-zero posture: drop the cached blocks THIS
      // session pinned before detaching it, so a paused warehouse holds
      // no executor memory. Eviction is scoped to the session's own
      // cached tables/views (per-name uncache over the session catalog)
      // — NOT catalog.clearCache(), which clears the SparkContext-GLOBAL
      // cache manager and would evict blocks owned by other warehouses
      // sharing the context in the local model. The shared catalog
      // (permanent tables + policies) is durable storage and survives.
      s.catalog.listTables().collect().foreach { t =>
        val ident = Option(t.database).filter(_.nonEmpty)
          .map(d => s"$d.${t.name}").getOrElse(t.name)
        if (scala.util.Try(s.catalog.isCached(ident)).getOrElse(false))
          s.catalog.uncacheTable(ident)
      }
      current = None
      logs += LifecycleLog(dwName, ActionPause, Online.name, Paused.name,
        "compute released; catalog retained")
      state
  }

  /** Resume (ResumeAzureSQLDataWarehouse): rebuild the compute posture
    * over the durable catalog. Idempotent with a journalled no-op.
    * Returns the live session.
    */
  def resume(): SparkSession = current match {
    case Some(s) =>
      logs += LifecycleLog(dwName, ActionResume, Online.name, Online.name,
        "already online")
      s
    case None =>
      val s = builder()
      graft.functions.TSqlRegistry.register(s)
      val applied = autoscaler.map(a => s"dwu=${a.currentLevel} " +
        s"shuffle_partitions=${a.applyTo(s)}").getOrElse("default posture")
      current = Some(s)
      logs += LifecycleLog(dwName, ActionResume, Paused.name, Online.name,
        s"session rebuilt; $applied")
      s
  }

  /** The lifecycle journal as a DataFrame (rendered through a LIVE session
    * — pass any; the journal itself is driver-side state that survives
    * pauses).
    */
  def journal(spark: SparkSession): DataFrame = {
    import spark.implicits._
    logs.toSeq.toDF()
  }
}
