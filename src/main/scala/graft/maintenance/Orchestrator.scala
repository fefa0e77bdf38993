package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}

/** Pipeline orchestration — the engine-side analog of the reference's ADF
  * pipeline samples (reference: samples/adf/management-operations/json/
  * pipeline-managementoperations.json:5-48 — activities wired by
  * input/output DATASETS, each with a Policy of timeout / concurrency /
  * retry / longRetry), re-expressed as a host-language DAG runner the way
  * the engine's other control surfaces are (Autoscaler, Wlm).
  *
  * Semantics kept from the reference model:
  *  - activities declare input and output dataset names; an activity is
  *    ready when every input is available (external datasets — names no
  *    activity produces — are available at start), which is exactly ADF's
  *    dataset-dependency scheduling;
  *  - Policy.retry short retries then Policy.longRetry extra attempts
  *    (the long-retry cycle), Policy.timeout per attempt, pipeline-level
  *    concurrency;
  *  - a permanently-failed activity SKIPS its transitive dependents but
  *    independent branches keep running (slice independence);
  *  - every attempt lands in a journal surfaced as a DataFrame, the
  *    engine's uniform observability channel.
  *
  * Execution runs in dependency waves on a bounded pool: each wave submits
  * every ready activity, then publishes their outputs. Deterministic
  * structure (wave membership is a pure function of the DAG), bounded
  * parallelism, no busy-waiting.
  */
object Orchestrator {

  /** ADF-shaped activity policy; timeout bounds EACH attempt. */
  final case class Policy(retry: Int = 0, longRetry: Int = 0,
      longRetryIntervalMs: Long = 0L, timeoutMs: Long = 60 * 60 * 1000L)

  /** One pipeline activity: consumes `inputs`, produces `outputs`. */
  final case class Activity(name: String, inputs: Set[String],
      outputs: Set[String], policy: Policy = Policy())(
      val run: SparkSession => Unit)

  final case class ActivityRun(pipeline: String, activity: String,
      attempt: Int, status: String, start_ms: Long, duration_ms: Long,
      error: String)

  final case class Result(runs: Seq[ActivityRun]) {
    def statusOf(activity: String): String =
      runs.filter(_.activity == activity).lastOption.map(_.status)
        .getOrElse("NotRun")
    def succeeded: Boolean = runs.nonEmpty &&
      runs.groupBy(_.activity).values.forall(_.last.status == "Succeeded")
  }

  /** Validates the DAG (unique activity names, single producer per
    * dataset, no cycles) — fail at construction, not mid-run, mirroring
    * ADF's publish-time validation.
    */
  def validate(activities: Seq[Activity]): Unit = {
    val names = activities.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate activity names: ${names.diff(names.distinct).distinct}")
    val produced = activities.flatMap(a => a.outputs.map(_ -> a.name))
    val dupOut = produced.groupBy(_._1).filter(_._2.size > 1).keys
    require(dupOut.isEmpty, s"datasets with multiple producers: $dupOut")
    // Kahn's algorithm over activity-level edges; leftover = cycle
    val producerOf = produced.toMap
    var indeg = activities.map { a =>
      a.name -> a.inputs.flatMap(producerOf.get).size
    }.toMap
    val dependents = activities.flatMap { a =>
      a.inputs.flatMap(producerOf.get).map(_ -> a.name)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var frontier = indeg.filter(_._2 == 0).keys.toSeq
    var seen = 0
    while (frontier.nonEmpty) {
      seen += frontier.size
      frontier = frontier.flatMap(n => dependents.getOrElse(n, Nil))
        .map { d => indeg = indeg.updated(d, indeg(d) - 1); d }
        .filter(indeg(_) == 0).distinct // a join node arrives via every parent
    }
    require(seen == activities.size,
      s"dependency cycle among: ${indeg.filter(_._2 > 0).keys}")
  }

  /** Runs the pipeline; never throws for activity failures (they are
    * journal rows), only for invalid DAGs.
    */
  def run(spark: SparkSession, pipeline: String, activities: Seq[Activity],
      concurrency: Int = 4): Result = {
    validate(activities)
    val producerOf = activities.flatMap(a => a.outputs.map(_ -> a.name)).toMap
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    val journal = scala.collection.mutable.ArrayBuffer[ActivityRun]()
    try {
      val available = scala.collection.mutable.Set[String]()
      available ++= activities.flatMap(_.inputs)
        .filterNot(producerOf.contains) // external datasets ready at start
      val failed = scala.collection.mutable.Set[String]()
      var pending = activities
      while (pending.nonEmpty) {
        val (blockedByFailure, rest) = pending.partition(
          _.inputs.flatMap(producerOf.get).exists(failed))
        blockedByFailure.foreach { a =>
          journal += ActivityRun(pipeline, a.name, 0, "Skipped",
            System.currentTimeMillis(), 0L,
            s"upstream failed: ${a.inputs.flatMap(producerOf.get).filter(failed).mkString(",")}")
          failed += a.name // transitive skip
        }
        val (ready, stillPending) =
          rest.partition(_.inputs.forall(available))
        if (ready.isEmpty && blockedByFailure.isEmpty) {
          // validated acyclic ⇒ unreachable; belt for future edits
          throw new IllegalStateException(
            s"no runnable activity among ${stillPending.map(_.name)}")
        }
        val outcomes = ready.map { a =>
          a -> pool.submit(new Callable[Seq[ActivityRun]] {
            def call(): Seq[ActivityRun] = attemptAll(spark, pipeline, a)
          })
        }
        outcomes.foreach { case (a, fut) =>
          val runs = fut.get()
          journal ++= runs
          if (runs.last.status == "Succeeded") available ++= a.outputs
          else failed += a.name
        }
        pending = stillPending
      }
      Result(journal.toSeq)
    } finally pool.shutdown()
  }

  /** The ADF retry ladder for one activity: (1+retry) short attempts, then
    * longRetry long-cycle attempts spaced by longRetryIntervalMs.
    */
  private def attemptAll(spark: SparkSession, pipeline: String,
      a: Activity): Seq[ActivityRun] = {
    val maxAttempts = 1 + a.policy.retry + a.policy.longRetry
    val runs = scala.collection.mutable.ArrayBuffer[ActivityRun]()
    var attempt = 0
    var done = false
    var stop = false
    while (!done && !stop && attempt < maxAttempts) {
      attempt += 1
      if (attempt > 1 + a.policy.retry && a.policy.longRetryIntervalMs > 0)
        Thread.sleep(a.policy.longRetryIntervalMs)
      val t0 = System.currentTimeMillis()
      val (status, err) = runOnce(spark, a)
      runs += ActivityRun(pipeline, a.name, attempt, status, t0,
        System.currentTimeMillis() - t0, err)
      done = status == "Succeeded"
      // a timed-out body that ignored its interrupt may STILL be running;
      // retrying would race two instances of the same activity against
      // each other's outputs — suppress further attempts instead
      stop = status == "TimedOutStuck"
    }
    runs.toSeq
  }

  /** Grace period for a timed-out attempt to honor its interrupt before
    * retries are suppressed.
    */
  private val InterruptGraceMs = 5000L

  private def runOnce(spark: SparkSession, a: Activity): (String, String) = {
    val single = Executors.newSingleThreadExecutor()
    try {
      val fut = single.submit(new Callable[Unit] {
        def call(): Unit = a.run(spark)
      })
      fut.get(a.policy.timeoutMs, TimeUnit.MILLISECONDS)
      ("Succeeded", "")
    } catch {
      case _: TimeoutException =>
        single.shutdownNow()
        // only safe to retry once the attempt has provably stopped
        if (single.awaitTermination(InterruptGraceMs, TimeUnit.MILLISECONDS))
          ("TimedOut", s"exceeded ${a.policy.timeoutMs} ms")
        else
          ("TimedOutStuck",
            s"exceeded ${a.policy.timeoutMs} ms and ignored the interrupt; " +
              "retries suppressed to avoid concurrent duplicate runs")
      case e: java.util.concurrent.ExecutionException =>
        ("Failed", String.valueOf(e.getCause.getMessage))
    } finally single.shutdownNow()
  }

  /** The run journal as a DataFrame — same observability posture as
    * Autoscaler.scaleLogs / the monitoring views.
    */
  def journalDf(spark: SparkSession, result: Result): DataFrame = {
    import spark.implicits._
    result.runs.toDF()
  }
}
