package graft.observability

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.Semaphore
import scala.jdk.CollectionConverters._

/** Workload management — concurrency slots and resource classes (SURVEY.md
  * §2.9 D13, §4): the reference admits 4–128 concurrent queries and queues
  * the rest, with per-resource-class slot costs (reference: whitepaper.md:117-121;
  * live queue monitoring in samples/sqlops/MonitoringScripts/
  * running_queued_queries_slots.sql:1-12).
  *
  * Spark analog: a slot semaphore gates admission (queueing requests exactly
  * like UserConcurrencyResourceType waits), each request runs in a FAIR
  * scheduler pool named for its resource class, and the wait journal exposes
  * the vw_query_queue shape (queue time = DATEDIFF between submit and grant,
  * reference: microsoft.vw_query_queue.sql:15-23).
  */
object Wlm {
  final case class WaitRow(label: String, resource_class: String,
      slots_used: Int, queue_ms: Long, run_ms: Long, status: String)

  /** A workload-classification rule: requests matching the rule's member
    * (submitting principal) and/or label are routed to `workloadGroup`
    * (a resource class). Matching follows the engine convention for
    * classifier precedence: parameter specificity is weighted (member match
    * 64, label match 16), the highest total wins, and ties resolve to the
    * highest `importance` then classifier name — so adding a broad fallback
    * rule can never hijack requests from a more specific one.
    */
  final case class Classifier(name: String, workloadGroup: String,
      memberName: Option[String] = None, label: Option[String] = None,
      importance: Int = 2)
}

final class Wlm(spark: SparkSession, totalSlots: Int = 32) {
  import Wlm.WaitRow

  /** Resource classes with slot costs, per the reference's small→xlarge
    * ladder.
    */
  val slotCost: Map[String, Int] =
    Map("smallrc" -> 1, "mediumrc" -> 4, "largerc" -> 8, "xlargerc" -> 16)

  private val gate = new Semaphore(totalSlots, true)
  private val waits = new ConcurrentLinkedQueue[WaitRow]()
  private val runningQueries = new java.util.concurrent.atomic.AtomicInteger
  private val runningSlots = new java.util.concurrent.atomic.AtomicInteger
  private val queuedQueries = new java.util.concurrent.atomic.AtomicInteger
  private val queuedSlots = new java.util.concurrent.atomic.AtomicInteger

  /** Run `body` under WLM admission: acquire the class's slots (queueing if
    * the pool is saturated), pin the FAIR pool + label, journal the wait.
    */
  def submit[T](label: String, resourceClass: String = "smallrc")
      (body: => T): T = {
    val slots = slotCost.getOrElse(resourceClass, 1)
    // a class costing more than the pool can ever grant would queue forever;
    // reject at submission like the engine rejects an oversized resource
    // class instead of deadlocking the session
    require(slots <= totalSlots,
      s"$resourceClass needs $slots slots but the pool only has $totalSlots")
    val t0 = System.nanoTime()
    queuedQueries.incrementAndGet(); queuedSlots.addAndGet(slots)
    // always un-queue, even if the wait is interrupted — otherwise the
    // queued counters stay inflated for the session (ADVICE r2)
    try gate.acquire(slots)
    finally { queuedQueries.decrementAndGet(); queuedSlots.addAndGet(-slots) }
    runningQueries.incrementAndGet(); runningSlots.addAndGet(slots)
    val queued = (System.nanoTime() - t0) / 1000000L
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", resourceClass)
    sc.setJobDescription(label)
    val t1 = System.nanoTime()
    try {
      val r = body
      waits.add(WaitRow(label, resourceClass, slots, queued,
        (System.nanoTime() - t1) / 1000000L, "Completed"))
      r
    } catch {
      case e: Throwable =>
        waits.add(WaitRow(label, resourceClass, slots, queued,
          (System.nanoTime() - t1) / 1000000L, "Failed"))
        throw e
    } finally {
      runningQueries.decrementAndGet(); runningSlots.addAndGet(-slots)
      gate.release(slots)
      sc.setLocalProperty("spark.scheduler.pool", null)
      sc.setJobDescription(null)
    }
  }

  def availableSlots: Int = gate.availablePermits()

  // ------------------------------------------------- workload classifiers

  private val classifiers =
    new java.util.concurrent.ConcurrentHashMap[String, Wlm.Classifier]()

  def createClassifier(c: Wlm.Classifier): Unit = {
    require(slotCost.contains(c.workloadGroup),
      s"unknown workload group ${c.workloadGroup}")
    require(c.memberName.nonEmpty || c.label.nonEmpty,
      "classifier needs at least one matching parameter")
    require(classifiers.putIfAbsent(c.name, c) == null,
      s"classifier ${c.name} already exists")
  }

  def dropClassifier(name: String): Unit =
    require(classifiers.remove(name) != null, s"no classifier $name")

  /** Route a request to its resource class: weighted-specificity match over
    * the registered classifiers (member 64, label 16; ties by importance
    * desc then name), falling back to smallrc like an unclassified request.
    */
  def classify(member: String, label: Option[String] = None): String = {
    val scored = classifiers.values.asScala.flatMap { c =>
      val mScore = c.memberName match {
        case Some(m) => if (m == member) 64 else -1
        case None => 0
      }
      val lScore = c.label match {
        case Some(l) => if (label.contains(l)) 16 else -1
        case None => 0
      }
      if (mScore < 0 || lScore < 0) None
      else Some(((mScore + lScore, c.importance), c))
    }
    if (scored.isEmpty) "smallrc"
    else scored.toSeq
      .sortBy { case ((score, imp), c) => (-score, -imp, c.name) }
      .head._2.workloadGroup
  }

  /** Submit with classification: the classifier — not the caller — picks
    * the resource class, as the reference routes sessions via workload
    * classifiers rather than per-query hints.
    */
  def submitAs[T](member: String, label: String)(body: => T): T =
    submit(label, classify(member, Some(label)))(body)

  /** Registered classifiers in a catalog-view shape. */
  def classifiersView: DataFrame = {
    import spark.implicits._
    classifiers.values.asScala.toSeq.sortBy(_.name)
      .map(c => (c.name, c.workloadGroup, c.memberName.orNull,
        c.label.orNull, c.importance))
      .toDF("classifier_name", "workload_group", "member_name", "wlm_label",
        "importance")
  }

  /** Live slot widget with the reference's exact column names (reference:
    * solutions/monitoring/scripts/views/microsoft.vw_query_slots.sql:30-33,
    * also samples/sqlops/MonitoringScripts/SlotUsage.sql).
    */
  def slotsView: DataFrame = {
    import spark.implicits._
    Seq((runningQueries.get, runningSlots.get, queuedQueries.get,
      queuedSlots.get))
      .toDF("running_queries", "running_queries_slots", "queued_queries",
        "queued_queries_slots")
  }

  /** Queue/run journal ≈ running_queued_queries_slots + vw_query_queue. */
  def queueJournal: DataFrame = {
    import spark.implicits._
    waits.asScala.toSeq.toDF()
  }

  /** Reference-shaped resource-wait rows ≈ sys.dm_pdw_resource_waits with
    * vw_query_queue's derived queued_sec (reference:
    * solutions/monitoring/scripts/views/microsoft.vw_query_queue.sql:15-23 —
    * the DATEDIFF-milliseconds/1000.0 idiom).
    */
  def resourceWaits: DataFrame = {
    import org.apache.spark.sql.functions._
    queueJournal.select(
      col("label").as("request_id"),
      lit("UserConcurrencyResourceType").as("type"),
      col("status").as("state"),
      col("resource_class"),
      col("slots_used").as("concurrency_slots_used"),
      (col("queue_ms") / 1000.0).as("queued_sec"),
      col("run_ms"))
  }
}
