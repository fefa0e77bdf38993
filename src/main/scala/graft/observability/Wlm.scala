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
