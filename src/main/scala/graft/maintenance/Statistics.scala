package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Statistics maintenance — the engine's `microsoft.sp_create_statistics`
  * analog (reference: solutions/monitoring/scripts/procs/
  * microsoft.sp_create_statistics.sql:4-88): find columns with no statistics,
  * generate the maintenance statements, execute them driver-side — the same
  * metadata-driven dynamic-SQL program shape (SURVEY.md §3.3), with Spark's
  * ANALYZE TABLE as the executor. Feeds Catalyst CBO
  * (`spark.sql.cbo.enabled`).
  */
object Statistics {

  sealed trait Mode
  /** CREATE STATISTICS [default sampling] */
  case object Default extends Mode
  /** WITH FULLSCAN */
  case object FullScan extends Mode
  /** WITH SAMPLE n PERCENT (reference default 20, sp_create_statistics.sql:20-23) */
  final case class Sample(percent: Double) extends Mode {
    // parameter validation ≈ the proc's THROW guard (sp_create_statistics.sql:15-18)
    require(percent > 0 && percent <= 100,
      s"sample percent must be in (0,100]: $percent")
  }

  /** Analyze timestamps journal ≈ STATS_DATE, for the staleness check. */
  private val analyzedAt = new ConcurrentHashMap[String, Long]()

  /** Per-column stats registry ≈ sys.stats × sys.stats_columns: (table, col)
    * → last-updated millis, feeding the reference-shaped vw_statistics_age.
    */
  private val columnStatsAt = new ConcurrentHashMap[(String, String), Long]()

  val StalenessBoundDays = 7 // TableHealthCount.sql:95

  /** Columns of `table` that have no recorded column statistics yet. */
  def unanalyzedColumns(spark: SparkSession, table: String): Seq[String] = {
    import org.apache.spark.sql.types._
    val all = spark.table(table).schema
      .filter(_.dataType match {
        case _: StructType | _: ArrayType | _: MapType | BinaryType => false
        case _ => true
      })
      .map(_.name)
    all.filterNot(c => hasColumnStats(spark, table, c))
  }

  private def hasColumnStats(spark: SparkSession, table: String,
      column: String): Boolean = {
    val rows = spark.sql(s"DESCRIBE EXTENDED $table `$column`").collect()
    rows.exists(r => r.getString(0) == "distinct_count" &&
      r.getString(1) != null && r.getString(1) != "NULL")
  }

  /** Create statistics for every untracked column (the proc's main loop,
    * sp_create_statistics.sql:78-85). Returns the statements it executed —
    * the work-table of dynamic SQL, surfaced for observability.
    */
  def createStatistics(spark: SparkSession, table: String,
      mode: Mode = Default): Seq[String] = {
    val cols = unanalyzedColumns(spark, table)
    val stmts = mode match {
      case Default | FullScan =>
        if (cols.isEmpty) Seq.empty
        else Seq(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
          cols.map(c => s"`$c`").mkString(", "))
      case Sample(_) => Seq.empty // sampled stats are journaled, not catalog stats
    }
    stmts.foreach(spark.sql(_))
    mode match {
      case Sample(pct) if cols.nonEmpty => sampledStats(spark, table, cols, pct)
      case _ => ()
    }
    val now = System.currentTimeMillis()
    analyzedAt.put(table, now)
    cols.foreach(c => columnStatsAt.put((table, c), now))
    stmts
  }

  /** Sampled per-column stats (ndv/nulls/min/max on a p% sample) for when a
    * full scan is too expensive — registered as `<table>_graft_stats`.
    */
  private def sampledStats(spark: SparkSession, table: String,
      cols: Seq[String], pct: Double): Unit = {
    val sample = spark.table(table).sample(pct / 100.0, seed = 42)
    val aggs = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c)).as(s"${c}_ndv"),
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls"))
    }
    sample.agg(aggs.head, aggs.tail: _*)
      .createOrReplaceTempView(s"${table}_graft_stats")
  }

  /** Reference-shaped vw_statistics_age: one row per statistics object (per
    * analyzed column), with the reference view's column names (reference:
    * solutions/monitoring/scripts/views/microsoft.vw_statistics_age.sql:4-22).
    */
  def statisticsAgeRef(spark: SparkSession): DataFrame = {
    import spark.implicits._
    columnStatsAt.asScala.toSeq
      .map { case ((t, c), ts) =>
        ("default", t, c, s"stat_${t}_$c", new java.sql.Timestamp(ts))
      }
      .toDF("schema_name", "table_name", "stats_column_name", "stats_name",
        "stats_last_updated_date")
  }

  /** Count of stats older than the 7-day bound — the TableHealthCount
    * widget's Stale_Stats_7_Days scalar (TableHealthCount.sql:74-95).
    */
  def staleStatsCount(asOfMillis: Long = System.currentTimeMillis()): Long =
    columnStatsAt.asScala.values
      .count(ts => asOfMillis - ts > StalenessBoundDays * 86400000L)

  /** Staleness report ≈ vw_statistics_age (reference:
    * solutions/monitoring/scripts/views/microsoft.vw_statistics_age.sql:4-22).
    */
  def statisticsAge(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val now = System.currentTimeMillis()
    analyzedAt.asScala.toSeq
      .map { case (t, ts) =>
        val days = (now - ts) / 86400000.0
        (t, new java.sql.Timestamp(ts), days, days > StalenessBoundDays)
      }
      .toDF("table_name", "last_analyzed", "age_days", "stale")
  }
}
