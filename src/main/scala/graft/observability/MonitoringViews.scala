package graft.observability

import graft.catalog.StorageViews
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL-name parity for the monitoring toolkit (SURVEY.md §2.9 D2): registers
  * the engine's observability surface under the reference's view names so an
  * operator can run the same dashboard SQL they run today (reference: the
  * SQL files under solutions/monitoring/scripts/views and
  * samples/sqlops/MonitoringScripts).
  *
  *  - vw_active_queries      ← QueryJournal.requests
  *  - vw_query_steps         ← QueryJournal.steps
  *  - vw_query_step_details  ← QueryJournal.stepDetails
  *  - vw_query_queue         ← Wlm.queueJournal
  *  - vw_table_sizes         ← StorageViews.tableSizes
  *  - vw_rowgroup_details    ← StorageViews.rowgroupDetails
  *  - vw_table_health        ← StorageViews.rowgroupHealth
  */
final class MonitoringViews(spark: SparkSession, journal: QueryJournal,
    wlm: Option[Wlm] = None) {

  /** (Re-)register the query-lifecycle views (journal views are snapshots;
    * call again to refresh).
    */
  def registerQueryViews(): Unit = {
    journal.requests.createOrReplaceTempView("vw_active_queries")
    journal.steps.createOrReplaceTempView("vw_query_steps")
    journal.stepDetails.createOrReplaceTempView("vw_query_step_details")
    wlm.foreach(_.queueJournal.createOrReplaceTempView("vw_query_queue"))
  }

  /** Register the storage views for the given table → location map. */
  def registerStorageViews(tables: Map[String, String]): Unit = {
    StorageViews.tableSizes(spark, tables)
      .createOrReplaceTempView("vw_table_sizes")
    StorageViews.rowgroupDetails(spark, tables)
      .createOrReplaceTempView("vw_rowgroup_details")
    StorageViews.rowgroupHealth(spark, tables)
      .createOrReplaceTempView("vw_table_health")
  }

  /** The reference's dashboard-widget pattern over the registered views:
    * cross join of one-row scalar aggregates (reference:
    * samples/sqlops/MonitoringScripts/UserActivities.sql:3-31).
    */
  def activitySummary(): org.apache.spark.sql.DataFrame =
    spark.sql(
      """SELECT a.n_requests, a.n_failed, b.total_shuffle_bytes
        |FROM (SELECT COUNT(*) AS n_requests,
        |             SUM(CASE WHEN status = 'Failed' THEN 1 ELSE 0 END) AS n_failed
        |      FROM vw_active_queries) a
        |CROSS JOIN (SELECT COALESCE(SUM(shuffle_write_bytes), 0) AS total_shuffle_bytes
        |            FROM vw_query_steps) b""".stripMargin)
}
