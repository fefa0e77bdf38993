package graft.observability

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MonitoringViewsSpec extends SparkSpec {

  test("dashboard SQL runs against the registered reference-named views") {
    val j = new QueryJournal(spark).start()
    try {
      spark.sparkContext.setJobDescription("mv-test")
      Tables.orders(spark, sfDir).groupBy(col("o_orderstatus"))
        .agg(count(lit(1))).collect()
      spark.sparkContext.setJobDescription(null)

      val mv = new MonitoringViews(spark, j)
      mv.registerQueryViews()
      mv.registerStorageViews(Map("orders" -> s"$sfDir/orders.parquet"))

      val act = mv.activitySummary().collect()(0)
      assert(act.getAs[Long]("n_requests") >= 1)
      assert(act.getAs[Long]("n_failed") === 0)

      val sizes = spark.sql(
        "SELECT row_count FROM vw_table_sizes WHERE table_name = 'orders'")
        .collect()(0)
      assert(sizes.getLong(0) === 1500L)

      val steps = spark.sql(
        """SELECT COUNT(*) FROM vw_query_steps
          |WHERE request_label = 'mv-test'""".stripMargin).collect()(0)
      assert(steps.getLong(0) >= 1)

      assert(spark.sql("SELECT * FROM vw_rowgroup_details").count() >= 1)
      assert(spark.sql(
        "SELECT rebuild_recommended FROM vw_table_health").count() === 1)
    } finally j.stop()
  }
}
