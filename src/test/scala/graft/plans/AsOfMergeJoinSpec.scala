package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom physical as-of join: parity with the composed window
  * formulation on the driver data, the declared plan contract (hash
  * exchanges + per-partition sorts, no union/window machinery), and
  * value-level edges on a handcrafted frame.
  */
class AsOfMergeJoinSpec extends SparkSpec {

  private def clicksAndPurchases = {
    val e = graft.Tables.events(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    (clicks, purchases)
  }

  test("merge exec equals the window formulation on the events corpus") {
    val (clicks, purchases) = clicksAndPurchases
    val viaExec = AsOfMergeJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"))
    val viaWindow = AsOfJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"))
    assert(viaExec.columns.toSeq === viaWindow.columns.toSeq)
    assert(viaExec.count() === clicks.count())
    assert(viaExec.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaExec).count() === 0)
  }

  test("physical plan: AsOfMergeJoinExec with exchanges+sorts, no window") {
    val (clicks, purchases) = clicksAndPurchases
    val df = AsOfMergeJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    assert(!plan.contains("Window"), s"window machinery leaked in:\n$plan")
    // EnsureRequirements satisfied the declared contract declaratively
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("edges: inclusive match, tolerance-free lookback, null when none") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"),
      (3L, 10L, "d")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (1L, 150L, 30.0),
      (2L, 60L, 40.0)).toDF("k", "t", "v")
    val out = AsOfMergeJoin.latestPrior(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "t", payload = Seq("v"),
      tieBreak = Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[java.lang.Double]("prior_v")),
          Option(r.getAs[java.lang.Long]("prior_t")))).toMap
    // inclusive: right at t=100 matches left at t=100
    assert(out("a") === (Some(10.0), Some(100L)))
    // equal-time right rows resolve to the tieBreak max (30.0 over 20.0)
    assert(out("b") === (Some(30.0), Some(150L)))
    // right row strictly later than the left row: no match
    assert(out("c") === (None, None))
    // key with no right rows at all: no match
    assert(out("d") === (None, None))
  }

  test("bucketed inputs collocate: the merge join plans with NO exchange") {
    import graft.catalog.{Distribution, TablePolicy}
    val (clicks, purchases) = clicksAndPurchases
    val policy = TablePolicy(Distribution.Hash("user_id", 8))
    if (!spark.catalog.tableExists("asof_clicks_b")) {
      graft.sources.Ctas.create(spark, clicks, "asof_clicks_b", policy)
      graft.sources.Ctas.create(spark, purchases, "asof_purch_b", policy)
    }
    val df = AsOfMergeJoin.latestPrior(
      spark.table("asof_clicks_b"), spark.table("asof_purch_b"),
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan)
    // ClusteredDistribution is satisfied by the bucket layout on BOTH
    // sides — the declared contract collocates for free, the 100 TB win
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join must be exchange-free:\n$plan")
    // semantics unchanged by the physical path
    val viaWindow = AsOfJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"))
    assert(df.count() === viaWindow.count())
    assert(df.exceptAll(viaWindow).count() === 0)
  }

  test("self-join shape: same base table on both sides resolves cleanly") {
    val e = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val out = AsOfMergeJoin.latestPrior(e, e, keys = Seq("user_id"),
      leftTime = "ts", rightTime = "ts", payload = Seq("event_id"),
      tieBreak = Seq("event_id"))
    // every row matches at least itself (inclusive semantics)
    assert(out.filter(col("prior_event_id").isNull).count() === 0)
  }
  test("tolerance: exec matches the window formulation's bounded lookback") {
    val (clicks, purchases) = clicksAndPurchases
    val hourUs = 3600L * 1000000L
    val viaExec = AsOfMergeJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"),
      toleranceMicros = Some(hourUs))
    val viaWindow = AsOfJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR")))
    assert(viaExec.count() === viaWindow.count())
    assert(viaExec.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaExec).count() === 0)
    // the bound bites: strictly fewer matches than unbounded lookback
    val unbounded = AsOfMergeJoin.latestPrior(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Seq("value"), tieBreak = Seq("event_id"))
    import org.apache.spark.sql.functions.col
    assert(viaExec.filter(col("prior_value").isNotNull).count() <
      unbounded.filter(col("prior_value").isNotNull).count())
  }
}
