package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Summary-table routing: grain-lattice selection, algebra-correct
  * re-aggregation, and honest base fallback.
  */
class AggregateNavigatorSpec extends SparkSpec {

  private def base = graft.Tables.lineitem(spark, sfDir)
    .select(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"),
      expr("cast(round(l_quantity*100) as bigint)").as("qty_c"))

  private def summaries = Seq(
    AggregateNavigator.Summary("s_fs", Set("l_returnflag", "l_linestatus"),
      AggregateNavigator.build(base, Seq("l_returnflag", "l_linestatus"),
        Seq("qty_c"))),
    AggregateNavigator.Summary("s_supp", Set("l_suppkey"),
      AggregateNavigator.build(base, Seq("l_suppkey"), Seq("qty_c"))))

  test("covering rollup is chosen and re-aggregation equals the direct answer") {
    val (src, out) = AggregateNavigator.route(summaries, base,
      Seq("l_returnflag"), Seq("qty_c"))
    assert(src === "s_fs")
    val direct = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("s"),
        min(col("qty_c")).as("mn"), max(col("qty_c")).as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.collect().foreach { r =>
      val (n, sm, mn, mx) = direct(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("sum_qty_c") === sm)
      assert(r.getAs[Long]("min_qty_c") === mn)
      assert(r.getAs[Long]("max_qty_c") === mx)
      assert(r.getAs[Long]("avg_qty_c") === sm / n, "AVG derived, not stored")
    }
  }

  test("uncovered dims fall back to base; coarsest covering grain wins") {
    val (src, out) = AggregateNavigator.route(summaries, base,
      Seq("l_suppkey", "l_returnflag"), Seq("qty_c"))
    assert(src === "base", "no summary covers {suppkey, returnflag}")
    assert(out.columns.contains("avg_qty_c"))
    // exact-grain request: the matching summary answers it unchanged
    val (src2, _) = AggregateNavigator.route(summaries, base,
      Seq("l_suppkey"), Seq("qty_c"))
    assert(src2 === "s_supp")
    // empty-measure coverage check: a summary missing the measure is skipped
    val noMeasure = AggregateNavigator.Summary("s_bare",
      Set("l_returnflag"), summaries.head.df.drop("sum_qty_c"))
    val (src3, _) = AggregateNavigator.route(Seq(noMeasure), base,
      Seq("l_returnflag"), Seq("qty_c"))
    assert(src3 === "base", "summaries without the measure must not route")
  }

  test("q207's routed plan never rescans the fact table") {
    val df = graft.operators.CoreQueries.q207AggNavigator(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the routed query aggregates a checkpointed summary: no parquet scan
    // of lineitem may appear in ITS plan (the build happened before)
    assert(!p.contains("lineitem.parquet"), s"fact rescanned:\n$p")
    assert(df.count() > 0)
  }
}
