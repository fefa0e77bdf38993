package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Workload observation → recommendation → navigator routing, end to end. */
class ViewAdvisorSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sfDir)

  test("signatureOf lifts dims and measures from an analyzed plan") {
    val q = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), max(col("l_extendedprice")))
    val sig = ViewAdvisor.signatureOf(q)
    assert(sig.contains(ViewAdvisor.WorkloadQuery(
      Set("l_returnflag", "l_linestatus"),
      Set("l_quantity", "l_extendedprice"))))
    // a plain projection is not a grouped aggregate
    assert(ViewAdvisor.signatureOf(li.select(col("l_quantity"))).isEmpty)
  }

  test("greedy cover recommends grains that answer the whole workload") {
    val workload = Seq(
      ViewAdvisor.WorkloadQuery(Set("l_returnflag"), Set("l_quantity"), 10),
      ViewAdvisor.WorkloadQuery(Set("l_returnflag", "l_linestatus"),
        Set("l_quantity"), 5),
      ViewAdvisor.WorkloadQuery(Set("l_linenumber"), Set("l_extendedprice"), 3))
    val recs = ViewAdvisor.recommend(workload, li, maxSummaries = 3)
    assert(recs.size <= 3)
    // every workload query is answerable by some recommended grain
    workload.foreach { q =>
      assert(recs.exists(r => q.dims.subsetOf(r.dims) &&
        q.measures.subsetOf(r.measures)), s"uncovered: $q")
    }
    // benefit-per-row greedy: the densest grain (10 weight over the
    // 3-row returnflag rollup) is picked first, never the mega-union
    assert(recs.head.dims === Set("l_returnflag"))
  }

  test("recommendations materialize and the navigator routes to them") {
    // the navigator's structural layout expects integral measures (the
    // integer-cents convention), so the observed base carries qty_c
    val base = li.select(col("l_returnflag"), col("l_linestatus"),
      expr("CAST(ROUND(l_quantity*100) AS BIGINT)").as("qty_c"))
    val workload = Seq(
      ViewAdvisor.WorkloadQuery(Set("l_returnflag"), Set("qty_c"), 10),
      ViewAdvisor.WorkloadQuery(Set("l_returnflag", "l_linestatus"),
        Set("qty_c"), 5))
    val recs = ViewAdvisor.recommend(workload, base, maxSummaries = 1)
    val summaries = ViewAdvisor.materialize(base, recs)
    val (src, ans) = AggregateNavigator.route(summaries, base,
      Seq("l_returnflag"), Seq("qty_c"))
    assert(src !== "base", "the advised summary must answer the query")
    // the routed answer equals the direct aggregate
    val direct = base.groupBy(col("l_returnflag"))
      .agg(sum(col("qty_c")).as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ans.collect().foreach { r =>
      assert(r.getAs[Long]("sum_qty_c") ===
        direct(r.getAs[String]("l_returnflag")))
    }
  }

  test("the row budget rejects grains too fine to pay off") {
    val workload = Seq(
      ViewAdvisor.WorkloadQuery(Set("l_orderkey"), Set("l_quantity"), 1))
    // l_orderkey grain ~ |orders| rows — over a budget of 10 nothing fits
    assert(ViewAdvisor.recommend(workload, li, maxGrainRows = 10L).isEmpty)
  }
}
