package graft.operators

import graft.SparkSpec

/** Plan pins for the eighth-session families (q336–q378) — the same
  * 100 TB posture assertions PlansSpec holds for the earlier inventory:
  * filters and projections reach the scan, aggregation stays
  * partial+final, small sides broadcast, and nothing degenerates to a
  * cartesian. Queries whose tails ride a localCheckpoint assert on the
  * visible (post-checkpoint) plan only where that is still meaningful.
  */
class NewFamiliesPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q346: all ten power sums ride ONE pruned map-side pass") {
    val p = plan("q346_partial_corr")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("l_orderkey"),
      "unused lineitem columns must be pruned from the scan")
  }

  test("q372: cents-digit audit prunes the scan to o_totalprice") {
    val p = plan("q372_last_digit_audit")
    assert(!p.contains("o_orderdate"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "the 100-cell rollup must map-side combine")
  }

  test("q377: trend test pushes nothing heavier than a broadcast median") {
    val p = plan("q377_cochran_armitage")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q368: pairwise panel joins the 5-row rollup broadcast, never shuffled") {
    val p = plan("q368_tukey_pairs")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "a 5x5 pair grid must never sort-merge")
  }

  test("q345: block maxima aggregate partially (max is associative)") {
    val p = plan("q345_gumbel_maxima")
    assert(p.contains("partial_max") || p.contains("partial_sum"), p)
    assert(p.contains("EqualTo(event_type,purchase)"),
      "the purchase filter must push into the events scan")
  }

  test("q356: QTE selection never cartesians and keeps the type filter pushed") {
    val p = plan("q356_qte")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
  }

  test("q365: isotropy panel explodes the corpus exactly once") {
    val p = plan("q365_isotropy")
    // everything after the 64-row dim rollup is checkpointed metadata;
    // the visible plan must stay join-light and cartesian-free
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q366: balance audit explodes once and joins the 64-row sides") {
    val p = plan("q366_balance_smd")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q342: c-index join fan-out is the bounded score spine, no cartesian") {
    val p = plan("q342_c_index")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q352: CvM rank folds stay join-bounded on the value rollup") {
    val p = plan("q352_cramer_von_mises")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("In(o_orderpriority"),
      "the two-arm filter must push into the orders scan")
  }

  test("q376: Wasserstein prunes the orders scan to priority+price") {
    // the r8 migration checkpoints the grid rollup, so the final plan
    // starts from ExistingRDD — pin the pushdown on the first-pass scan
    // shape directly (the exact projection q376 builds), and the device
    // on the full plan
    import org.apache.spark.sql.functions.{col, expr}
    val firstPass = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin(
        graft.operators.AuditQueries.MwArmA,
        graft.operators.AuditQueries.MwArmB))
      .select(expr("CAST(ROUND(o_totalprice*100) AS BIGINT) div 500").as("b"))
      .queryExecution.executedPlan.toString
    assert(firstPass.contains("In(o_orderpriority"), firstPass)
    assert(!firstPass.contains("o_orderdate"), firstPass)
    val p = plan("q376_wasserstein")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("pfx_bkt"),
      s"grid cumsums must ride the two-level device:\n$p")
  }

  test("q374: HRW assignment is a pure projection — no join, no explode") {
    val p = plan("q374_hrw_placement")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("posexplode"),
      "the 8-way argmax must be inline expressions, not an exploded spine")
  }
}
