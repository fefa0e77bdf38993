package graft.operators

import graft.SparkSpec

/** Plan pins for the ninth-session families (q396–q414) — the 100 TB
  * posture assertions: pruned scans, partial+final aggregation,
  * broadcast-only pair grids and moment joins, TakeOrdered instead of
  * global sorts, and no cartesians anywhere. Queries whose heads ride a
  * localCheckpoint assert on the visible (post-checkpoint) tail only
  * where that is still meaningful.
  */
class NinthFamiliesPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q396: the 80-row month self-grid broadcasts, never sort-merges") {
    val p = plan("q396_hoeffdings_d")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "a calendar-bounded pair grid must never sort-merge")
  }

  test("q397: JSD pair fan-out is keyed by word — no cartesian") {
    val p = plan("q397_jensen_shannon")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q398: Hellinger keeps the word self-join keyed and partial-aggregated") {
    val p = plan("q398_hellinger")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q399: Hurst block windows stay partitioned — no cartesian tail") {
    val p = plan("q399_hurst")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q403: Mahalanobis scoring joins the 1-row moments broadcast") {
    val p = plan("q403_mahalanobis")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 selection must be TakeOrdered, not a global sort")
  }

  test("q404: Grubbs joins the 5-row class moments broadcast off a pruned scan") {
    val p = plan("q404_grubbs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("o_orderdate"),
      "unused orders columns must be pruned from the scan")
    assert(p.contains("partial_sum") || p.contains("partial_max"), p)
  }

  test("q405: Granger day-rollup tail is join-light and cartesian-free") {
    val p = plan("q405_granger")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q406: EOQ panel broadcasts the top-10 filter back to the rollup") {
    val p = plan("q406_eoq_newsvendor")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q409: AD cells never cartesian and never globally sort the corpus") {
    val p = plan("q409_anderson_darling")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q410: CCF lag spine broadcasts; the aligned join is keyed") {
    val p = plan("q410_ccf")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q411: LOF candidate join is a cell-key equi-join, windows partitioned") {
    val p = plan("q411_lof")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 LOF selection must be TakeOrdered")
  }

  test("q413: price indices join the part dim broadcast off a pruned fact scan") {
    val p = plan("q413_price_indices")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("l_suppkey"),
      "unused lineitem columns must be pruned from the scan")
  }

  test("q414: Hill threshold is TakeOrdered(k+1), orders scan pruned") {
    val p = plan("q414_hill_tail")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("o_orderdate"), p)
  }
}
