package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join: exact containment across bucket
  * boundaries, no duplicate matches from multi-bucket intervals, and the
  * in-plan fan-out contract.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches exactly the contained points, across bucket boundaries") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-05 12:00:00")),
      (3L, ts("2024-01-09 23:59:59")),
      (4L, ts("2024-02-01 00:00:00"))
    ).toDF("pid", "t")
    // interval spans several 2-day buckets; a second one is empty
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-09 23:59:59")),
      (200L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))
    ).toDF("iid", "s", "e")

    val out = RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
      binDays = 2)
    val got = out.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (2L, 100L), (3L, 100L)))
    // multi-bucket interval must not duplicate matches
    assert(out.count() === 3L)
  }

  test("interval longer than the fan-out contract fails loudly") {
    val points = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("pid", "t")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00"))
    ).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "t", intervals, "s", "e",
        binDays = 1, maxBinsPerInterval = 8).collect()
    }
    assert(ex.getMessage.contains("bins") ||
      Option(ex.getCause).exists(_.getMessage.contains("bins")))
  }

  test("q81 plan: bucket equi-join, not a nested-loop cross product") {
    val plan = CoreQueries.q81RangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q89 prefix-sum range aggregate equals the q81 range join") {
    val a = CoreQueries.q81RangeJoin(spark, sfDir)
    val b = CoreQueries.q89RangeAggPrefix(spark, sfDir)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // and the aggregate answers are non-trivial
    assert(b.agg(org.apache.spark.sql.functions.sum("n_in_transit"))
      .collect()(0).getLong(0) > 0)
  }

  test("rangeAggregate clamps intervals outside the point spine to zeros/total") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-06-01 00:00:00"), 10L),
      (2L, ts("2024-06-03 00:00:00"), 20L)).toDF("pid", "t", "v")
    val intervals = Seq(
      (1L, ts("2023-01-01 00:00:00"), ts("2023-02-01 00:00:00")), // fully before
      (2L, ts("2025-01-01 00:00:00"), ts("2025-02-01 00:00:00")), // fully after
      (3L, ts("2023-01-01 00:00:00"), ts("2025-02-01 00:00:00")), // covers all
      (4L, ts("2024-06-02 00:00:00"), ts("2024-06-04 00:00:00"))  // partial
    ).toDF("iid", "s", "e")
    val out = RangeJoin.rangeAggregate(points, "t", "v", intervals, "s", "e")
      .select("iid", "n_points", "sum_v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((0L, 0L)))
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((2L, 30L)))
    assert(out(4L) === ((1L, 20L)))
  }

  test("interval overlap matches the naive theta join, each pair once") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-20 00:00:00"), ts("2024-01-21 00:00:00")),
      (3L, ts("2024-03-01 00:00:00"), ts("2024-03-05 00:00:00"))
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, ts("2024-01-05 00:00:00"), ts("2024-01-25 00:00:00")), // hits 1 and 2
      (20L, ts("2024-01-10 00:00:00"), ts("2024-01-12 00:00:00")), // touches 1's end
      (30L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))  // hits nothing
    ).toDF("rid", "rs", "re")
    val out = RangeJoin.intervalOverlap(left, "ls", "le",
      right, "rs", "re", binDays = 3)
    val got = out.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // same pair set AND no duplicates from shared buckets
    assert(got.sorted === naive.sorted)
    assert(got.distinct.size === got.size)
    assert(got.toSet === Set((1L, 10L), (1L, 20L), (2L, 10L)))
  }
}
