package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the union+window as-of join: latest-prior match, inclusive
  * at equal timestamps, deterministic equal-time tie-break, tolerance gating,
  * and null for left rows with no prior right row.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    (1L, 10L, 100L), // key 10, t=100
    (2L, 10L, 205L),
    (3L, 20L, 50L), // before any right row for key 20
    (4L, 30L, 10L) // key with no right rows at all
  ).toDF("id", "k", "t")

  private def right = Seq(
    (10L, 100L, 1L, 11.0), // equal-time with left id=1 -> inclusive match
    (10L, 100L, 2L, 22.0), // same key+time: tie-break max rid wins
    (10L, 200L, 3L, 33.0),
    (20L, 60L, 4L, 44.0) // after left id=3's t=50
  ).toDF("k", "rt", "rid", "v")

  test("latest prior with inclusive equal-time match and tie-break") {
    val out = AsOfJoin.latestPrior(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "rt", payload = Seq("v"),
        tieBreak = Seq("rid"))
      .select("id", "prior_v", "prior_rt")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap

    // id=1 at t=100: both right rows at rt=100 qualify (inclusive); the
    // tie-break-max row (rid=2, v=22.0) wins
    assert(out(1L) === ((Some(22.0), Some(100L))))
    // id=2 at t=205: rt=200 row is the latest prior
    assert(out(2L) === ((Some(33.0), Some(200L))))
    // id=3 at t=50: right row for key 20 is at rt=60 (future) -> no match
    assert(out(3L) === ((None, None)))
    // id=4: key 30 has no right rows
    assert(out(4L) === ((None, None)))
  }

  test("tolerance nulls out matches older than the look-back window") {
    val out = AsOfJoin.latestPrior(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "rt", payload = Seq("v"),
        tieBreak = Seq("rid"), tolerance = Some(lit(4L)))
      .select("id", "prior_v")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
    // id=1: match at distance 0 survives tol=4
    assert(out(1L) === Some(22.0))
    // id=2: latest prior is 5 ticks back -> gated out
    assert(out(2L) === None)
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val out = AsOfJoin.latestPrior(left, right, keys = Seq("k"),
      leftTime = "t", rightTime = "rt", payload = Seq("v"))
    assert(out.count() === 4L)
    assert(out.select("id").distinct().count() === 4L)
    // left columns ride through unchanged
    assert(out.columns.toSeq.startsWith(Seq("id", "k", "t")))
  }
}
