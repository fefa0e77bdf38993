package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via fixed-size time-bucket expansion — the
  * scalable plan for `p JOIN i ON i.start <= p.t AND p.t <= i.end` when
  * there is no equality key (T-SQL expresses this as a theta-join the MPP
  * engine executes as a broadcast-nested-loop; Spark's BNLJ is the same
  * trap at 100 TB).
  *
  * Each interval is exploded into the fixed-width buckets it covers and
  * each point maps to exactly ONE bucket, so the join is a plain equi-join
  * on bucket id followed by the exact containment filter: candidates are
  * bounded by per-bucket density × interval fan-out (≤ maxBinsPerInterval,
  * enforced in-plan with raise_error rather than silently dropping long
  * intervals), there is no cross product, and both sides shuffle once on
  * the bucket id. Bucket width should be sized to the typical interval
  * length (one to a few buckets per interval).
  *
  * A point joins only its own bucket, so a multi-bucket interval can never
  * match the same point twice — no dedup pass is needed.
  */
object RangeJoin {

  private val SecPerDay = 86400L

  /** Inner point-in-interval join: every (point, interval) pair with
    * `start <= point <= end`. Output carries all columns of both inputs
    * (project/rename beforehand on name clashes); left-join semantics are
    * one aggregate-and-rejoin away (see q81).
    *
    * @param binDays bucket width in days (size to the typical interval)
    * @param maxBinsPerInterval fan-out contract: an interval covering more
    *   buckets than this fails the query instead of silently exploding
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binDays: Int, maxBinsPerInterval: Int = 64): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val binSec = SecPerDay * binDays
    // truncating division is monotone non-decreasing, which is all the
    // bucket mapping needs: start <= p <= end  =>  bin(start) <= bin(p) <= bin(end)
    def binOf(name: String): Column =
      expr(s"unix_timestamp(`$name`) div $binSec")
    val spanned = intervals
      .withColumn("__b0", binOf(startCol))
      .withColumn("__b1", binOf(endCol))
      .withColumn("__bins",
        when(col("__b1") - col("__b0") >= maxBinsPerInterval,
          raise_error(concat(lit(s"interval spans more than " +
            s"$maxBinsPerInterval bins of $binDays day(s): "),
            col(startCol).cast("string"), lit(" .. "),
            col(endCol).cast("string"))))
          .otherwise(sequence(col("__b0"), col("__b1"))))
      .select(intervals.columns.map(col) :+ explode(col("__bins")).as("__bin"): _*)
    val binned = points.withColumn("__bin", binOf(pointCol))
    binned.join(spanned, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
