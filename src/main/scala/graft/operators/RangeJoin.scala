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

  /** Interval-overlap join — every (left, right) pair whose time ranges
    * intersect (`lStart <= rEnd AND rStart <= lEnd`), again with no equality
    * key anywhere. Both interval sets explode into the fixed-width buckets
    * they cover and the join runs as a bucket equi-join + exact overlap
    * filter. Two overlapping intervals share every bucket their overlap
    * covers, so instead of a dedup shuffle the match is kept only in the
    * FIRST shared bucket (= max of the two start buckets) — each qualifying
    * pair is emitted exactly once, for free.
    *
    * Fan-out per row is bounded by `maxBinsPerInterval` with the same
    * in-plan raise_error contract as [[pointInInterval]]; both streams
    * shuffle once on the bucket id.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binDays: Int, maxBinsPerInterval: Int = 64): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val binSec = SecPerDay * binDays
    def binOfName(name: String): Column =
      expr(s"unix_timestamp(`$name`) div $binSec")
    def spanned(df: DataFrame, s0: String, e0: String): DataFrame = df
      .withColumn("__b0", binOfName(s0))
      .withColumn("__b1", binOfName(e0))
      .withColumn("__bins",
        when(col("__b1") - col("__b0") >= maxBinsPerInterval,
          raise_error(concat(lit(s"interval spans more than " +
            s"$maxBinsPerInterval bins of $binDays day(s): "),
            col(s0).cast("string"), lit(" .. "), col(e0).cast("string"))))
          .otherwise(sequence(col("__b0"), col("__b1"))))
      .select(df.columns.map(col) :+ col("__b0") :+
        explode(col("__bins")).as("__bin"): _*)
    val l = spanned(left, lStart, lEnd).withColumnRenamed("__b0", "__lb0")
    val r = spanned(right, rStart, rEnd).withColumnRenamed("__b0", "__rb0")
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .drop("__bin", "__lb0", "__rb0")
  }

  /** Range AGGREGATE via dense daily prefix sums — when the caller wants
    * per-interval counts/sums (not the matched pairs themselves), the
    * bucket join above still materializes every (point, interval) match:
    * output-bound, Ω(matches). This plan is O(points + intervals) instead:
    *
    *   agg over [s, e]  =  prefix(e) − prefix(s − 1 day)
    *
    * 1. aggregate points per day (one map-side-combining shuffle),
    * 2. densify onto the full day spine and prefix-sum (the spine is
    *    #distinct-days rows — thousands at any corpus size, so the single
    *    unpartitioned window is driver-scale by construction),
    * 3. broadcast the spine to the intervals and subtract the two lookups.
    *
    * Interval endpoints outside the spine clamp to its edges (before the
    * spine ⇒ zero prefix, after ⇒ grand total). Returns the intervals table
    * with `n_points` / `sum_<valueCol>` appended; every interval survives,
    * empty ones with zeros.
    */
  def rangeAggregate(points: DataFrame, pointCol: String, valueCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = points
      .groupBy(to_date(col(pointCol)).as("__day"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__v"))
    val bounds = daily.agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
    val spine = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__day"))
      .join(daily, Seq("__day"), "left")
      .withColumn("__cn", sum(coalesce(col("__n"), lit(0L)))
        .over(Window.orderBy(col("__day"))))
      .withColumn("__cv", sum(coalesce(col("__v"), lit(0L)))
        .over(Window.orderBy(col("__day"))))
      .select(col("__day"), col("__cn"), col("__cv"))
    val lookups = intervals.crossJoin(broadcast(bounds))
      .withColumn("__de", least(greatest(to_date(col(endCol)), date_sub(col("__lo"), 1)), col("__hi")))
      .withColumn("__ds", least(greatest(date_sub(to_date(col(startCol)), 1), date_sub(col("__lo"), 1)), col("__hi")))
    val e = broadcast(spine.select(col("__day").as("__de"),
      col("__cn").as("__cne"), col("__cv").as("__cve")))
    val sp = broadcast(spine.select(col("__day").as("__ds"),
      col("__cn").as("__cns"), col("__cv").as("__cvs")))
    lookups
      .join(e, Seq("__de"), "left")   // miss only when clamped below __lo
      .join(sp, Seq("__ds"), "left")
      .select(intervals.columns.map(col) :+
        (coalesce(col("__cne"), lit(0L)) - coalesce(col("__cns"), lit(0L))).as("n_points") :+
        (coalesce(col("__cve"), lit(0L)) - coalesce(col("__cvs"), lit(0L))).as(s"sum_$valueCol"): _*)
  }
}
