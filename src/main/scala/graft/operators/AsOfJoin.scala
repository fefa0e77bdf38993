package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join ("latest prior match"): for every left row, attach the most
  * recent right row with the same keys and right time ≤ left time —
  * the point-in-time lookup of event/feature pipelines (what T-SQL
  * approximates with `OUTER APPLY ... TOP 1 ... ORDER BY t DESC`; the
  * reference's dialect has no native operator either, so this is an engine
  * extension in the spirit of SURVEY.md §2.10).
  *
  * Not a range join: composed as union + ONE window pass. Both sides are
  * tagged, unioned, and shuffled once on the join keys; a running
  * `last(right_payload) IGNORE NULLS` over (time, side) order gives every
  * left row its latest prior right row in a single linear scan per key
  * group. At 100 TB that is one shuffle whose skew equals the key skew —
  * there is no candidate-pair blowup, no per-row range probe, and no
  * broadcast requirement on either side (contrast a naive
  * `l JOIN r ON l.k = r.k AND r.t <= l.t` + max-window, which materializes
  * every (left, prior-right) pair — quadratic per key).
  *
  * Determinism: among right rows with equal (keys, time), the one greatest
  * under `tieBreak` wins; ties order before left rows at the same instant,
  * so the match is inclusive (r.t = l.t matches).
  */
object AsOfJoin {

  /** @param keys      equality join keys present on both sides
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    * @param payload   right columns to attach (null when no prior row)
    * @param tieBreak  right columns breaking equal-time ties (max wins)
    * @param tolerance max look-back: matches older than
    *                  `leftTime - tolerance` are nulled out (pandas
    *                  merge_asof semantics); None = unbounded
    */
  def latestPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tieBreak: Seq[String] = Nil,
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // The packed right row: ordering fields FIRST so lexicographic struct
    // comparison in the window sort is (time, tieBreak...) — equal-time
    // right rows resolve to the tieBreak-max row deterministically.
    val rStruct = struct(
      (col(rightTime).as("__rt") +:
        tieBreak.map(c => col(c).as(s"__tb_$c"))) ++
        payload.map(c => col(c).as(c)): _*)
    val nullRStruct = lit(null).cast(
      right.select(rStruct.as("__r")).schema("__r").dataType)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        nullRStruct.as("__r"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        rStruct.as("__r"), lit(null).cast(l.schema("__l").dataType).as("__l")): _*)
    // Right rows sort before left rows at the same __t (inclusive match);
    // __r last in the order key resolves equal-time right-right ties.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inWindow = tolerance match {
      case Some(tol) => col("__m").isNotNull &&
        col("__m.__rt") >= col("__t") - tol
      case None => col("__m").isNotNull
    }
    val gated = matched.withColumn("__m",
      when(inWindow, col("__m")).otherwise(nullRStruct))
    gated.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__m.$c").as(s"prior_$c")) :+
        col("__m.__rt").as(s"prior_$rightTime"): _*)
  }
}
