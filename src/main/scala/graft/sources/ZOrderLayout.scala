package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on the interleaved
  * bits of several quantized columns so that row-group min/max envelopes
  * become tight little boxes in EVERY clustered dimension, not just the
  * leading sort key. Linear sort gives perfect pruning on one column and
  * none on the others; the Z-curve trades a little of the first dimension's
  * locality for pruning on all of them — the multi-dimensional analog of
  * the reference engine's segment elimination, where a clustered
  * columnstore skips rowgroups whose segment min/max excludes the
  * predicate (reference: samples/sqlops/MonitoringScripts/RowgroupDetails.sql
  * reads exactly those rowgroup stats; the whitepaper's DW tuning guidance
  * is the same skip-by-segment model).
  *
  * Everything is Catalyst column arithmetic (quantize + shift/or
  * interleave — codegen-friendly, no UDF), so the layout pass is one range
  * repartition + in-partition sort over the data: the standard one-time
  * cost any 100 TB table pays for a clustered layout, amortized over every
  * subsequent scan.
  */
object ZOrderLayout {

  /** Quantize a (numeric / date / timestamp) column to an integer rank in
    * [0, 2^bits): affine min-max scaling computed from the table's own
    * bounds. Constant columns quantize to 0; values are clamped so later
    * appends outside the sampled bounds still map into range.
    */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val maxQ = (1L << bits) - 1
    val v = c.cast("double")
    val q = floor((v - lo) / (hi - lo) * maxQ)
    least(greatest(when(hi === lo, lit(0L)).otherwise(q), lit(0L)), lit(maxQ))
      .cast("long")
  }

  /** Morton interleave: bit b of quantized column i lands at position
    * b·n + i. Total width must fit a signed int64.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits * qs.size <= 63,
      s"${qs.size} cols x $bits bits exceeds int64")
    val terms = for {
      b <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * qs.size + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Order-preserving numeric view of a clustering column (timestamps and
    * dates are not directly castable to double).
    */
  private def numeric(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case DateType => datediff(col(c), lit("1970-01-01")).cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** Rewrite `df` into a Z-ordered layout over `cols`: one pass computes
    * the per-column bounds (a 1-row broadcast), a second range-partitions
    * on the Z-value into `numFiles` tasks and sorts within each — so each
    * output file covers a compact Z-range, i.e. a small hyper-box of the
    * clustered space. Write the result with any sink; downstream scans
    * prune by row-group stats in every clustered dimension.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "need at least one clustering column")
    val aggs = cols.flatMap { c =>
      Seq(min(numeric(df, c)).as(s"__lo_$c"),
        max(numeric(df, c)).as(s"__hi_$c"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val qs = cols.map(c =>
      quantize(numeric(df, c), col(s"__lo_$c"), col(s"__hi_$c"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave(qs, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z" +: cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }
}
