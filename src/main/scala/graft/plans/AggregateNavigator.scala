package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregate navigation — the summary-table router classic OLAP engines
  * (and the reference's nightly CTAS rollup pattern, e.g.
  * samples/scripts/data-load/CTASLoad-Example.sql) imply but leave to the
  * user: given a set of PRE-BUILT rollups at known grains, answer a
  * grouped query from the COARSEST summary that covers the requested
  * dimensions, re-aggregating by the aggregate algebra (SUM/COUNT roll up
  * by SUM, MIN/MAX by MIN/MAX, AVG is derived from SUM and COUNT at read
  * time and never stored) — and fall back to the base table only when no
  * summary covers the request.
  *
  * At 100 TB this is the difference between scanning a few thousand
  * summary rows and rescanning the fact: the navigator makes the rollup
  * investment pay for every query whose grain it dominates, automatically.
  *
  * A summary at grain G answers a request for dims D iff D ⊆ G. Among
  * covering summaries the SMALLEST row count wins (the coarsest usable
  * grain); measures are structural (`n_rows`, `sum_<m>`, `min_<m>`,
  * `max_<m>`) so re-aggregation needs no per-summary metadata.
  */
object AggregateNavigator {

  /** A registered rollup: its grain and the materialized frame. */
  final case class Summary(name: String, dims: Set[String], df: DataFrame)

  /** Builds a summary of `base` at grain `dims` over measures `measures`
    * (source column names) in the navigator's structural layout.
    */
  def build(base: DataFrame, dims: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      measures.flatMap(m => Seq(sum(col(m)).as(s"sum_$m"),
        min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Re-aggregates a summary (or summary-shaped frame) to coarser `dims`. */
  private def reaggregate(df: DataFrame, dims: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +:
      measures.flatMap(m => Seq(sum(col(s"sum_$m")).as(s"sum_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m")))
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Routes a grouped query: returns the chosen source name ("base" on
    * fallback) and the answer frame with `n_rows`, `sum_/min_/max_<m>`,
    * and derived `avg_<m>` columns. Covering summaries must carry every
    * requested measure; the coarsest covering grain (fewest dimensions)
    * wins — a grain-lattice choice, deliberately metadata-only so routing
    * never triggers a Spark action.
    */
  def route(summaries: Seq[Summary], base: DataFrame,
      dims: Seq[String], measures: Seq[String]): (String, DataFrame) = {
    // the FULL structural layout must be present — reaggregate references
    // min_/max_ too, so a partial summary must fall back, not fail later
    val needed = measures.flatMap(m =>
      Seq(s"sum_$m", s"min_$m", s"max_$m")).toSet + "n_rows"
    val covering = summaries.filter(s => dims.toSet.subsetOf(s.dims) &&
      needed.subsetOf(s.df.columns.toSet))
    val (name, summaryShaped) = covering match {
      case Nil => ("base", build(base, dims, measures))
      case cs =>
        val best = cs.minBy(s => (s.dims.size, s.name))
        (best.name, reaggregate(best.df, dims, measures))
    }
    val withAvg = measures.foldLeft(summaryShaped) { (df, m) =>
      // derived, never stored: exact integer mean in the engine's e-units
      df.withColumn(s"avg_$m",
        expr(s"CAST(sum_$m DIV n_rows AS BIGINT)"))
    }
    (name, withAvg)
  }
}
