package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** Workload-driven summary-table advisor — the missing front half of
  * [[AggregateNavigator]]: the navigator ROUTES queries to pre-built
  * rollups, this decides WHICH rollups to build. Same genre as the
  * reference's monitoring-toolkit advisors (observe the workload, emit the
  * DDL a DBA would have written); the classic literature calls it
  * materialized-view selection over the grain lattice (Harinarayan,
  * Rajaraman, Ullman — "Implementing Data Cubes Efficiently", SIGMOD 1996).
  *
  * Pipeline:
  *   1. [[signatureOf]] lifts each workload query's (dims, measures) from
  *      its ANALYZED logical plan — the same plan-walk seam Lineage uses,
  *      so any grouped-aggregate DataFrame is observable, not just ones
  *      built through this library.
  *   2. [[recommend]] runs greedy weighted set-cover over candidate grains
  *      (observed grains plus their pairwise unions): each round picks the
  *      grain covering the most still-uncovered query weight, subject to a
  *      row budget — grain cardinalities are estimated in ONE pass over the
  *      base (one approx_count_distinct per candidate in a single agg), so
  *      advising never scans the fact more than once.
  *
  * A grain G answers a query (D, M) iff D ⊆ G — the navigator's own
  * coverage rule — and the recommended summary carries the union of
  * covered measures, so `AggregateNavigator.build(base, grain, measures)`
  * materializes exactly what `route` needs.
  */
object ViewAdvisor {

  /** One observed query: its grouping dims, measure columns, and how often
    * it runs (weight — e.g. executions/day from the QueryJournal).
    */
  final case class WorkloadQuery(dims: Set[String], measures: Set[String],
    weight: Long = 1L)

  final case class Recommendation(dims: Set[String], measures: Set[String],
    queriesCovered: Long, weightCovered: Long, estRows: Long)

  /** Lift (dims, measures) from a grouped-aggregate frame's analyzed plan.
    * None when the frame's top shape is not a grouped aggregate.
    */
  def signatureOf(df: DataFrame): Option[WorkloadQuery] =
    df.queryExecution.analyzed.collectFirst { case agg: Aggregate =>
      val dims = agg.groupingExpressions.flatMap {
        case a: AttributeReference => Seq(a.name)
        case Alias(a: AttributeReference, _) => Seq(a.name)
        case other => other.collect { case a: AttributeReference => a.name }
      }.toSet
      val measures = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression =>
          ae.aggregateFunction.children.collect {
            case a: AttributeReference => a.name
          }
      }.flatten).toSet -- dims
      WorkloadQuery(dims, measures)
    }

  /** Greedy weighted set-cover over the candidate grain lattice. */
  def recommend(workload: Seq[WorkloadQuery], base: DataFrame,
      maxSummaries: Int = 3,
      maxGrainRows: Long = Long.MaxValue): Seq[Recommendation] = {
    val observed = workload.map(_.dims).distinct
    val candidates = (observed ++
      (for (a <- observed; b <- observed if a != b) yield a ++ b))
      .distinct.filter(_.nonEmpty)
    if (candidates.isEmpty) return Seq.empty
    // ONE base pass estimates every candidate grain's cardinality
    val exprs = candidates.zipWithIndex.map { case (dims, i) =>
      approx_count_distinct(struct(dims.toSeq.sorted.map(col): _*)).as(s"g$i")
    }
    val est = base.agg(exprs.head, exprs.tail: _*).collect()(0)
    val rows = candidates.indices.map(i => est.getLong(i))

    val remaining = scala.collection.mutable.ArrayBuffer(workload: _*)
    val picked = scala.collection.mutable.ArrayBuffer.empty[Recommendation]
    while (picked.size < maxSummaries && remaining.nonEmpty) {
      val scored = candidates.zipWithIndex
        .filter { case (_, i) => rows(i) <= maxGrainRows }
        .map { case (g, i) =>
          val covered = remaining.filter(q => q.dims.subsetOf(g))
          (g, i, covered)
        }
        .filter(_._3.nonEmpty)
      if (scored.isEmpty) return picked.toSeq
      // benefit per unit cost (covered weight per summary row — the HRU
      // greedy), so a mega-union grain only wins when its extra rows pay
      // for themselves; ties break toward fewer rows, then by name
      val (g, i, covered) = scored.maxBy { case (_, idx, cov) =>
        (cov.map(_.weight).sum * 1000000L / math.max(rows(idx), 1L),
          -rows(idx), candidates(idx).toSeq.sorted.mkString(","))
      }
      picked += Recommendation(g, covered.flatMap(_.measures).toSet,
        covered.size.toLong, covered.map(_.weight).sum, rows(i))
      remaining --= covered
    }
    picked.toSeq
  }

  /** Materialize the recommendations as navigator-ready summaries. */
  def materialize(base: DataFrame, recs: Seq[Recommendation])
      : Seq[AggregateNavigator.Summary] =
    recs.zipWithIndex.map { case (r, i) =>
      AggregateNavigator.Summary(s"advised_$i", r.dims,
        AggregateNavigator.build(base, r.dims.toSeq.sorted,
          r.measures.toSeq.sorted))
    }
}
