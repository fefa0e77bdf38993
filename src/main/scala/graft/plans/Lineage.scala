package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage extraction — the impact-analysis / governance tool
  * behind "which source columns feed this report column?" (the engine-side
  * answer to the reference's object-dependency catalog queries, at COLUMN
  * rather than object granularity). A driver-side walk of the ANALYZED
  * plan: leaves contribute (table, column) pairs, every intermediate node
  * maps its named outputs to the union of its inputs' contributions, and
  * multi-child nodes merge. Expression-level derivations (CASE, arithmetic,
  * aggregates, window functions, generators) resolve through their
  * references, so a computed column reports every source column it reads.
  *
  * Deliberately metadata-only: no data is touched, the walk is O(plan
  * size) on the driver — usable as a CI gate (assert a PII column never
  * reaches an export) or to scope a backfill.
  */
object Lineage {

  /** Output column name → contributing (table, column) pairs. */
  def columnLineage(df: DataFrame): Map[String, Set[(String, String)]] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Table name for a leaf relation: the catalog identifier when the scan
    * is a catalog table, else the file path's basename with a trailing
    * format extension dropped (the Tables.scala read-by-path convention).
    */
  private def leafName(lr: LogicalRelation): String =
    lr.catalogTable.map(_.identifier.table).getOrElse {
      val loc = lr.relation match {
        case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          f.location.rootPaths.headOption.map(_.getName).getOrElse("unknown")
        case _ => "unknown"
      }
      loc.replaceAll("\\.(parquet|orc|csv|json)$", "")
    }

  private def walk(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] =
    plan match {
      case lr: LogicalRelation =>
        val t = leafName(lr)
        lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case _ =>
        val childMaps = plan.children.map(walk)
        val merged = childMaps.foldLeft(
          Map.empty[ExprId, Set[(String, String)]]) { (acc, m) =>
          m.foldLeft(acc) { case (a, (k, v)) =>
            a.updated(k, a.getOrElse(k, Set.empty) ++ v)
          }
        }
        def ofRefs(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Set[(String, String)] =
          e.references.toSeq.flatMap(r => merged.get(r.exprId))
            .flatten.toSet
        plan match {
          case p: Project =>
            merged ++ named(p.projectList, merged, ofRefs)
          case a: Aggregate =>
            merged ++ named(a.aggregateExpressions, merged, ofRefs)
          case w: Window =>
            merged ++ named(w.windowExpressions, merged, ofRefs)
          case g: Generate =>
            merged ++ g.generatorOutput.map(o =>
              o.exprId -> ofRefs(g.generator)).toMap
          case u: Union =>
            // each output position unions the corresponding child columns
            val perPos = u.children.map(_.output)
            merged ++ u.output.zipWithIndex.map { case (o, i) =>
              o.exprId -> perPos.flatMap(cs =>
                merged.getOrElse(cs(i).exprId, Set.empty)).toSet
            }.toMap
          case _ => merged
        }
    }

  private def named(exprs: Seq[NamedExpression],
      merged: Map[ExprId, Set[(String, String)]],
      ofRefs: org.apache.spark.sql.catalyst.expressions.Expression =>
        Set[(String, String)]): Map[ExprId, Set[(String, String)]] =
    exprs.map {
      case a: Alias => a.exprId -> ofRefs(a.child)
      case att: Attribute => att.exprId -> merged.getOrElse(att.exprId, Set.empty)
      case other => other.exprId -> ofRefs(other)
    }.toMap
}
