package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Redundant-join elimination over DECLARED foreign keys — the classic
  * warehouse optimizer feature behind `RELY` constraints: when a query
  * inner-joins a fact to a dimension on a declared, validated FK but never
  * touches a dimension column (BI tools emit this constantly — a view
  * joins the whole star, the query selects two fact columns), the join is
  * a no-op row-for-row and can be dropped entirely:
  *
  *   - FK containment (every child key has a parent) ⇒ the inner join
  *     loses no child rows;
  *   - parent-key uniqueness ⇒ it duplicates none;
  *   - FK non-null ⇒ no child row drops on a null key;
  *   - no parent column referenced ⇒ the join adds nothing.
  *
  * Declarations live as child-table TBLPROPERTIES written by
  * [[graft.catalog.Constraints.declareFk]] (with an optional q219-style
  * containment validation first — declaring an unvalidated FK transfers
  * the correctness obligation to the declarer, exactly like RELY). The
  * parent side must be a bare relation or a column-pruning projection of
  * one: any parent-side filter could drop child rows and blocks the
  * rewrite.
  */
object FkJoinEliminationRule extends Rule[LogicalPlan] {

  import graft.catalog.Constraints.{fkProp, fkNotNullProp}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, j: Join) =>
      eliminate(j, AttributeSet(list.flatMap(_.references)))
        .map(c => p.copy(child = c)).getOrElse(p)
    case f @ Filter(cond, j: Join) =>
      eliminate(j, cond.references).map(c => f.copy(child = c)).getOrElse(f)
    case a @ Aggregate(g, aggs, j: Join, _) =>
      eliminate(j, AttributeSet((g ++ aggs).flatMap(_.references)))
        .map(c => a.copy(child = c)).getOrElse(a)
  }

  /** The child side of `j`, when the join is provably removable given that
    * only `used` attributes are consumed above it.
    */
  private def eliminate(j: Join, used: AttributeSet): Option[LogicalPlan] =
    j match {
      case Join(l, r, Inner, Some(EqualTo(a: Attribute, b: Attribute)), _) =>
        orient(l, r, a, b).orElse(orient(r, l, b, a)).collect {
          case (child, _) if used.subsetOf(child.outputSet) => child
        }
      case _ => None
    }

  /** Checks the (child, parent) orientation: child carries the FK
    * declaration naming the parent table and key.
    */
  private def orient(childSide: LogicalPlan, parentSide: LogicalPlan,
      childAttr: Attribute, parentAttr: Attribute)
    : Option[(LogicalPlan, LogicalPlan)] = {
    if (!childSide.outputSet.contains(childAttr) ||
      !parentSide.outputSet.contains(parentAttr)) return None
    // parent must be bare: a relation or an attribute-only projection of
    // one — anything else (a filter, a computed column) can change rows.
    // Exception: IsNotNull(parentKey), which InferFiltersFromConstraints
    // plants under every inner join; with the FK declared non-null it
    // cannot drop a matching child row.
    def unNullFilter(p: LogicalPlan): LogicalPlan = p match {
      case Filter(IsNotNull(a: Attribute), c)
        if a.semanticEquals(parentAttr) => c
      case other => other
    }
    val parentRel = unNullFilter(parentSide) match {
      case lr: LogicalRelation => Some(lr)
      case Project(ps, inner) if ps.forall(_.isInstanceOf[Attribute]) =>
        unNullFilter(inner) match {
          case lr: LogicalRelation => Some(lr)
          case _ => None
        }
      case _ => None
    }
    for {
      pRel <- parentRel
      pTable <- pRel.catalogTable.map(_.identifier.table)
      cRel <- childSide.collectFirst {
        case lr: LogicalRelation if lr.outputSet.contains(childAttr) => lr
      }
      props <- cRel.catalogTable.map(_.properties)
      declared <- props.get(fkProp(childAttr.name))
      if declared == s"$pTable.${parentAttr.name}"
      if props.get(fkNotNullProp(childAttr.name)).contains("true") ||
        !childAttr.nullable
    } yield (childSide, parentSide)
  }
}
