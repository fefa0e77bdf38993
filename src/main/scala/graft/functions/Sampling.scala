package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Deterministic sampling aggregates. */
object Sampling {

  /** Bottom-k by key as a partial-aggregating Column
    * ([[graft.plans.BottomKAgg]]): the k smallest (key, value) pairs of the
    * group, ascending. With a hash key this is a uniform KMV-style sample —
    * O(k) state per group, map-side combinable, no per-group sort.
    */
  def bottomK(key: Column, value: Column, k: Int): Column =
    ColumnBridge.column(graft.plans.BottomKAgg(
      ColumnBridge.expression(key),
      ColumnBridge.expression(value), k).toAggregateExpression())

  /** Misra-Gries heavy-hitter candidates as a partial-aggregating Column
    * ([[graft.plans.FrequentItemsAgg]]): ≤ k items per group, guaranteed to
    * contain every item with frequency > 1/(k+1) of the group — across
    * map-side partials and merges. Pair with an exact recount of the
    * candidates for exact φ-heavy hitters (φ > 1/(k+1)) in two passes.
    */
  def frequentCandidates(item: Column, k: Int): Column =
    ColumnBridge.column(graft.plans.FrequentItemsAgg(
      ColumnBridge.expression(item), k).toAggregateExpression())
}
