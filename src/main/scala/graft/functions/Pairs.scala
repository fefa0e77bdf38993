package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The grouped in-place i<j pair generator every bounded candidate-
  * generation path shares (shingle Jaccard, MinHash/SimHash bands, cosine
  * bands, fuzzy blocks, basket pairs, image-hash chunks).
  *
  * Given a SORTED member array (sort_array gives the canonical a < b
  * orientation for free), emits `pair(x_i, x_j)` for every i < j of one
  * group — no self-join, no re-explode of both sides: a single explode over
  * nested array transforms. Fan-out is m(m-1)/2 per group, which is why
  * every caller bounds group size first (DfCap / BandCap / block caps) —
  * the cap plus this in-place shape is the engine's standard bounded-
  * candidates construction.
  */
object Pairs {

  /** `members` must be a (sorted) array column; `pair` builds the output
    * element (usually a struct) from the smaller and larger member.
    */
  def inPlace(members: Column, pair: (Column, Column) => Column): Column =
    explode(flatten(transform(members, (x, i) =>
      transform(slice(members, i + lit(2), size(members)),
        y => pair(x, y)))))

  /** Both orientations of an undirected edge row IN PLACE — the
    * replacement for the `e.union(e.select(b, a))` idiom, which re-derives
    * the whole upstream edge pipeline once per union branch (the flipped
    * projections defeat exchange reuse; measured 2× the edge-rollup scans
    * in every before-plan that used it, r9). One explode over a 2-element
    * array keeps a single derivation and doubles rows in place. `a` / `b`
    * are the endpoint column names (emitted under the same names, swapped
    * in the second orientation); `carry` columns ride along unchanged.
    */
  def bothOrientations(df: org.apache.spark.sql.DataFrame, a: String,
      b: String, carry: String*): org.apache.spark.sql.DataFrame = {
    def side(x: String, y: String) =
      struct((col(x).as(a) +: col(y).as(b) +: carry.map(col)): _*)
    df.select(explode(array(side(a, b), side(b, a))).as("pfx_e"))
      .select(col("pfx_e.*"))
  }
}
