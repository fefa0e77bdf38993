package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD-2 dimension maintenance — the reference's dimensions carry
  * `[Valid From]/[Valid To]` validity intervals and a `[Lineage Key]`
  * provenance column (reference: samples/databases/wide-world-importers/
  * tables/dimension.city.sql:13-15); the ETL contract is: when an attribute
  * of a business key changes, close the current row at the effective
  * timestamp and open a new current row.
  *
  * Implemented set-based (no row-at-a-time MERGE): one join of updates
  * against current rows, split into closed/unchanged/new slices, unioned.
  * At scale this is a single shuffle on the business key; history rows pass
  * through untouched (and under date partitioning, unchanged partitions
  * rewrite nothing).
  */
object Scd2 {

  val EndOfTime = "9999-12-31 23:59:59"

  private def eot: Column = lit(EndOfTime).cast("timestamp")

  /** Current-row slice (the `[Valid To] = '9999-12-31...'` filter). */
  def currentRows(dim: DataFrame, validTo: String = "valid_to"): DataFrame =
    dim.filter(col(validTo) === eot)

  /** Point-in-time (as-of) slice. */
  def asOf(dim: DataFrame, ts: Column, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame =
    dim.filter(col(validFrom) <= ts && ts < col(validTo))

  /** Apply an update batch to an SCD-2 dimension.
    *
    * @param dim         the full dimension (history + current rows) with
    *                    `validFrom`/`validTo` columns
    * @param updates     incoming rows carrying `businessKey` and the tracked
    *                    attribute columns (no validity columns)
    * @param businessKey natural key column name
    * @param tracked     attribute columns whose change triggers a new version
    * @param effectiveTs the batch's effective timestamp
    * @return the new dimension: history ∪ unchanged current ∪ closed rows ∪
    *         new versions (including brand-new keys)
    */
  def applyUpdates(dim: DataFrame, updates: DataFrame, businessKey: String,
      tracked: Seq[String], effectiveTs: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    val history = dim.filter(col(validTo) =!= eot)
    val current = currentRows(dim, validTo)
    val dimCols = dim.columns.toSeq

    // The SCD-2 invariant (one open row per key) requires at most one update
    // row per business key; a duplicated key would fan out through the join
    // into multiple open versions. Updates carry no ordering column, so
    // last-wins is undefined — dedupe deterministically on the tracked
    // attributes (callers with a meaningful event order must pre-dedupe).
    val dedupWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(businessKey))
      .orderBy(tracked.map(c => col(c).desc_nulls_last): _*)
    val updates1 = updates
      .withColumn("_graft_rn", row_number().over(dedupWin))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")

    val changeCond = tracked
      .map(c => !(col(s"u.$c") <=> col(s"c.$c")))
      .reduce(_ || _)

    val joined = current.as("c")
      .join(updates1.as("u"),
        col(s"c.$businessKey") === col(s"u.$businessKey"), "full")

    // current rows whose key got an update with a tracked-attribute change
    val closed = joined
      .filter(col(s"c.$businessKey").isNotNull &&
        col(s"u.$businessKey").isNotNull && changeCond)
      .select(dimCols.map {
        case `validTo` => effectiveTs.as(validTo)
        case c => col(s"c.$c")
      }: _*)

    // current rows with no update, or an update that changes nothing
    val unchanged = joined
      .filter(col(s"c.$businessKey").isNotNull &&
        (col(s"u.$businessKey").isNull || !changeCond))
      .select(dimCols.map(c => col(s"c.$c")): _*)

    // new versions: changed keys + brand-new keys
    val opened = joined
      .filter(col(s"u.$businessKey").isNotNull &&
        (col(s"c.$businessKey").isNull || changeCond))
      .select(dimCols.map {
        case `validFrom` => effectiveTs.as(validFrom)
        case `validTo` => eot.as(validTo)
        case c if updates.columns.contains(c) => col(s"u.$c")
        case c => col(s"c.$c") // carried columns absent from the update feed
      }: _*)

    history.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }
}
