package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Row-level-security analog: the warehouse `CREATE SECURITY POLICY ...
  * ADD FILTER PREDICATE` pattern — a table is published through a view
  * that appends a per-audience filter predicate, so consumers never see
  * rows outside their scope. As with [[Masking]], the reader principal
  * binds at view creation (per-audience registered views), and privileged
  * principals (transitive members of a bypass role, the `GRANT UNMASK`
  * shape) get the unfiltered frame.
  *
  * The predicate is an ordinary Column expression appended as a `filter`,
  * which means Catalyst treats it like any other predicate: it pushes
  * down to the scan (`PushedFilters`) and composes with the consumer's
  * own filters — RLS costs nothing the query didn't already pay.
  * Policies compose: multiple predicates AND together in registration
  * order, mirroring stacked security policies.
  */
object Rls {

  /** Apply `predicates` to `df` unless `principal` transitively reaches a
    * role in `bypassRoles`.
    */
  def filteredFrame(sec: Security, df: DataFrame, predicates: Seq[Column],
      bypassRoles: Set[String], principal: String): DataFrame =
    if (bypassRoles.exists(r => sec.isMemberTransitive(r, principal))) df
    else predicates.foldLeft(df)((acc, p) => acc.filter(p))

  /** CREATE VIEW <viewName> FOR <principal> WITH FILTER PREDICATE(s). */
  def createFilteredView(spark: SparkSession, sec: Security,
      sourceTable: String, predicates: Seq[Column], viewName: String,
      bypassRoles: Set[String], principal: String): Unit =
    filteredFrame(sec, spark.table(sourceTable), predicates, bypassRoles,
      principal).createOrReplaceTempView(viewName)
}
