package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TSql._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) to a DataFrame program over the driver
  * testdata; `oracleSql` carries the DuckDB-equivalent SQL for each
  * SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): the
    * whitepaper's rank-over-aggregate OLAP example (reference:
    * whitepaper.md:188-197) over the star schema — join, hash agg, window.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q21RankAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, Q] =
    CoreQueries.queries ++ FunctionQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ FunctionQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles
}
