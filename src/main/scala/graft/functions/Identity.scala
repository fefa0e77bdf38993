package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Surrogate-key assignment — the `BIGINT IDENTITY(1,1)` analog (SURVEY.md
  * §1.3; reference: samples/databases/wide-world-importers/tables/
  * fact.sale.sql:3). Spark has no global sequence, so three strategies with
  * different scale/semantics trade-offs (§7.4 risk 2):
  *
  *  - `dense`      — row_number over a total order + offset: exact IDENTITY
  *    semantics, costs a global sort; use for dimension loads.
  *  - `monotonic`  — monotonically_increasing_id + offset: unique and
  *    ascending but sparse; no shuffle at all; use when only uniqueness
  *    matters.
  *  - `zipDense`   — RDD zipWithIndex: dense and gap-free WITHOUT a global
  *    sort (one count pass + per-partition offsets); ordering is the
  *    partition order, not a key order; the right default for huge fact
  *    loads.
  */
object Identity {

  def dense(df: DataFrame, name: String, orderBy: Seq[Column],
      offset: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderBy: _*)
    df.withColumn(name, row_number().over(w).cast(LongType) + offset)
  }

  def monotonic(df: DataFrame, name: String, offset: Long = 0L): DataFrame =
    df.withColumn(name, monotonically_increasing_id() + lit(1L) + offset)

  def zipDense(df: DataFrame, name: String, offset: Long = 0L): DataFrame = {
    val schema = df.schema.add(StructField(name, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L + offset))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Incremental-load continuation: next offset = current max key (the
    * stored-max pattern for appending with IDENTITY continuity).
    */
  def nextOffset(df: DataFrame, keyCol: String): Long = {
    val r = df.agg(max(col(keyCol))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
