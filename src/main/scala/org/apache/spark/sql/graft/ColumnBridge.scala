package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for registering expression-building SQL
  * functions (Spark 4's Column wraps ColumnNode; the converters live in
  * `org.apache.spark.sql.classic`, scoped private[sql] — hence this shim's
  * package). Used by graft.functions.TSqlRegistry to expose the T-SQL dialect
  * to spark.sql text without UDF serialization.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert the Column's node tree to a catalyst expression
    * (ExpressionUtils.expression would wrap it lazily as a
    * ColumnNodeExpression, which never resolves when injected through a
    * FunctionBuilder).
    */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
