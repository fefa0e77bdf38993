package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen-native dense dot product over `array<float>` / `array<double>`
  * columns — the one operator in this engine where the built-in surface
  * genuinely can't deliver: `aggregate(zip_with(a, b, _*_), 0d, _+_)` runs on
  * the interpreted higher-order-function path and allocates an intermediate
  * array per row, which dominates ANN/near-dup joins (millions of pairs).
  * This expression emits a tight primitive loop instead (SURVEY.md §7.3
  * preference order: compose built-ins → custom Expression → custom
  * operator).
  *
  * Semantics are IDENTICAL to the sequential double fold (left-to-right
  * `acc += (double)a(i) * (double)b(i)`), so results are bit-equal to the
  * zip_with/aggregate form and to the DuckDB oracle's list_dot_product.
  * That includes the mismatched-length case: zip_with pads the shorter array
  * with nulls, which poisons the fold to NULL — so a dimension mismatch
  * returns NULL here too rather than a plausible-looking partial product.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch even when both inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        // mixed float/double is allowed: each element is widened to double
        // exactly as zip_with's x.cast("double") * w would
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double> on both sides, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.$lGet($i) * (double) $y.$rGet($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
