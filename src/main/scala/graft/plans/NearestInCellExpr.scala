package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest fine centroid WITHIN one coarse cell — the second hop of a
  * two-level IVF quantizer. `left` is the vector, `right` the coarse cell id
  * chosen by [[NearestCentroidsExpr]]; the flat fine matrix holds k2
  * centroids per cell, cell-major, and only the addressed cell's slice is
  * scanned: per-row assignment work is O(k1 + k2) = O(2·√K) for K total
  * lists, against O(K) for a flat quantizer. Returns the GLOBAL fine list id
  * (cell·k2 + argmin-in-cell), so inverted lists key on one int.
  *
  * Same ordering and arithmetic contract as [[NearestCentroidsExpr]]:
  * left-to-right double dot fold, driver-side |c|², ties to the smaller id,
  * generated code size independent of the centroid count.
  */
case class NearestInCellExpr(left: Expression, right: Expression,
    fine: Seq[Seq[Double]], cells: Int) extends BinaryExpression {

  private val k2 = if (cells == 0) 0 else fine.size / cells
  private val dim = if (fine.isEmpty) 0 else fine.head.size

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](fine.size * dim)
    var j = 0
    while (j < fine.size) {
      var i = 0
      while (i < dim) { a(j * dim + i) = fine(j)(i); i += 1 }
      j += 1
    }
    a
  }
  @transient private lazy val cn2: Array[Double] =
    fine.map(c => c.map(x => x * x).sum).toArray

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType)
          if cells > 0 && fine.size == cells * k2 && k2 > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_in_cell expects (array<double>, int cell) and a fine " +
            s"matrix of cells×k2 rows; got ${left.dataType.catalogString}, " +
            s"${right.dataType.catalogString}, ${fine.size} rows / $cells cells")
    }

  override def nullSafeEval(v0: Any, c0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val cell = c0.asInstanceOf[Int]
    if (v.numElements() != dim || cell < 0 || cell >= cells) return null
    var best = cell * k2
    var bestD = Double.PositiveInfinity
    var j = cell * k2
    val end = j + k2
    while (j < end) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getDouble(i) * flat(j * dim + i); i += 1 }
      val d = -2.0 * dot + cn2(j)
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("fineFlat", flat, "double[]")
    val nRef = ctx.addReferenceObj("fineNorms", cn2, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dim || $cell < 0 || $cell >= $cells) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = $cell * $k2;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $end = $cell * $k2 + $k2;
         |  for (int $j = $cell * $k2; $j < $end; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $v.getDouble($i) * $cRef[$j * $dim + $i];
         |    }
         |    double $d = -2.0 * $dot + $nRef[$j];
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_in_cell"

  override def toString: String =
    s"$prettyName($left, $right, cells=$cells, k2=$k2, dim=$dim)"
}
