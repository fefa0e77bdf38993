package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`nprobe` nearest centroids of a dense vector, ordered by
  * (-2·v·c + |c|², then centroid id) — the IVF coarse-quantizer assignment
  * (Ivf.assignExpr/probeExpr).
  *
  * Why a custom expression: the literal formulation (array_min over k
  * structs, each holding a dot product against a dim-element literal) inlines
  * k×dim doubles into the expression tree, so generated code grows with k and
  * blows past the JIT/codegen method limits at a realistic coarse-quantizer
  * size (k ≥ 1024 — VERDICT r2 #4), falling back to interpreted. Here the
  * centroid matrix is a class-level reference object and the generated code
  * is two fixed loops — O(1) code size in k, O(k·dim) work, plus an
  * insertion into a size-nprobe top list (no O(k log k) sort_array).
  *
  * Arithmetic is bit-identical to the literal form and the DuckDB oracle's
  * `ORDER BY -2*list_dot_product(v,c)+cn2, j`: the dot accumulates
  * left-to-right in double (same fold as [[DotProductExpr]]), |c|² is
  * precomputed driver-side with the same Scala sum, and ties break to the
  * smaller centroid id (strict-< insertion keeps earlier ids ahead).
  */
case class NearestCentroidsExpr(child: Expression,
    centroids: Seq[Seq[Double]], nprobe: Int) extends UnaryExpression {

  private val k = centroids.size
  private val dim = if (centroids.isEmpty) 0 else centroids.head.size
  private val np = math.min(nprobe, k)

  // flat row-major copy + |c|^2 terms, shipped as codegen reference objects
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var i = 0
      while (i < dim) { a(j * dim + i) = centroids(j)(i); i += 1 }
      j += 1
    }
    a
  }
  @transient private lazy val cn2: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true // NULL on dimension mismatch

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if k > 0 && nprobe > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_centroids expects array<double> input, non-empty centroids" +
            s" and nprobe > 0; got ${child.dataType.catalogString}, k=$k")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val bestJ = new Array[Int](np)
    val bestD = new Array[Double](np)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getDouble(i) * flat(j * dim + i); i += 1 }
      val d = -2.0 * dot + cn2(j)
      var pos = np
      while (pos > 0 && d < bestD(pos - 1)) pos -= 1
      if (pos < np) {
        var q = np - 1
        while (q > pos) { bestD(q) = bestD(q - 1); bestJ(q) = bestJ(q - 1); q -= 1 }
        bestD(pos) = d; bestJ(pos) = j
      }
      j += 1
    }
    new GenericArrayData(bestJ)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    val nRef = ctx.addReferenceObj("centroidNorms", cn2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val pos = ctx.freshName("pos")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val bestJ = ctx.freshName("bestJ")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $bestJ = new int[$np];
         |  double[] $bestD = new double[$np];
         |  java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $v.getDouble($i) * $cRef[$j * $dim + $i];
         |    }
         |    double $d = -2.0 * $dot + $nRef[$j];
         |    int $pos = $np;
         |    while ($pos > 0 && $d < $bestD[$pos - 1]) $pos--;
         |    if ($pos < $np) {
         |      for (int $q = $np - 1; $q > $pos; $q--) {
         |        $bestD[$q] = $bestD[$q - 1]; $bestJ[$q] = $bestJ[$q - 1];
         |      }
         |      $bestD[$pos] = $d; $bestJ[$pos] = $j;
         |    }
         |  }
         |  ${ev.value} =
         |    ${classOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData].getName}.fromPrimitiveArray($bestJ);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"

  // k×dim doubles do NOT belong in plan strings (a k=1024 quantizer would
  // put 65k numbers into every explain/WARN line)
  override def toString: String =
    s"$prettyName($child, k=$k, dim=$dim, nprobe=$np)"
}
