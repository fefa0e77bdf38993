package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA principal axis at warehouse scale — the standard big-data split: the
  * corpus-sized work is ONE exact-integer co-moment pass (d(d+1)/2 upper-
  * triangle products, rolled up distributed), and the d×d eigensolve runs
  * on the driver like the reference keeps its small control metadata on
  * the control node. No MLlib, no per-row Gram matrices shipped around.
  *
  * Exactness is the design point: components quantize per row to e4
  * integers (the q60/q62 convention), so the co-moment sums are
  * order-independent integers — a distributed double sum would carry
  * last-ulp nondeterminism that an exact-compare gate cannot tolerate, and
  * n·ΣXY − ΣX·ΣY then gives the (n²-scaled) covariance with no division
  * at all. The driver's power iteration is plain IEEE *, +, /, sqrt in a
  * fixed loop order — bit-deterministic, which is what lets the q227
  * oracle inline the resulting axis as SQL literals (the q64 centroid
  * pattern).
  */
object Pca {

  /** Principal-axis model: e6-quantized unit eigenvector plus the Rayleigh
    * quotient of the integer covariance (n²-scaled, e8 units).
    */
  final case class Model(dim: Int, n: Long, wE6: Array[Long])

  private val Iters = 50

  /** One distributed pass → exact integer co-moments (n, S_i, M_ij for the
    * i ≤ j upper triangle). DECIMAL(38,0) accumulation: an e4·e4 product is
    * ~10⁸ per row, which overflows int64 somewhere past 10¹⁰ rows — real
    * 100 TB territory.
    */
  private def comoments(vectors: DataFrame, dim: Int)
    : (Long, Array[BigInt], Array[Array[BigInt]]) = {
    val q = vectors.select(transform(col("embedding").cast("array<double>"),
      x => round(x * 10000, 0).cast("long")).as("q"))
    val rolled = q.select(explode(expr(
      s"""flatten(transform(q, (x, i) ->
         |  transform(slice(q, i + 1, $dim - i),
         |    (y, jj) -> struct(i AS i, i + jj AS j, x * y AS p))))"""
        .stripMargin)).as("t"))
      .select(col("t.i"), col("t.j"), col("t.p"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast("decimal(38,0)")).as("m"))
      .collect()
    val lin = q.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .collect()
    val s = new Array[BigInt](dim)
    var n = 0L
    lin.foreach { r =>
      s(r.getAs[Int]("i")) = BigInt(r.getDecimal(1).toBigInteger)
      n = r.getAs[Long]("n")
    }
    val m = Array.fill(dim)(new Array[BigInt](dim))
    rolled.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val v = BigInt(r.getDecimal(3).toBigInteger)
      m(i)(j) = v; m(j)(i) = v
    }
    (n, s, m)
  }

  /** Train the principal axis: co-moment pass + driver power iteration. */
  def train(vectors: DataFrame, dim: Int): Model = {
    val (n, s, m) = comoments(vectors, dim)
    // n²-scaled covariance: C_ij = n·M_ij − S_i·S_j (exact integers)
    val c = Array.tabulate(dim, dim)((i, j) => (BigInt(n) * m(i)(j) - s(i) * s(j)))
    // scale to doubles around unity so the iteration never overflows
    val maxAbs = c.flatten.map(_.abs).max.max(BigInt(1))
    val a = c.map(_.map(x => (BigDecimal(x) / BigDecimal(maxAbs)).toDouble))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    (1 to Iters).foreach { _ =>
      val nv = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += a(i)(j) * v(j); j += 1 }
        nv(i) = acc
        i += 1
      }
      var norm2 = 0.0
      i = 0
      while (i < dim) { norm2 += nv(i) * nv(i); i += 1 }
      val norm = math.sqrt(norm2)
      i = 0
      while (i < dim) { v(i) = nv(i) / norm; i += 1 }
    }
    // canonical sign: the largest-|component| coordinate is positive
    val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v = v.map(-_)
    Model(dim, n, v.map(x => math.rint(x * 1e6).toLong))
  }

  /** Exact integer projection score (e10 units: e6 axis × e4 components).
    * |w|·|q|·d tops out near 2^42 here — and the oracle's double-valued
    * list_dot_product is still exact through 2^53.
    */
  def scoreExpr(q: Column, model: Model): Column = {
    val w = array(model.wE6.map(lit(_)): _*)
    aggregate(zip_with(q, w, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
  }
}
