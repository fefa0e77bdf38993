package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the vector-compression half of the
  * billion-scale IVF-PQ ANN stack (Ivf supplies the list pruning; PQ
  * replaces each stored vector with M small codes).
  *
  * The embedding is split into M subspaces of dim/M components; each
  * subspace trains its own tiny codebook (driver-side deterministic Lloyd
  * over the capped sample, like the IVF quantizers), and a vector's code
  * word is the per-subspace argmin centroid. Storage per vector drops from
  * dim doubles to M small ints — at 100 TB this is what makes the candidate
  * lists fit in executor memory.
  *
  * Query-side ranking is asymmetric distance computation (ADC): the probe
  * precomputes, per subspace, the distance from ITS exact subvector to each
  * codebook centroid (an M×ksub table — one `array<array<double>>` column
  * built once per probe row), and a candidate's distance is M table
  * lookups summed in fixed subspace order. Table entries are
  * `-2·p_m·c + |c|²`: the omitted |p_m|² term is constant per (probe,
  * subspace), so the ranking is the true ADC L2 ranking, and the value is
  * bit-identical to the oracle's correlated-subquery form.
  */
object Pq {

  /** Trained product codebooks: `books(m)(j)` = centroid j of subspace m. */
  final case class Codebooks(m: Int, dsub: Int,
      books: Seq[Seq[Seq[Double]]]) {
    def ksub: Int = books.head.size
  }

  /** Deterministic per-subspace training on the vec_id-ordered capped
    * sample (the [[Ivf.train]] discipline, so oracles can inline the
    * books).
    */
  def train(vectors: DataFrame, m: Int, ksub: Int, dim: Int, iters: Int,
      idCol: String = "vec_id"): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val sample: Array[Array[Double]] = vectors
      .select(col(idCol), col("embedding").cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(Ivf.TrainSampleCap)
      .collect().map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty table")
    val books = (0 until m).map { mi =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, mi * dsub,
        (mi + 1) * dsub))
      Ivf.localLloyd(sub, math.min(ksub, sub.length), dsub, iters)
    }
    Codebooks(m, dsub, books)
  }

  /** PQ code word: `array<int>` of the M per-subspace argmin centroid ids
    * (0-based; ties to the smaller id — the NearestCentroidsExpr ordering).
    * M O(1)-codegen argmin expressions, one per subspace slice.
    */
  def encodeExpr(v: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { mi =>
      Ivf.assignExpr(slice(v, mi * cb.dsub + 1, cb.dsub), cb.books(mi))
    }: _*)

  /** The probe's ADC table: entry [m][j] = -2·p_m·c_mj + |c_mj|², the
    * centroid-dependent part of ||p_m - c_mj||². Evaluated once per probe
    * row; candidates only look entries up.
    */
  def adcTableExpr(p: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { mi =>
      array(cb.books(mi).map { c =>
        val cn2 = c.map(x => x * x).sum
        val clit = array(c.map(lit): _*)
        lit(-2.0) * graft.functions.Vectors.dot(
          slice(p, mi * cb.dsub + 1, cb.dsub), clit) + lit(cn2)
      }: _*)
    }: _*)

  /** ADC distance: M table lookups summed in fixed subspace order (left
    * fold — the oracle adds the same scalars in the same order).
    */
  def adcDistance(adcTable: Column, codes: Column, m: Int): Column =
    (0 until m).map { mi =>
      element_at(element_at(adcTable, mi + 1), element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)
}
