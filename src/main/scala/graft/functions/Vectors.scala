package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built on
  * Catalyst higher-order functions (`zip_with` + `aggregate`) so the math is a
  * sequential fold in generated code — deterministic, no UDF, no
  * serialization. Accumulation is in double for precision.
  */
object Vectors {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature (Charikar 2002): `planes` pseudo-random
    * hyperplanes with components derived deterministically from
    * xxhash64(planeIdx, dimIdx) mapped to [-0.5, 0.5); signature bit p = sign
    * of the projection. Vectors with high cosine similarity agree on most
    * bits.
    */
  def hyperplaneSignature(v: Column, dim: Int, planes: Int): Column = {
    def component(p: Int, d: Int): Column =
      (pmod(xxhash64(lit(p), lit(d)), lit(1000000L)).cast("double") / 1000000.0) - 0.5
    array((0 until planes).map { p =>
      val proj = (0 until dim).map { d =>
        element_at(v, d + 1).cast("double") * component(p, d)
      }.reduce(_ + _)
      when(proj >= 0, 1).otherwise(0)
    }: _*)
  }

  /** Bucket id = the signature packed into a long (planes ≤ 32). */
  def hyperplaneBucket(sig: Column): Column =
    aggregate(sig, lit(0L), (acc, bit) => acc * 2 + bit.cast("long"))
}
