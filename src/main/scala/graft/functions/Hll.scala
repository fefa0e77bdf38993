package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable HyperLogLog construction — the ONE sketch family shared by the
  * NDV widgets (q09 estimate, q101 merge rollup, q113 set algebra, q141
  * rolling-window NDV): register index = top p bits of the 60-bit
  * md5-derived portable hash ([[Text.portableHash]]), register value = max
  * leading-zero rank of the low w bits via a comparison ladder (no libm),
  * and the raw Flajolet estimator as exact integer register sums finished
  * by ONE IEEE division — so engine and DuckDB oracle produce the
  * bit-identical estimate.
  *
  * Raw-regime caveat (applies to every consumer): there is no small-range
  * linear-counting branch — its `ln` is not bit-portable — so size m for
  * loads where n ≳ 2.5·m and the raw estimator runs uncorrected
  * (~1.04/√m standard error).
  */
final case class Hll(p: Int) {
  val m: Int = 1 << p
  /** rank window bits; ranks run 1..w+1 */
  val w: Int = 60 - p
  /** alpha·m²·2^(w+1): ONE Scala-computed double inlined into both engines */
  val estC: Double =
    0.7213 / (1 + 1.079 / m) * m.toDouble * m.toDouble * math.pow(2.0, w + 1)

  /** (bucket, rank) from a portable-hash column. */
  def bucketRank(h: Column): (Column, Column) = {
    val lo = h.bitwiseAND(lit((1L << w) - 1))
    val rank = (1 to w).foldRight(lit(w + 1): Column) { (r, els) =>
      when(lo >= lit(1L << (w - r)), lit(r)).otherwise(els)
    }
    (shiftrightunsigned(h, w), rank)
  }

  /** The DuckDB twin of [[bucketRank]]'s comparison ladder (expects the
    * low-bits column to be named `w`).
    */
  val ladderSql: String = (1 to w).map(r =>
    s"WHEN w >= ${1L << (w - r)} THEN $r").mkString("\n      ")

  /** Integer register-sum aggregate over a max-rank column `mr`, with the
    * 2^(w+1) top-up for the m − observed empty registers.
    */
  def tCol(mr: String): Column =
    sum(expr(s"shiftleft(cast(1 as bigint), ${w + 1} - $mr)")) +
      (lit(m.toLong) - count(lit(1))) * lit(1L << (w + 1))

  /** Raw estimate from a register-sum column: one IEEE division. */
  def estCol(t: Column): Column = lit(estC) / t.cast("double")

  /** SQL twin of [[tCol]] + [[estCol]] as a SELECT-list fragment. */
  def estSql(mr: String): String =
    s"""$estC / CAST(SUM(CAST(1 AS BIGINT) << (${w + 1} - $mr)) +
       |    ($m - COUNT(*)) * (CAST(1 AS BIGINT) << ${w + 1}) AS DOUBLE)""".stripMargin
}
