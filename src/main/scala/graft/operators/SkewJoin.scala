package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for large joins (SURVEY.md §4: the reference flags
  * ≤ 0.10 min/max distribution ratios and advises re-keying,
  * vw_tables_with_skew.sql:19, whitepaper.md:47). AQE's skew-join split
  * handles most cases at runtime; this utility is the deterministic, explicit
  * form for keys known to be pathological: the skewed (probe) side gets a
  * uniform random salt in [0, k), the build side is replicated k ways, and
  * the join key becomes (key, salt) — fanning one hot partition out to k.
  */
object SkewJoin {

  /** Inner equi-join with a salted key. `left` is the skewed side (salted),
    * `right` is replicated `saltFactor`×. Result equals the plain inner join.
    */
  def saltedInner(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int, seed: Long = 42L): DataFrame = {
    val saltedLeft = left.withColumn("graft_salt",
      (rand(seed) * saltFactor).cast("int"))
    val explodedRight = right.withColumn("graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("graft_salt") === explodedRight("graft_salt"))
      .drop("graft_salt")
  }
}
