package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join and spreads the hot key") {
    // Manufacture skew: 90% of lineitem rows share one supplier key.
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("skew_key",
        when(rand(7) < 0.9, lit(1L)).otherwise(col("l_suppkey")))
    val supp = Tables.supplier(spark, sfDir)
      .withColumnRenamed("s_suppkey", "skey")
    val plain = li.join(supp, li("skew_key") === supp("skey"))
    val salted = SkewJoin.saltedInner(li, supp, "skew_key", "skey", 8)
    assert(salted.count() === plain.count())
    val plainSum = plain.agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    val saltedSum = salted.agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(plainSum === saltedSum)
    // the composite key spreads the hot key across salt buckets
    val spread = li.withColumn("graft_salt", (rand(42L) * 8).cast("int"))
      .filter(col("skew_key") === 1L)
      .groupBy(col("graft_salt")).count().count()
    assert(spread === 8L)
  }
}
