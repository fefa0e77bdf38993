package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IdentitySpec extends SparkSpec {

  test("dense identity is gap-free 1..N in key order") {
    val df = Identity.dense(Tables.nation(spark, sfDir), "id",
      Seq(col("n_nationkey")))
    val ids = df.orderBy("n_nationkey").select("id").collect().map(_.getLong(0))
    assert(ids.toSeq === (1L to ids.length).toSeq)
  }

  test("zipDense identity is gap-free without a global sort") {
    val df = Identity.zipDense(
      Tables.lineitem(spark, sfDir).repartition(7), "id")
    val n = df.count()
    val stats = df.agg(min(col("id")), max(col("id")),
      countDistinct(col("id"))).collect()(0)
    assert(stats.getLong(0) === 1L)
    assert(stats.getLong(1) === n)
    assert(stats.getLong(2) === n)
  }

  test("monotonic identity is unique; offset continues a prior load") {
    val first = Identity.zipDense(Tables.region(spark, sfDir), "id")
    val offset = Identity.nextOffset(first, "id")
    assert(offset === first.count())
    val next = Identity.zipDense(Tables.nation(spark, sfDir), "id", offset)
    val lo = next.agg(min(col("id"))).collect()(0).getLong(0)
    assert(lo === offset + 1)
    val mono = Identity.monotonic(Tables.supplier(spark, sfDir), "id")
    assert(mono.select("id").distinct().count() === mono.count())
  }
}
