package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def eot = lit(Scd2.EndOfTime).cast("timestamp")

  private def baseDim = Tables.nation(spark, sfDir)
    .select(col("n_nationkey").as("key"), col("n_name").as("name"),
      lit("2000-01-01 00:00:00").cast("timestamp").as("valid_from"),
      eot.as("valid_to"), lit(1).as("lineage"))

  test("SCD-2 merge closes changed rows, opens new versions, keeps the rest") {
    val t1 = lit("2010-06-01 00:00:00").cast("timestamp")
    val updates = Seq(
      (0, "NATION_0_RENAMED"),   // changed
      (1, "NATION_1"),           // unchanged (no-op)
      (99, "NEW_NATION"))        // brand-new key
      .toDF("key", "name")
    val merged = Scd2.applyUpdates(baseDim, updates, "key", Seq("name"), t1)
      .cache()

    assert(merged.count() === 25 + 2) // one closed+reopened, one new key
    // current rows: one per key, 26 keys
    val current = Scd2.currentRows(merged)
    assert(current.count() === 26)
    assert(current.groupBy("key").count().filter(col("count") > 1).count() === 0)
    assert(current.filter(col("key") === 0).collect()(0)
      .getAs[String]("name") === "NATION_0_RENAMED")
    assert(current.filter(col("key") === 99).collect()(0)
      .getAs[String]("name") === "NEW_NATION")
    // the closed row keeps the old value with valid_to = effective ts
    val closed = merged.filter(col("key") === 0 && col("valid_to") =!= eot)
      .collect()(0)
    assert(closed.getAs[String]("name") === "NATION_0")
    assert(closed.getTimestamp(3).toString === "2010-06-01 00:00:00.0")
    // point-in-time query sees the old version before the change
    val before = Scd2.asOf(merged, lit("2005-01-01 00:00:00").cast("timestamp"))
      .filter(col("key") === 0).collect()
    assert(before.length === 1 && before(0).getAs[String]("name") === "NATION_0")
    // carried column (lineage) survives on reopened rows
    assert(current.filter(col("key") === 0).collect()(0).getAs[Int]("lineage") === 1)
    merged.unpersist()
  }

  test("idempotence: re-applying the same batch changes nothing") {
    val t1 = lit("2010-06-01 00:00:00").cast("timestamp")
    val updates = Seq((0, "NATION_0_RENAMED")).toDF("key", "name")
    val once = Scd2.applyUpdates(baseDim, updates, "key", Seq("name"), t1)
    val twice = Scd2.applyUpdates(once, updates, "key", Seq("name"),
      lit("2011-01-01 00:00:00").cast("timestamp"))
    assert(twice.count() === once.count())
    assert(Scd2.currentRows(twice).filter(col("key") === 0).count() === 1)
  }
}
