package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The DataSource V2 delimited scan: schema-on-read, parse-level column
  * pruning, filter pushdown, quote-aware parsing, and REJECT accounting as
  * a first-class SQL metric.
  */
class DelimitedV2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("qty", DoubleType),
    StructField("ts", TimestampType)))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dsv2").toString
    val rows = Seq(
      "1,alpha,2.5,2024-01-01 00:00:00",
      "2,\"be,ta\",7.0,2024-01-02 12:30:00",        // quoted embedded sep
      "3,\"say \"\"hi\"\"\",1.0,2024-01-03 00:00:00", // escaped quote
      "4,delta,not_a_number,2024-01-04 00:00:00",   // bad double -> reject
      "5,echo,9.5",                                 // wrong arity -> reject
      "6,,3.25,2024-01-06 06:00:00")                // empty name -> null
    Files.write(java.nio.file.Paths.get(dir0(d)), rows.mkString("\n").getBytes)
    d
  }
  private def dir0(d: String) = s"$d/part-0.csv"

  private def readV2 =
    spark.read.format("graft-delimited").schema(schema).load(dir)

  test("reads good rows, rejects malformed ones, honors quotes") {
    val rows = readV2.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 6L))
    assert(rows(1).getString(1) === "be,ta")
    assert(rows(2).getString(1) === "say \"hi\"")
    assert(rows(3).isNullAt(1), "empty field must read as null")
    assert(rows(1).getTimestamp(3).toString === "2024-01-02 12:30:00.0")
  }

  test("rejected rows surface as the scan's rejectedRows SQL metric") {
    val df = readV2
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.metrics.contains("rejectedRows"),
      s"custom metric missing: ${scan.metrics.keys}")
    assert(scan.metrics("rejectedRows").value === 2L) // bad double + arity
  }

  test("column pruning reaches the scan output") {
    val df = readV2.select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.output.map(_.name) === Seq("name"),
      "scan must emit only the projected column")
    // parse-level pruning is VISIBLE here: row 4's malformed double is in
    // an unprojected column, so it is never converted and the row survives
    // (the same projection-dependent reject semantics as Spark's own CSV
    // columnPruning); the wrong-arity row still rejects at any projection
    assert(df.collect().length === 5)
    assert(readV2.collect().length === 4,
      "full projection must still reject the malformed double")
  }

  test("comparison filters push into the reader and stay correct") {
    val df = readV2.filter(col("qty") > 2.0 && col("name").isNotNull)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.scan.description().contains("GreaterThan(qty,2.0)"),
      s"filter must report as pushed: ${scan.scan.description()}")
    // row 3 fails qty>2, row 6's empty name fails IsNotNull inside the reader
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L))
  }

  test("V2 write -> V2 read round-trips cell for cell, overwrite replaces") {
    val out = Files.createTempDirectory("graft_dsv2_w").toString
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, "plain", 2.5,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      org.apache.spark.sql.Row(2L, "with,comma \"q\"", 7.25,
        java.sql.Timestamp.valueOf("2024-01-02 12:30:00")),
      org.apache.spark.sql.Row(3L, null, null,
        java.sql.Timestamp.valueOf("2024-01-03 01:02:03"))), schema)
    df.repartition(2).write.format("graft-delimited").mode("append").save(out)
    val back = spark.read.format("graft-delimited").schema(schema).load(out)
      .orderBy("id")
    assert(back.collect().toSeq === df.orderBy("id").collect().toSeq)
    // overwrite drops the previous generation atomically at commit
    val df2 = df.filter(col("id") === 1L)
    df2.write.format("graft-delimited").mode("overwrite").save(out)
    val after = spark.read.format("graft-delimited").schema(schema).load(out)
    assert(after.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("streaming write lands epoch files readable through the V2 scan") {
    val src = Files.createTempDirectory("graft_dsv2_src").toString
    val out = Files.createTempDirectory("graft_dsv2_sink").toString
    val ckpt = Files.createTempDirectory("graft_dsv2_ckpt").toString
    graft.Tables.events(spark, sfDir)
      .select(col("event_id").cast("long").as("id"),
        col("event_type").as("name"),
        col("value").cast("double").as("qty"), col("ts"))
      .limit(500).coalesce(1).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    val q = stream.writeStream.format("graft-delimited")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.format("graft-delimited").schema(schema).load(out)
    assert(back.count() === 500)
    // deterministic epoch-partition names, no in-progress leftovers
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // Hadoop local-FS .crc shadows
    assert(files.nonEmpty &&
      files.forall(_.matches("part-e\\d{5}-\\d{5}\\.csv")), files.toSeq)
  }

  test("agrees with the CSV path on a well-formed file, cell for cell") {
    // on MALFORMED rows the two paths differ by design: Spark CSV pads a
    // short row with nulls, while this source rejects it (PolyBase arity
    // semantics) — so equivalence is asserted on clean data
    val clean = Files.createTempDirectory("graft_dsv2_clean").toString
    Files.write(java.nio.file.Paths.get(s"$clean/part-0.csv"),
      Seq("1,alpha,2.5,2024-01-01 00:00:00",
        "2,\"be,ta\",7.0,2024-01-02 12:30:00",
        "6,,3.25,2024-01-06 06:00:00").mkString("\n").getBytes)
    val viaV2 = spark.read.format("graft-delimited").schema(schema)
      .load(clean).orderBy("id").collect()
    val viaCsv = ExternalTable(clean, schema).readRaw(spark)
      .drop("_graft_corrupt").orderBy("id").collect()
    assert(viaV2.toSeq === viaCsv.toSeq)
  }
}
