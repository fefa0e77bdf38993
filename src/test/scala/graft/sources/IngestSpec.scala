package graft.sources

import graft.SparkSpec
import graft.catalog.{Distribution, Layout, MonthPartition, TablePolicy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** External-table scan + reject semantics + cast/clean pipeline + CTAS with
  * distribution policy (SURVEY.md §2.1 S1/S3/S8, §3.2).
  */
class IngestSpec extends SparkSpec {

  test("erasure removes exactly the matched docs and audits them per source") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_erase").toString
    val before = graft.Tables.documents(spark, sfDir)
    val srcToErase = before.select(col("source")).distinct()
      .orderBy(col("source")).limit(1).collect()(0).getString(0)
    val idToErase = before.filter(col("source") =!= srcToErase)
      .agg(min(col("doc_id"))).collect()(0).getLong(0)
    val report = graft.sources.Erasure.eraseDocuments(spark, sfDir, out,
        bySource = Seq(srcToErase), byDocId = Seq(idToErase))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("docs_removed"), r.getAs[Long]("chars_removed"))).toMap
    val after = spark.read.parquet(s"$out/documents.parquet")
    // removed set = the source + the single id, nothing else
    assert(after.filter(col("source") === srcToErase).count() === 0)
    assert(after.filter(col("doc_id") === idToErase).count() === 0)
    val expectRemoved = before.filter(
      col("source") === srcToErase || col("doc_id") === idToErase).count()
    assert(before.count() - after.count() === expectRemoved)
    assert(report.values.map(_._1).sum === expectRemoved)
    // audit chars reconcile with the erased rows' actual text
    val charsBySrc = before.filter(
        col("source") === srcToErase || col("doc_id") === idToErase)
      .groupBy(col("source")).agg(sum(length(col("text")).cast("long")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    charsBySrc.foreach { case (src, chars) =>
      assert(report(src)._2 === chars, src)
    }
    // the ids-frame regime removes the same rows with a broadcast join
    val out2 = java.nio.file.Files.createTempDirectory("graft_erase2").toString
    val report2 = graft.sources.Erasure.eraseDocuments(spark, sfDir, out2,
      bySource = Seq(srcToErase),
      idsDf = Some(Seq(idToErase).toDF("doc_id")))
    assert(report2.agg(sum(col("docs_removed"))).collect()(0).getLong(0)
      === expectRemoved)
    assert(spark.read.parquet(s"$out2/documents.parquet").count()
      === after.count())
  }

  private def tmpCsv(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_csv")
    Files.write(dir.resolve("part-000.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("external scan reads delimited text with custom terminator") {
    val loc = tmpCsv("1|alice|10.5", "2|bob|20.25")
    val et = ExternalTable(loc, schema, ExternalFileFormat(fieldTerminator = "|"))
    val df = et.read(spark)
    assert(df.count() === 2)
    assert(df.filter(col("name") === "alice").collect()(0).getDouble(2) === 10.5)
  }

  test("REJECT_VALUE=0 fails the load on the first bad row") {
    val loc = tmpCsv("1,alice,10.5", "not_an_int,bob,oops,extra", "3,carol,1.0")
    val et = ExternalTable(loc, schema)
    val e = intercept[RejectThresholdExceeded](et.read(spark).count())
    assert(e.rejected === 1)
  }

  test("a breached read() leaves no staged parquet behind; load() keeps the caller's dir") {
    def stageDirs(): Set[String] = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      tmp.listFiles().filter(_.getName.startsWith("graft_ext_stage"))
        .map(_.getName).toSet
    }
    val loc = tmpCsv("1,alice,10.5", "bad,row,x,y")
    val et = ExternalTable(loc, schema)
    val before = stageDirs()
    intercept[RejectThresholdExceeded](et.read(spark))
    assert(stageDirs() === before, "generated staging dir must be deleted on breach")
    // caller-owned dir via load(): the library must NOT delete it
    val mine = java.nio.file.Files.createTempDirectory("graft_caller_stage")
    intercept[RejectThresholdExceeded](et.load(spark, mine.toString))
    assert(java.nio.file.Files.exists(mine), "caller-provided dir is caller-owned")
  }

  test("reject accounting reads the text input exactly once") {
    // single-pass design (Observation + staging write): journaled input
    // bytes over the load must stay ~csv-size + staged-parquet-size; the old
    // cache+double-count formulation read the text twice
    val rows = (1 to 5000).map(i => s"$i,name_$i,${i % 97}.25")
    val loc = tmpCsv(rows: _*)
    val csvBytes = java.nio.file.Files.walk(java.nio.file.Paths.get(loc))
      .filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    val j = new graft.observability.QueryJournal(spark).start()
    try {
      val df = ExternalTable(loc, schema, reject = RejectType.Value(0)).read(spark)
      df.count() // consume the staged result
      val read = j.steps.agg(sum(col("input_bytes"))).collect()(0).getLong(0)
      assert(read < 2 * csvBytes,
        s"load read $read bytes for a $csvBytes-byte input — double scan?")
      assert(read > 0)
    } finally j.stop()
  }

  test("REJECT_VALUE=N tolerates up to N bad rows and filters them out") {
    val loc = tmpCsv("1,alice,10.5", "x,bob,oops,extra", "3,carol,1.0")
    val et = ExternalTable(loc, schema, reject = RejectType.Value(1))
    val df = et.read(spark)
    assert(df.count() === 2)
  }

  test("REJECT_TYPE=PERCENTAGE thresholds on the bad-row fraction") {
    val loc = tmpCsv("1,alice,10.5", "x,bob,oops,extra", "3,carol,1.0", "4,dan,2.0")
    assert(ExternalTable(loc, schema,
      reject = RejectType.Percentage(30.0)).read(spark).count() === 3)
    intercept[RejectThresholdExceeded] {
      ExternalTable(loc, schema,
        reject = RejectType.Percentage(10.0)).read(spark).count()
    }
  }

  test("cast/clean pipeline: null literal, date floor, NOT NULL default") {
    import spark.implicits._
    val raw = Seq(
      ("1", "null", "1700-01-01 00:00:00"),
      ("2", "real", "2020-06-15 12:00:00")).toDF("id", "note", "created")
    val target = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("note", StringType, nullable = true),
      StructField("created", TimestampType, nullable = true)))
    val out = CastClean(raw, target).orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(0).getTimestamp(2).toString === "1753-01-01 00:00:00.0")
    assert(out(1).getString(1) === "real")
    assert(out(1).getTimestamp(2).toString === "2020-06-15 12:00:00.0")
  }

  test("CTAS with HASH distribution produces a bucketed, collocated table") {
    val li = graft.Tables.lineitem(spark, sfDir).limit(1000)
    Ctas.create(spark, li, "li_bucketed",
      TablePolicy(Distribution.Hash("l_orderkey", 4)), label = Some("test load"))
    val t = spark.table("li_bucketed")
    assert(t.count() === 1000)
    val props = spark.sql("SHOW TBLPROPERTIES li_bucketed").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props(TablePolicy.PropDistribution) === "hash(l_orderkey,4)")
    // collocated self-join on the bucket key must not shuffle
    val joined = spark.table("li_bucketed").as("a")
      .join(spark.table("li_bucketed").as("b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }

  test("CTAS REPLICATE marks the table for auto-broadcast") {
    val n = graft.Tables.nation(spark, sfDir)
    Ctas.create(spark, n, "nation_rep", TablePolicy(Distribution.Replicate))
    val props = spark.sql("SHOW TBLPROPERTIES nation_rep").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props(TablePolicy.PropDistribution) === "replicate")
  }

  test("CETAS export round-trips through the external scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cetas").toString
    val src = graft.Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val fmt = ExternalFileFormat(fieldTerminator = "|")
    val written = ExternalTable.export(src, s"$dir/out", fmt, writers = 3)
    assert(written === src.count())
    // the writer fan-out is the DMS-writer analog: one csv part per writer
    val parts = new java.io.File(s"$dir/out").listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(parts === 3)
    val back = ExternalTable(s"$dir/out", src.schema, fmt).read(spark)
    assert(back.count() === src.count())
    assert(src.exceptAll(back).count() === 0)
  }

  test("CETAS export with a header row reports the true data row count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cetas_hdr").toString
    val src = graft.Tables.region(spark, sfDir)
    val fmt = ExternalFileFormat(firstRowHeader = true)
    // the verification read-back must skip the per-part header lines
    val written = ExternalTable.export(src, s"$dir/out", fmt, writers = 2)
    assert(written === src.count())
    val back = ExternalTable(s"$dir/out", src.schema, fmt).read(spark)
    assert(back.count() === src.count())
  }

  test("PARQUET and ORC external formats round-trip without a staging pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft_colfmt").toString
    val src = graft.Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    for (ft <- Seq(FormatType.Parquet, FormatType.Orc)) {
      val fmt = ExternalFileFormat(formatType = ft)
      val loc = s"$dir/${ft.toString.toLowerCase}"
      val written = ExternalTable.export(src, loc, fmt, writers = 2)
      assert(written === src.count())
      val back = ExternalTable(loc, src.schema, fmt).read(spark)
      assert(back.schema === src.schema)
      assert(src.exceptAll(back).count() === 0)
      // no graft staging dir is created for columnar scans: the plan reads
      // the external location directly
      assert(back.queryExecution.executedPlan.toString.contains(loc))
    }
    // reject accounting is a text-only concept, enforced loudly
    intercept[IllegalArgumentException] {
      ExternalTable(s"$dir/parquet", src.schema,
        ExternalFileFormat(formatType = FormatType.Parquet)).readRaw(spark)
    }
  }

  test("CTAS month partitioning prunes by partition directory") {
    val o = graft.Tables.orders(spark, sfDir)
    Ctas.create(spark, o, "orders_bymonth",
      TablePolicy(partition = Some(MonthPartition("o_orderdate"))))
    val pruned = spark.table("orders_bymonth")
      .filter(col(Ctas.MonthKeyCol) === "1995-03")
    val expected = o.filter(date_format(col("o_orderdate"), "yyyy-MM") === "1995-03")
    assert(pruned.count() === expected.count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("retention sweep drops exactly the expired rows per policy") {
    import graft.sources.Erasure.RetentionPolicy
    val out = java.nio.file.Files.createTempDirectory("graft_retention").toString
    val events = graft.Tables.events(spark, sfDir)
    val asOf = events.agg(max(expr("unix_millis(ts)"))).collect()(0).getLong(0)
    val policies = Seq(RetentionPolicy("view", 10), RetentionPolicy("click", 20))
    val audit = graft.sources.Erasure
      .retentionSweep(spark, sfDir, out, policies, asOf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_dropped"))).toMap
    val after = spark.read.parquet(s"$out/events.parquet")
    // every surviving governed row is inside its window; others untouched
    policies.foreach { p =>
      val cutoff = asOf - p.maxAgeDays * 86400000L
      assert(after.filter(col("event_type") === p.eventType &&
        expr("unix_millis(ts)") < cutoff).count() === 0, p.eventType)
      val expectDrop = events.filter(col("event_type") === p.eventType &&
        expr("unix_millis(ts)") < cutoff).count()
      assert(audit(p.eventType)._2 === expectDrop, p.eventType)
    }
    val ungoverned = audit.filterNot(kv => policies.exists(_.eventType == kv._1))
    assert(ungoverned.values.forall(_._2 == 0L), "no policy, no deletion")
    assert(events.count() - after.count() === audit.values.map(_._2).sum)
  }
}
