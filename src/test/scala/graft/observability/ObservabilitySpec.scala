package graft.observability

import graft.{SparkSpec, Tables}
import graft.catalog.StorageViews
import graft.maintenance.{Compaction, Ddl, Statistics}
import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpec {

  test("query journal records labelled requests and shuffle steps") {
    val j = new QueryJournal(spark).start()
    try {
      spark.sparkContext.setJobDescription("journal-test-agg")
      Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity"))).collect()
      spark.sparkContext.setJobDescription(null)
      val reqs = j.requests.filter(col("label") === "journal-test-agg")
      assert(reqs.count() >= 1)
      assert(reqs.filter(col("status") === "Completed").count() >= 1)
      val steps = j.steps
      assert(steps.count() >= 1)
      val dms = j.stepDetails.filter(col("request_label") === "journal-test-agg")
      assert(dms.agg(sum(col("shuffle_write_bytes"))).collect()(0).getLong(0) > 0,
        "aggregation should journal shuffle movement")
    } finally j.stop()
  }

  test("storage views read parquet footers: sizes, rowgroups, health") {
    val tables = Map(
      "lineitem" -> s"$sfDir/lineitem.parquet",
      "orders" -> s"$sfDir/orders.parquet")
    val sizes = StorageViews.tableSizes(spark, tables).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sizes("lineitem") === 6000L)
    assert(sizes("orders") === 1500L)
    val rg = StorageViews.rowgroupDetails(spark, tables)
    assert(rg.count() >= 2)
    val health = StorageViews.rowgroupHealth(spark, tables)
      .filter(col("table_name") === "lineitem").collect()(0)
    assert(health.getAs[Boolean]("rebuild_recommended") === true) // tiny files
  }

  test("skew report flags a constant distribution key and passes a good one") {
    val li = Tables.lineitem(spark, sfDir)
    val good = StorageViews.tableSkew(spark, li, "l_orderkey", 8).collect()(0)
    assert(good.getAs[Boolean]("skewed") === false)
    val skewed = StorageViews.tableSkew(spark, li.withColumn("k", lit(1)), "k", 8)
      .collect()(0)
    assert(skewed.getAs[Long]("n_distributions") === 1L)
  }

  test("WLM queues beyond slot capacity and journals waits") {
    val wlm = new Wlm(spark, totalSlots = 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (1 to 3).map { i =>
      scala.concurrent.Future {
        wlm.submit(s"wlm-$i", "mediumrc") { // 4 slots each => serialized
          Thread.sleep(50); i
        }
      }
    }
    import scala.concurrent.duration._
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 30.seconds)
    pool.shutdown()
    assert(results.sum === 6)
    val j = wlm.queueJournal.collect()
    assert(j.length === 3)
    assert(j.count(_.getAs[Long]("queue_ms") >= 40) >= 2,
      "later submissions must have queued behind the 4-slot gate")
    assert(wlm.availableSlots === 4)
  }

  test("workload classifiers route by weighted specificity, not rule order") {
    val wlm = new Wlm(spark, totalSlots = 32)
    wlm.createClassifier(Wlm.Classifier("etl_member", "largerc",
      memberName = Some("etl_svc")))
    wlm.createClassifier(Wlm.Classifier("nightly_label", "mediumrc",
      label = Some("nightly-load")))
    wlm.createClassifier(Wlm.Classifier("etl_nightly", "xlargerc",
      memberName = Some("etl_svc"), label = Some("nightly-load")))

    // member+label (80) beats member-only (64) beats label-only (16)
    assert(wlm.classify("etl_svc", Some("nightly-load")) === "xlargerc")
    assert(wlm.classify("etl_svc", Some("adhoc")) === "largerc")
    assert(wlm.classify("analyst", Some("nightly-load")) === "mediumrc")
    // no classifier matches -> unclassified default
    assert(wlm.classify("analyst", Some("adhoc")) === "smallrc")

    // equal specificity resolves by importance, never rule-creation order
    wlm.createClassifier(Wlm.Classifier("analysts_a", "mediumrc",
      memberName = Some("analyst2"), importance = 1))
    wlm.createClassifier(Wlm.Classifier("analysts_b", "largerc",
      memberName = Some("analyst2"), importance = 5))
    assert(wlm.classify("analyst2") === "largerc")

    // classified submission journals the routed class
    wlm.submitAs("etl_svc", "nightly-load") { 42 }
    val row = wlm.queueJournal
      .filter(org.apache.spark.sql.functions.col("label") === "nightly-load")
      .collect()(0)
    assert(row.getAs[String]("resource_class") === "xlargerc")

    // guards: unknown group, parameterless rule, duplicate name
    intercept[IllegalArgumentException] {
      wlm.createClassifier(Wlm.Classifier("bad", "nope",
        memberName = Some("x")))
    }
    intercept[IllegalArgumentException] {
      wlm.createClassifier(Wlm.Classifier("bad2", "smallrc"))
    }
    intercept[IllegalArgumentException] {
      wlm.createClassifier(Wlm.Classifier("etl_member", "smallrc",
        memberName = Some("y")))
    }
    // catalog view shape
    assert(wlm.classifiersView.columns.toSeq === Seq("classifier_name",
      "workload_group", "member_name", "wlm_label", "importance"))
    wlm.dropClassifier("etl_nightly")
    assert(wlm.classify("etl_svc", Some("nightly-load")) === "largerc")

    // an oversized class is rejected at submission, never deadlocked on
    val tiny = new Wlm(spark, totalSlots = 8)
    intercept[IllegalArgumentException] {
      tiny.submit("too-big", "xlargerc") { 1 }
    }
  }

  test("statistics maintenance analyzes untracked columns and journals age") {
    Tables.nation(spark, sfDir).write.mode("overwrite").saveAsTable("nation_stats")
    val before = Statistics.unanalyzedColumns(spark, "nation_stats")
    assert(before.nonEmpty)
    val stmts = Statistics.createStatistics(spark, "nation_stats")
    assert(stmts.exists(_.startsWith("ANALYZE TABLE nation_stats")))
    assert(Statistics.unanalyzedColumns(spark, "nation_stats").isEmpty)
    assert(Statistics.createStatistics(spark, "nation_stats").isEmpty) // idempotent
    val age = Statistics.statisticsAge(spark)
      .filter(col("table_name") === "nation_stats").collect()(0)
    assert(age.getAs[Boolean]("stale") === false)
    intercept[IllegalArgumentException](Statistics.Sample(0))
  }

  test("compaction rebuild resizes files and preserves data") {
    Tables.orders(spark, sfDir).repartition(17)
      .write.mode("overwrite").saveAsTable("orders_frag")
    val before = spark.table("orders_frag").count()
    val nFiles = Compaction.rebuild(spark, "orders_frag")
    assert(nFiles === 1) // 1500 rows << rowgroup target
    assert(spark.table("orders_frag").count() === before)
  }

  test("DDL reverse-engineering emits policy-bearing CREATE TABLE") {
    import graft.catalog.{Distribution, TablePolicy}
    graft.sources.Ctas.create(spark, Tables.region(spark, sfDir), "region_ddl",
      TablePolicy(Distribution.Hash("r_regionkey", 4)))
    val ddl = Ddl.createTableStatement(spark, "region_ddl")
    assert(ddl.contains("CREATE TABLE `region_ddl`"))
    assert(ddl.contains("`r_name` STRING"))
    assert(ddl.contains("DISTRIBUTION = hash(r_regionkey,4)"))
    val alters = Ddl.addColumnChanges(spark, "region_ddl",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r_regionkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("new_col",
          org.apache.spark.sql.types.StringType))))
    assert(alters === Seq("ALTER TABLE `region_ddl` ADD COLUMNS (`new_col` STRING)"))
  }

  test("backup runs journal and the LatestBackup widget shape (S10)") {
    import graft.maintenance.Backup
    val b = new Backup(spark)
    Tables.region(spark, sfDir).write.mode("overwrite").saveAsTable("bk_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_bk").toString
    val id1 = b.backup("bk_src", dir)
    spark.sql("DROP TABLE bk_src")
    b.restore(dir, "bk_src")
    assert(spark.table("bk_src").count() === 5)
    val latest = b.latestBackup.collect()(0)
    assert(latest.schema.fieldNames === Array("start_time", "end_time",
      "progress_percent", "duration_seconds"))
    assert(latest.getAs[Int]("progress_percent") === 100)
    assert(b.backupRuns.filter(col("operation_type") === "BACKUP")
      .filter(col("run_id") === id1).count() === 1)
  }

  test("view DDL reverse-engineering recovers the definition (D11)") {
    spark.sql("DROP VIEW IF EXISTS ddl_view")
    spark.sql(
      "CREATE VIEW ddl_view AS SELECT r_regionkey, r_name FROM parquet.`" +
        s"$sfDir/region.parquet`")
    try {
      val ddl = Ddl.createViewStatement(spark, "ddl_view")
      assert(ddl.contains("CREATE VIEW"))
      assert(ddl.contains("r_regionkey"))
    } finally spark.sql("DROP VIEW ddl_view")
  }

  test("CTAS auto-stats: exact rowCount/size land in the catalog, no rescan") {
    import graft.catalog.{Distribution, TablePolicy}
    graft.sources.Ctas.create(spark, Tables.orders(spark, sfDir), "stats_t",
      TablePolicy(Distribution.Hash("o_orderkey", 4)))
    val stats = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("stats_t")).stats
    assert(stats.isDefined, "CTAS must leave catalog statistics behind")
    assert(stats.get.rowCount === Some(BigInt(1500)))
    assert(stats.get.sizeInBytes > 0)
    spark.sql("DROP TABLE stats_t")
  }

  test("TRUNCATE empties but keeps the table; DROP is idempotent (S6/S7)") {
    import graft.catalog.{Distribution, TablePolicy}
    graft.sources.Ctas.create(spark, Tables.region(spark, sfDir), "trunc_t",
      TablePolicy(Distribution.Hash("r_regionkey", 4)))
    assert(spark.table("trunc_t").count() === 5)
    Ddl.truncateTable(spark, "trunc_t")
    // rows gone, catalog entry + schema + policy metadata survive
    assert(spark.table("trunc_t").count() === 0)
    assert(spark.table("trunc_t").schema.fieldNames.contains("r_name"))
    assert(TablePolicy.of(spark, "trunc_t").distribution ===
      Distribution.Hash("r_regionkey", 4))
    Ddl.dropTable(spark, "trunc_t")
    assert(!spark.catalog.tableExists("trunc_t"))
    Ddl.dropTable(spark, "trunc_t") // IF EXISTS: second drop is a no-op
    intercept[Exception] {
      Ddl.dropTable(spark, "trunc_t", ifExists = false)
    }
  }

  test("CREATE SCHEMA namespaces hold policy-bearing tables (D1)") {
    import graft.catalog.{Distribution, TablePolicy}
    Ddl.createSchema(spark, "dimension")
    graft.sources.Ctas.create(spark, Tables.nation(spark, sfDir),
      "dimension.nation_t", TablePolicy(Distribution.Replicate))
    assert(spark.table("dimension.nation_t").count() === 25)
    assert(TablePolicy.of(spark, "dimension.nation_t").distribution ===
      Distribution.Replicate)
    assert(spark.catalog.listTables("dimension").collect()
      .exists(_.name === "nation_t"))
    Ddl.dropSchema(spark, "dimension", cascade = true)
    assert(!spark.catalog.databaseExists("dimension"))
  }
}
