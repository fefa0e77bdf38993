package graft.observability

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MonitoringViewsSpec extends SparkSpec {

  test("dashboard SQL runs against the registered reference-named views") {
    val j = new QueryJournal(spark).start()
    try {
      spark.sparkContext.setJobDescription("mv-test")
      Tables.orders(spark, sfDir).groupBy(col("o_orderstatus"))
        .agg(count(lit(1))).collect()
      spark.sparkContext.setJobDescription(null)

      val mv = new MonitoringViews(spark, j)
      mv.registerQueryViews()
      mv.registerStorageViews(Map("orders" -> s"$sfDir/orders.parquet"))

      val act = mv.activitySummary().collect()(0)
      assert(act.getAs[Long]("n_requests") >= 1)
      assert(act.getAs[Long]("n_failed") === 0)

      val sizes = spark.sql(
        "SELECT row_count FROM vw_table_sizes WHERE table_name = 'orders'")
        .collect()(0)
      assert(sizes.getLong(0) === 1500L)

      val steps = spark.sql(
        """SELECT COUNT(*) FROM vw_query_steps
          |WHERE request_label = 'mv-test'""".stripMargin).collect()(0)
      assert(steps.getLong(0) >= 1)

      assert(spark.sql("SELECT * FROM vw_rowgroup_details").count() >= 1)
      assert(spark.sql(
        "SELECT rebuild_recommended FROM vw_table_health").count() === 1)

      // value-level accounting for the query-journal views: three MORE
      // labeled actions must appear as exactly three more labeled journal
      // requests, all succeeded, and the activity summary must equal the
      // journal's own raw request count (view-over-journal consistency)
      val before = spark.sql(
        """SELECT COUNT(*) FROM vw_active_queries
          |WHERE label = 'mv-exact'""".stripMargin).collect()(0).getLong(0)
      spark.sparkContext.setJobDescription("mv-exact")
      (1 to 3).foreach(_ => Tables.orders(spark, sfDir).limit(5).collect())
      spark.sparkContext.setJobDescription(null)
      j.flush()
      mv.registerQueryViews() // refresh the snapshot views
      val after = spark.sql(
        """SELECT COUNT(*) FROM vw_active_queries
          |WHERE label = 'mv-exact'""".stripMargin).collect()(0).getLong(0)
      assert(after - before === 3L,
        s"labeled request accounting must be exact: $before -> $after")
      val failed = spark.sql(
        """SELECT COUNT(*) FROM vw_active_queries
          |WHERE label = 'mv-exact' AND status <> 'Completed'""".stripMargin)
        .collect()(0).getLong(0)
      assert(failed === 0L)
      val act2 = mv.activitySummary().collect()(0)
      val raw = spark.sql("SELECT COUNT(*) FROM vw_active_queries")
        .collect()(0).getLong(0)
      assert(act2.getAs[Long]("n_requests") === raw,
        "activity summary must equal the journal row count")
    } finally j.stop()
  }

  test("full toolkit: per-distribution requests, slots, space rollups, health") {
    val j = new QueryJournal(spark).start()
    val wlm = new Wlm(spark, totalSlots = 8)
    try {
      wlm.submit("toolkit-test", "mediumrc") {
        Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
          .agg(count(lit(1))).collect()
      }
      val mv = new MonitoringViews(spark, j, Some(wlm))
      mv.registerQueryViews()
      mv.registerStorageViews(Map(
        "orders" -> s"$sfDir/orders.parquet",
        "lineitem" -> s"$sfDir/lineitem.parquet"))

      // vw_sql_requests: per-task = per-distribution request map
      val sr = spark.sql(
        """SELECT step_index, distribution_id, row_count FROM vw_sql_requests
          |WHERE request_id = 'toolkit-test' AND status = 'Complete'""".stripMargin)
      assert(sr.count() >= 1)

      // vw_query_slots: reference column names, consistent totals
      val slots = spark.sql(
        """SELECT running_queries, running_queries_slots,
          |       queued_queries, queued_queries_slots FROM vw_query_slots""".stripMargin)
        .collect()(0)
      assert(slots.getInt(0) === 0 && slots.getInt(2) === 0) // all drained

      // space rollups: summary preserves total rows; by-type groups exist
      val summary = spark.sql(
        """SELECT table_name, table_row_count, distribution_policy_name
          |FROM vw_table_space_summary ORDER BY table_name""".stripMargin).collect()
      assert(summary.map(_.getString(0)).toSeq === Seq("lineitem", "orders"))
      // footer-derived row accounting must match the actual table contents
      val expected = Map(
        "lineitem" -> Tables.lineitem(spark, sfDir).count(),
        "orders" -> Tables.orders(spark, sfDir).count())
      summary.foreach(r =>
        assert(r.getLong(1) === expected(r.getString(0)), r.getString(0)))
      assert(spark.sql("SELECT * FROM vw_table_space_by_distribution").count() >= 1)
      assert(spark.sql(
        "SELECT * FROM vw_table_space_by_distribution_type").count() >= 1)
      assert(spark.sql("SELECT * FROM vw_table_space_by_index_type").count() >= 1)
      spark.sql("SELECT * FROM vw_tables_with_skew").collect() // runs

      // vw_statistics_age: reference shape after a createStatistics run
      Tables.nation(spark, sfDir).write.mode("overwrite")
        .saveAsTable("mv_nation_stats")
      graft.maintenance.Statistics.createStatistics(spark, "mv_nation_stats")
      mv.registerQueryViews() // refresh snapshot
      val ages = spark.sql(
        """SELECT table_name, stats_column_name, stats_last_updated_date
          |FROM vw_statistics_age WHERE table_name = 'mv_nation_stats'""".stripMargin)
      assert(ages.count() >= 1)

      // widgets
      val health = mv.tableHealthDetail(Map("orders" -> s"$sfDir/orders.parquet"))
        .collect()(0)
      assert(health.getAs[Long]("COMPRESSED_rowgroup_count") >= 1)
      // value-level golden: footer row accounting equals the table contents
      assert(health.getAs[Long]("row_count_total") === 1500L)
      assert(health.getAs[Long]("COMPRESSED_rowgroup_rows") === 1500L)
      assert(health.getAs[Long]("OPEN_rowgroup_count") === 0)
      assert(health.getAs[String]("Rebuild_Index_SQL")
        .contains("ALTER INDEX ALL ON default.orders REBUILD"))
      val thc = mv.tableHealthCount(Map("orders" -> s"$sfDir/orders.parquet"))
        .collect()(0)
      assert(thc.getAs[Long]("Poor_Quality_Segments") >= 0)
      assert(mv.memoryConsumption().count() >= 1)
      assert(mv.userActivitiesDetails().count() >= 1)
      assert(graft.catalog.StorageViews.skewDetail(spark,
        Tables.lineitem(spark, sfDir), "l_orderkey", 8).count() === 8)
    } finally j.stop()
  }

  test("security role model feeds vw_security_role_members (15/15 toolkit)") {
    val sec = new graft.catalog.Security(spark)
    sec.createRole("db_datareader")
    sec.createRole("etl_operators")
    sec.createUser("alice")
    sec.createUser("bob")
    sec.addRoleMember("db_datareader", "alice")
    sec.addRoleMember("db_datareader", "bob")
    // nested role membership, as sys.database_role_members allows
    sec.addRoleMember("etl_operators", "db_datareader")
    val j = new QueryJournal(spark)
    new MonitoringViews(spark, j).registerSecurityViews(sec)

    // golden column contract (microsoft.vw_security_role_members.sql:6-9)
    assert(spark.table("vw_security_role_members").schema.fieldNames.toSeq ===
      Seq("role_principal_name", "member_principal_name"))
    val rows = spark.sql(
      """SELECT role_principal_name, member_principal_name
        |FROM vw_security_role_members ORDER BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(
      ("db_datareader", "alice"), ("db_datareader", "bob"),
      ("etl_operators", "db_datareader")))

    // only roles appear on the role side; membership is revocable; guards
    sec.dropRoleMember("db_datareader", "bob")
    assert(sec.securityRoleMembers
      .filter(col("member_principal_name") === "bob").count() === 0)
    intercept[IllegalArgumentException] { sec.addRoleMember("alice", "bob") }
    intercept[IllegalArgumentException] { sec.createUser("alice") }
    intercept[IllegalArgumentException] { sec.addRoleMember("nope", "alice") }
  }

  test("dynamic data masking honors transitive unmask roles per audience") {
    import spark.implicits._
    val sec = new graft.catalog.Security(spark)
    sec.createRole("pii_readers")
    sec.createRole("analysts")       // nested inside pii_readers
    sec.createUser("carol")          // analyst → transitively unmasked
    sec.createUser("mallory")        // no roles → masked
    sec.addRoleMember("pii_readers", "analysts")
    sec.addRoleMember("analysts", "carol")
    assert(sec.isMemberTransitive("pii_readers", "carol"))
    assert(!sec.isMemberTransitive("pii_readers", "mallory"))

    Seq((1L, "ada@math.org", "Ada Lovelace", 1234.56),
        (2L, "bob@eng.io", "Bo", -7.25))
      .toDF("id", "email", "name", "balance")
      .createOrReplaceTempView("pii_src")
    val masks = Map("email" -> "email", "name" -> "partial:1:1",
      "balance" -> "default")

    graft.catalog.Masking.createMaskedView(spark, sec, "pii_src", masks,
      "v_pii_carol", Set("pii_readers"), "carol")
    graft.catalog.Masking.createMaskedView(spark, sec, "pii_src", masks,
      "v_pii_mallory", Set("pii_readers"), "mallory")

    val clear = spark.table("v_pii_carol").orderBy("id").collect()
    assert(clear(0).getString(1) === "ada@math.org")
    assert(clear(0).getDouble(3) === 1234.56)

    val m = spark.table("v_pii_mallory").orderBy("id").collect()
    assert(m(0).getString(1) === "axxx@xxxx.com")
    assert(m(0).getString(2) === "Axxxxe")         // partial:1:1
    assert(m(1).getString(2) === "xxxx")           // too short → full mask
    assert(m(0).getDouble(3) === 0.0)
    // unmasked columns pass through untouched
    assert(m(0).getLong(0) === 1L)
  }

  test("row-level security filters per audience and pushes to the scan") {
    val sec = new graft.catalog.Security(spark)
    sec.createRole("rls_bypass")
    sec.createUser("admin")
    sec.createUser("regional")
    sec.addRoleMember("rls_bypass", "admin")
    graft.Tables.customer(spark, sfDir).createOrReplaceTempView("rls_src")
    val pred = Seq(col("c_nationkey") < 5)
    graft.catalog.Rls.createFilteredView(spark, sec, "rls_src", pred,
      "v_cust_admin", Set("rls_bypass"), "admin")
    graft.catalog.Rls.createFilteredView(spark, sec, "rls_src", pred,
      "v_cust_regional", Set("rls_bypass"), "regional")
    val all = graft.Tables.customer(spark, sfDir).count()
    val scoped = graft.Tables.customer(spark, sfDir)
      .filter(col("c_nationkey") < 5).count()
    assert(spark.table("v_cust_admin").count() === all)
    assert(spark.table("v_cust_regional").count() === scoped)
    assert(scoped < all, "the predicate must actually scope rows")
    // the RLS predicate reaches the parquet scan as a pushed filter
    val plan = spark.table("v_cust_regional")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(c_nationkey,5)"), plan)
    // consumer predicates compose on top of the policy
    assert(spark.table("v_cust_regional")
      .filter(col("c_nationkey") === 20).count() === 0)
  }

  test("tempdb, rowgroups and impacted-tables widgets (sqlops set complete)") {
    val j = new QueryJournal(spark).start()
    try {
      // force a shuffle so executor scratch (shuffle files) is non-zero
      Tables.lineitem(spark, sfDir).repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1))).collect()
      val mv = new MonitoringViews(spark, j)

      // TempdbConsumption.sql reference shape: exactly the two columns
      val tempdb = mv.tempdbConsumption()
      assert(tempdb.schema.fieldNames.toSeq ===
        Seq("pdw_node_id", "Tempdb_Space_Allocated_KB"))
      val kb = tempdb.agg(sum(col("Tempdb_Space_Allocated_KB"))).collect()(0)
      assert(kb.getLong(0) > 0, "shuffle writes must count as scratch")
      assert(j.spillDetail.count() >= 1)

      // Rowgroups.sql widget: A,B,C cross join; single-rowgroup test files
      // are all trailing-batch (BULKLOAD) trims, dictionary is structural 0
      val tabs = Map("orders" -> s"$sfDir/orders.parquet",
        "lineitem" -> s"$sfDir/lineitem.parquet")
      val rg = mv.rowgroups(tabs).collect()(0)
      assert(rg.schema.fieldNames.toSeq ===
        Seq("Memory_Limitation", "Bulkload", "Dictionary_Size"))
      assert(rg.getAs[Long]("Bulkload") >= 2)
      assert(rg.getAs[Long]("Dictionary_Size") === 0)
      val details = graft.catalog.StorageViews.rowgroupDetails(spark, tabs)
      assert(details.filter(col("state_desc") =!= "COMPRESSED").count() === 0)

      // ImpactedTables: an unanalyzed table ("missing stats") must surface
      // once it clears the row gate; after ANALYZE it reports clean
      Tables.lineitem(spark, sfDir).write.mode("overwrite")
        .saveAsTable("impact_t")
      val loc = spark.sql("DESCRIBE TABLE EXTENDED impact_t")
        .filter(col("col_name") === "Location").collect()(0).getString(1)
      val impacted = mv.impactedTables(Map("impact_t" -> loc), minRows = 100)
      val row = impacted.collect()
      assert(row.length === 1 && row(0).getAs[String]("stat_info") === "missing stats")
      assert(row(0).getAs[Long]("cmp_row_count") === 60175L ||
        row(0).getAs[Long]("cmp_row_count") > 100)
      spark.sql("ANALYZE TABLE impact_t COMPUTE STATISTICS")
      val after = mv.impactedTables(Map("impact_t" -> loc), minRows = 100)
      assert(after.filter(col("stat_info").isNotNull).count() === 0)
    } finally j.stop()
  }

  test("value-level goldens: space and skew accounting equal the physical data") {
    val j = new QueryJournal(spark)
    val mv = new MonitoringViews(spark, j)
    val tabs = Map("orders" -> s"$sfDir/orders.parquet",
      "lineitem" -> s"$sfDir/lineitem.parquet")
    mv.registerStorageViews(tabs)
    val actualRows = Map(
      "orders" -> Tables.orders(spark, sfDir).count(),
      "lineitem" -> Tables.lineitem(spark, sfDir).count())

    // rowgroup accounting: per-table rowgroup rows sum to the table's
    // actual contents, and compressed bytes never exceed the on-disk file
    val rg = graft.catalog.StorageViews.rowgroupDetails(spark, tabs)
    rg.groupBy(col("table_name")).agg(sum(col("row_count")).as("rows"))
      .collect().foreach(r =>
        assert(r.getLong(1) === actualRows(r.getString(0)), r.getString(0)))
    tabs.foreach { case (t, loc) =>
      val fileBytes = java.nio.file.Files.size(java.nio.file.Paths.get(loc))
      val comp = rg.filter(col("table_name") === t)
        .agg(sum(col("compressed_bytes"))).collect()(0).getLong(0)
      assert(comp <= fileBytes && comp > 0, s"$t: $comp vs $fileBytes")
    }

    // view-over-view consistency: the per-table summary equals the sum of
    // its per-distribution detail rows in vw_table_sizes (same invariant
    // the reference's summary-over-sizes SQL relies on)
    val detail = spark.sql(
      """SELECT table_name, SUM(row_count) AS rows,
        |  SUM(reserved_space_GB) AS res_gb
        |FROM vw_table_sizes GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    spark.sql(
      """SELECT table_name, table_row_count, table_reserved_space_GB
        |FROM vw_table_space_summary""".stripMargin)
      .collect().foreach { r =>
        val (rows, gb) = detail(r.getString(0))
        assert(r.getLong(1) === rows)
        assert(math.abs(r.getDouble(2) - gb) < 1e-9)
      }

    // skew detail: bucket rows sum to the table total, percentages to 100,
    // every bucket id within [0, buckets)
    val sk = graft.catalog.StorageViews.skewDetail(spark,
      Tables.lineitem(spark, sfDir), "l_orderkey", 8).collect()
    assert(sk.map(_.getAs[Long]("row_count")).sum === actualRows("lineitem"))
    assert(math.abs(sk.map(_.getAs[Double]("pct_of_total")).sum - 100.0) < 1e-6)
    assert(sk.forall { r =>
      val id = r.getAs[Int]("distribution_id"); id >= 0 && id < 8
    })
    // deviations average out to zero across distributions by construction
    assert(math.abs(sk.map(_.getAs[Double]("pct_deviation_from_avg")).sum) < 1e-6)
  }

  test("golden column contracts: reference view shapes never drift") {
    val j = new QueryJournal(spark).start()
    try {
      val mv = new MonitoringViews(spark, j, Some(new Wlm(spark, 4)))
      mv.registerQueryViews()
      mv.registerStorageViews(Map("orders" -> s"$sfDir/orders.parquet"))
      def cols(view: String): Seq[String] =
        spark.table(view).schema.fieldNames.toSeq
      // microsoft.vw_sql_requests.sql:60-79
      assert(cols("vw_sql_requests") === Seq("request_id", "step_index",
        "pdw_node_id", "distribution_id", "status", "error_id", "start_time",
        "end_time", "total_elapsed_time", "row_count", "spid", "command"))
      // microsoft.vw_query_slots.sql:30-33
      assert(cols("vw_query_slots") === Seq("running_queries",
        "running_queries_slots", "queued_queries", "queued_queries_slots"))
      // microsoft.vw_query_queue.sql:15-23 (resource-wait shape + queued_sec)
      assert(cols("vw_query_queue") === Seq("request_id", "type", "state",
        "resource_class", "concurrency_slots_used", "queued_sec", "run_ms"))
      // microsoft.vw_table_space_summary.sql:49-71
      assert(cols("vw_table_space_summary") === Seq("database_name",
        "schema_name", "table_name", "distribution_policy_name",
        "distribution_column", "index_type_desc", "nbr_partitions",
        "table_row_count", "table_reserved_space_GB", "table_data_space_GB",
        "table_index_space_GB", "table_unused_space_GB"))
      // microsoft.vw_table_space_by_distribution.sql:5-15
      assert(cols("vw_table_space_by_distribution") === Seq("distribution_id",
        "total_node_distribution_row_count",
        "total_node_distribution_reserved_space_MB",
        "total_node_distribution_data_space_MB",
        "total_node_distribution_index_space_MB",
        "total_node_distribution_unused_space_MB"))
      // microsoft.vw_statistics_age.sql:4-22
      assert(cols("vw_statistics_age") === Seq("schema_name", "table_name",
        "stats_column_name", "stats_name", "stats_last_updated_date"))
      // vw_tables_with_skew is SELECT * over vw_table_sizes
      assert(cols("vw_tables_with_skew") === cols("vw_table_sizes"))
    } finally j.stop()
  }

  test("encryption-status widget mirrors the TDE monitor script") {
    import graft.maintenance.Ddl
    Ddl.createSchema(spark, "tde_on")
    Ddl.createSchema(spark, "tde_off")
    try {
      Ddl.setEncryption(spark, "tde_on", encrypted = true)
      val j = new QueryJournal(spark)
      val mv = new MonitoringViews(spark, j)
      val df = mv.encryptionStatus()
      // golden column contract (transparent_data_encryption_status.sql:1-9:
      // name + CASE is_encrypted 'TRUE'/'FALSE', ordered by name)
      assert(df.columns.toSeq === Seq("name", "Encrypted"))
      val rows = df.collect().map(r => r.getString(0) -> r.getString(1))
      assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted,
        "ordered by database name like the reference")
      val m = rows.toMap
      assert(m("tde_on") === "TRUE")
      assert(m("tde_off") === "FALSE", "unset posture reads FALSE " +
        "(reference default is_encrypted = 0)")
      // posture is mutable, like turning TDE off after an audit
      Ddl.setEncryption(spark, "tde_on", encrypted = false)
      assert(mv.encryptionStatus().collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
        .apply("tde_on") === "FALSE")
    } finally {
      Ddl.dropSchema(spark, "tde_on", cascade = true)
      Ddl.dropSchema(spark, "tde_off", cascade = true)
    }
  }

  test("vw_pipeline_runs surfaces the orchestrator journal") {
    import graft.maintenance.Orchestrator
    import graft.maintenance.Orchestrator.{Activity, Policy}
    val res = Orchestrator.run(spark, "monitored", Seq(
      Activity("ok", Set("raw"), Set("out"))(_ => ()),
      Activity("bad", Set("raw"), Set("x"), Policy(retry = 1))(
        _ => sys.error("down"))))
    val j = new QueryJournal(spark)
    try {
      new MonitoringViews(spark, j).registerPipelineViews(res)
      val df = spark.table("vw_pipeline_runs")
      assert(df.columns.toSet === Set("pipeline", "activity", "attempt",
        "status", "start_ms", "duration_ms", "error"))
      import org.apache.spark.sql.functions.col
      assert(df.filter(col("activity") === "bad").count() === 2,
        "one row per attempt")
      assert(df.filter(col("status") === "Succeeded").count() === 1)
    } finally j.stop()
  }
}
