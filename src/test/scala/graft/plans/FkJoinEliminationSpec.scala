package graft.plans

import graft.SparkSpec
import graft.catalog.Constraints
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** FK-declared redundant-join elimination: the rewrite fires exactly when
  * it is provable (declared+validated FK, non-null key, untouched parent)
  * and the eliminated plan returns identical results.
  */
class FkJoinEliminationSpec extends SparkSpec {

  private def setup(): Unit = {
    if (!spark.catalog.tableExists("fk_li")) {
      graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .write.saveAsTable("fk_li")
      graft.Tables.orders(spark, sfDir).write.saveAsTable("fk_ord")
      assert(Constraints.declareFk(spark, "fk_li", "l_orderkey",
        "fk_ord", "o_orderkey"))
    }
  }

  private def joins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    p.collect { case j: Join => j }

  test("validated declaration lands; orphaned child fails validation") {
    setup()
    // a child with a key outside the parent must NOT validate
    graft.Tables.orders(spark, sfDir)
      .withColumn("o_custkey",
        when(col("o_orderkey") % 97 === 0, lit(99999999L))
          .otherwise(col("o_custkey")))
      .write.mode("overwrite").saveAsTable("fk_bad_child")
    graft.Tables.customer(spark, sfDir).write
      .mode("overwrite").saveAsTable("fk_cust")
    assert(!Constraints.declareFk(spark, "fk_bad_child", "o_custkey",
      "fk_cust", "c_custkey"))
  }

  test("join to an untouched declared parent is eliminated, results equal") {
    setup()
    val q = spark.table("fk_li")
      .join(spark.table("fk_ord"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val before = q.queryExecution.optimizedPlan
    assert(joins(before).nonEmpty, "sanity: the join exists pre-rule")
    val after = FkJoinEliminationRule(before)
    assert(joins(after).isEmpty, s"join must be eliminated:\n$after")
    // the rewrite is semantics-preserving on the actual data
    val viaJoin = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = spark.table("fk_li").groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaJoin === direct)
  }

  test("rule keeps the join when it is not provably redundant") {
    setup()
    // 1. a parent column is referenced
    val usesParent = spark.table("fk_li")
      .join(spark.table("fk_ord"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
      .queryExecution.optimizedPlan
    assert(joins(FkJoinEliminationRule(usesParent)).nonEmpty)
    // 2. the parent side is filtered (could drop child rows)
    val filteredParent = spark.table("fk_li")
      .join(spark.table("fk_ord").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
      .queryExecution.optimizedPlan
    assert(joins(FkJoinEliminationRule(filteredParent)).nonEmpty)
    // 3. no declaration: the same join shape against an undeclared copy
    if (!spark.catalog.tableExists("fk_ord_undeclared"))
      graft.Tables.orders(spark, sfDir).write.saveAsTable("fk_ord_undeclared")
    val undeclared = spark.table("fk_li")
      .join(spark.table("fk_ord_undeclared"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
      .queryExecution.optimizedPlan
    assert(joins(FkJoinEliminationRule(undeclared)).nonEmpty)
  }

  test("extensions session eliminates the join end-to-end") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      if (!ext.catalog.tableExists("fk_li_ext")) {
        graft.Tables.lineitem(ext, sfDir)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .write.saveAsTable("fk_li_ext")
        graft.Tables.orders(ext, sfDir).write.saveAsTable("fk_ord_ext")
        assert(Constraints.declareFk(ext, "fk_li_ext", "l_orderkey",
          "fk_ord_ext", "o_orderkey"))
      }
      val physical = ext.table("fk_li_ext")
        .join(ext.table("fk_ord_ext"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("qty"))
        .queryExecution.executedPlan.toString
      assert(!physical.contains("Join"), s"no physical join expected:\n$physical")
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
  test("vw_foreign_keys lists the declaration in the reference catalog shape") {
    setup()
    val fks = Constraints.foreignKeys(spark)
    assert(fks.columns.toSeq === Seq("child_table", "fk_column",
      "parent_table", "parent_key", "not_null"))
    val row = fks.filter(col("child_table") === "fk_li").collect()
    assert(row.length === 1)
    assert(row(0).getString(1) === "l_orderkey")
    assert(row(0).getString(2) === "fk_ord")
    assert(row(0).getString(3) === "o_orderkey")
    assert(row(0).getBoolean(4))
    // registered through the monitoring surface like every other view
    new graft.observability.MonitoringViews(spark,
      new graft.observability.QueryJournal(spark)).registerConstraintViews()
    assert(spark.table("vw_foreign_keys")
      .filter(col("child_table") === "fk_li").count() === 1)
  }
  test("a two-dimension star view chain loses BOTH untouched joins") {
    setup()
    if (!spark.catalog.tableExists("fk_li2")) {
      graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .write.saveAsTable("fk_li2")
      graft.Tables.part(spark, sfDir).write.saveAsTable("fk_part")
      assert(Constraints.declareFk(spark, "fk_li2", "l_orderkey",
        "fk_ord", "o_orderkey"))
      assert(Constraints.declareFk(spark, "fk_li2", "l_partkey",
        "fk_part", "p_partkey"))
    }
    // the BI-view shape: the whole star joined, two fact columns selected
    val q = spark.table("fk_li2")
      .join(spark.table("fk_ord"), col("l_orderkey") === col("o_orderkey"))
      .join(spark.table("fk_part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    var plan = q.queryExecution.optimizedPlan
    // the injected rule runs once per optimizer visit; fixed-point it here
    var n = joins(plan).size
    var guard = 0
    while (guard < 5 && joins(FkJoinEliminationRule(plan)).size < n) {
      plan = FkJoinEliminationRule(plan); n = joins(plan).size; guard += 1
    }
    assert(joins(FkJoinEliminationRule(plan)).isEmpty,
      s"both dimension joins must go:\n${FkJoinEliminationRule(plan)}")
    val direct = spark.table("fk_li2").groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaJoins = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaJoins === direct)
  }
}
