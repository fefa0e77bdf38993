package graft.maintenance

import graft.SparkSpec

/** Round-trip of the diff-deployment loop (reference: AddSPChanges.sql:5-40 +
  * GenerateScripts.ps1:40-60): export a namespace's view scripts, mutate a
  * view, sync, and the definitions come back byte-identical.
  */
class DeploymentSpec extends SparkSpec {

  test("schema-compat gate classifies every evolution class correctly") {
    import org.apache.spark.sql.types._
    val before = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("qty", IntegerType, nullable = true),
      StructField("price", FloatType, nullable = true),
      StructField("note", StringType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("strict", StringType, nullable = true)))
    val after = StructType(Seq(
      StructField("id", LongType, nullable = true),      // relaxed: ok
      StructField("qty", LongType, nullable = true),     // widened: ok
      StructField("price", IntegerType, nullable = true), // narrowed: break
      StructField("added_ok", StringType, nullable = true),
      StructField("added_bad", LongType, nullable = false),
      StructField("flag", BooleanType, nullable = true),
      StructField("strict", StringType, nullable = false))) // tightened
    val changes = graft.maintenance.SchemaCompat.diff(before, after)
      .map(c => (c.column, c.change) -> c.compatibility).toMap
    assert(changes(("id", "made_nullable")) === "compatible")
    assert(changes(("qty", "type_changed")) === "compatible")
    assert(changes(("price", "type_changed")) === "breaking")
    assert(changes(("added_ok", "added")) === "compatible")
    assert(changes(("added_bad", "added")) === "breaking")
    assert(changes(("note", "dropped")) === "breaking")
    assert(changes(("strict", "made_required")) === "breaking")
    assert(!changes.contains(("flag", "type_changed")), "unchanged is silent")
    assert(!graft.maintenance.SchemaCompat.isDeployable(before, after))
    // a purely additive nullable evolution passes the gate
    val safe = StructType(before.fields :+
      StructField("extra", StringType, nullable = true))
    assert(graft.maintenance.SchemaCompat.isDeployable(before, safe))
    // and the report surfaces as a queryable frame
    val rep = graft.maintenance.SchemaCompat.report(spark, before, after)
    assert(rep.filter(
      org.apache.spark.sql.functions.col("compatibility") === "breaking")
      .count() === 4)
  }

  test("view diff-deploy: mutate then sync restores the exported definition") {
    spark.sql("CREATE DATABASE IF NOT EXISTS dep_src")
    spark.sql(
      s"""CREATE OR REPLACE VIEW dep_src.v_regions AS
         |SELECT r_regionkey, r_name FROM parquet.`$sfDir/region.parquet`""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE VIEW dep_src.v_nations AS
         |SELECT n_nationkey FROM parquet.`$sfDir/nation.parquet`""".stripMargin)
    try {
      val baseline = Deployment.exportViewScripts(spark, "dep_src")
      assert(baseline.keySet === Set("v_regions", "v_nations"))

      // in sync: the loop is a no-op
      assert(Deployment.deployViewChanges(spark, "dep_src", baseline).isEmpty)

      // mutate one view + drop the other; sync must repair both
      spark.sql(
        s"""CREATE OR REPLACE VIEW dep_src.v_regions AS
           |SELECT r_regionkey FROM parquet.`$sfDir/region.parquet`""".stripMargin)
      spark.sql("DROP VIEW dep_src.v_nations")
      val executed = Deployment.deployViewChanges(spark, "dep_src", baseline)
      assert(executed.count(_.startsWith("DROP VIEW IF EXISTS")) === 2)
      assert(Deployment.exportViewScripts(spark, "dep_src") === baseline)
      assert(spark.table("dep_src.v_regions").schema.fieldNames.toSeq ===
        Seq("r_regionkey", "r_name"))
    } finally spark.sql("DROP DATABASE IF EXISTS dep_src CASCADE")
  }

  test("module diff-deploy: sys.sql_modules-style procedural catalog") {
    val cat = new Deployment.ModuleCatalog
    cat.createOrAlter("usp_refresh", "ANALYZE TABLE t COMPUTE STATISTICS")
    val baseline = cat.names.map(n => n -> cat.definition(n).get).toMap

    assert(Deployment.deployModuleChanges(cat, baseline).isEmpty)
    cat.createOrAlter("usp_refresh", "SELECT 1") // drift
    cat.drop("usp_other") // no-op
    assert(Deployment.deployModuleChanges(cat, baseline) === Seq("usp_refresh"))
    assert(cat.definition("usp_refresh")
      .contains("ANALYZE TABLE t COMPUTE STATISTICS"))
  }
}
