package graft.maintenance

import graft.SparkSpec

/** Round-trip of the diff-deployment loop (reference: AddSPChanges.sql:5-40 +
  * GenerateScripts.ps1:40-60): export a namespace's view scripts, mutate a
  * view, sync, and the definitions come back byte-identical.
  */
class DeploymentSpec extends SparkSpec {

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
