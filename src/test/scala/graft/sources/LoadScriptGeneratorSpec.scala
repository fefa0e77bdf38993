package graft.sources

import graft.SparkSpec
import graft.catalog.{Distribution, TablePolicy}
import graft.sources.LoadScriptGenerator.SourceTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The GenerateLoadScript loop end-to-end: two source tables with different
  * policies load through external scan → cast/clean → CTAS, and the emitted
  * DDL matches the reference's script shapes.
  */
class LoadScriptGeneratorSpec extends SparkSpec {

  private def csvDir(lines: String*): String = {
    val dir = Files.createTempDirectory("graft_lsg")
    Files.write(dir.resolve("data.csv"), lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("catalog-driven loop loads every source table with its policy") {
    val custLoc = csvDir(
      "1,alice,100.50,2020-01-01 10:00:00",
      "2,null,200.25,1700-06-15 00:00:00", // null literal + pre-1753 date
      "3,carol,null,2021-03-04 05:06:07")
    val salesLoc = csvDir("1,10,99.99", "2,20,149.50", "3,10,12.00")

    val tables = Seq(
      SourceTable("customers", custLoc,
        StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("name", StringType),
          StructField("balance", DoubleType),
          StructField("created", TimestampType))),
        policy = TablePolicy(Distribution.Replicate)),
      SourceTable("sales", salesLoc,
        StructType(Seq(
          StructField("sale_id", LongType, nullable = false),
          StructField("cust_id", IntegerType),
          StructField("amount", DoubleType))),
        policy = TablePolicy(Distribution.Hash("cust_id", 4))))

    val reports = LoadScriptGenerator.loadAll(spark, tables)
    assert(reports.map(_.rows) === Seq(3L, 3L))

    // typed results with V2 clean semantics applied
    val cust = spark.table("dw_customers").orderBy("id").collect()
    assert(cust(1).isNullAt(1)) // "null" literal -> NULL
    assert(cust(1).getTimestamp(3).toString.startsWith("1753-01-01")) // floored
    assert(cust(2).isNullAt(2))
    assert(spark.table("dw_customers").schema("created").dataType === TimestampType)

    // policies landed in the catalog
    assert(graft.catalog.TablePolicy.of(spark, "dw_customers").distribution ===
      Distribution.Replicate)
    assert(graft.catalog.TablePolicy.of(spark, "dw_sales").distribution ===
      Distribution.Hash("cust_id", 4))

    // emitted script text mirrors the reference shapes
    val ext = reports.head.externalDdl
    assert(ext.startsWith("CREATE EXTERNAL TABLE [ASB].[customers] ("))
    assert(ext.contains("[id] int NOT NULL"))
    assert(ext.contains("REJECT_TYPE = VALUE, REJECT_VALUE = 0"))
    val ctas = reports(1).ctasSql
    assert(ctas.contains("DISTRIBUTION = HASH([cust_id])"))
    assert(ctas.contains("LABEL = 'CTAS : Load [dw].[sales]'"))

    // the loop's label is journaled on the load (D12 tracing contract)
    assert(reports.forall(_.elapsedMs >= 0))
  }

  test("V3 container-subfolders loop derives per-table LOCATIONs from one source") {
    // container/<schema>/<table>/ layout — the V3 precondition
    val container = Files.createTempDirectory("graft_lsg_v3")
    val stage = container.resolve("STAGE")
    Files.createDirectories(stage.resolve("customers"))
    Files.createDirectories(stage.resolve("sales"))
    Files.write(stage.resolve("customers/part-0.csv"),
      "1,alice\n2,null\n3,carol".getBytes("UTF-8"))
    Files.write(stage.resolve("sales/part-0.csv"),
      "1,99.99\n2,149.50".getBytes("UTF-8"))

    val tables = Seq(
      SourceTable("customers", location = "",
        StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("name", StringType)))),
      SourceTable("sales", location = "",
        StructType(Seq(
          StructField("sale_id", LongType, nullable = false),
          StructField("amount", DoubleType))),
        policy = TablePolicy(Distribution.Hash("sale_id", 4))))

    val run = LoadScriptGenerator.loadAllSubfolders(
      spark, container.toString, "STAGE", tables, targetSchema = "v3")

    // loads executed from the DERIVED subfolder locations
    assert(run.reports.map(_.rows) === Seq(3L, 2L))
    assert(spark.table("v3_customers").orderBy("id").collect()(1).isNullAt(1))
    assert(spark.table("v3_sales").schema("amount").dataType === DoubleType)

    // ONE data source rooted at the container, declared once for the run
    assert(run.dataSourceDdl ===
      s"CREATE EXTERNAL DATA SOURCE AzureStorage2 WITH (TYPE = HADOOP, " +
        s"LOCATION = '$container', CREDENTIAL = AzureStorageCredential);")

    // per-table DDL carries the subfolder LOCATION template, not a path
    val ext = run.reports.map(_.externalDdl)
    assert(ext.head.contains("LOCATION='/STAGE/customers/'"))
    assert(ext(1).contains("LOCATION='/STAGE/sales/'"))
    assert(ext.forall(_.contains("DATA_SOURCE = AzureStorage2")))

    // V3's per-iteration cleanup is echoed
    assert(run.dropDdls === Seq("DROP EXTERNAL TABLE [ASB].[customers]",
      "DROP EXTERNAL TABLE [ASB].[sales]"))
  }
}
