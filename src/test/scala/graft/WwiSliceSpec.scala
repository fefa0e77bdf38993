package graft

import graft.catalog.{Distribution, Layout, MonthPartition, TablePolicy}
import graft.maintenance.MemoryGrant
import graft.sources.Ctas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference-shaped end-to-end slice (SURVEY.md §7.2): a WWI-style star —
  * SCD-2 dimension with bracketed-style names (spaces in identifiers,
  * reference: samples/databases/wide-world-importers/tables/dimension.city.sql)
  * and a hash-distributed, month-partitioned fact (fact.sale.sql:27-48) —
  * derived from the driver testdata, loaded through CTAS policies, queried
  * with the whitepaper's rank-over-aggregate (whitepaper.md:188-197).
  */
class WwiSliceSpec extends SparkSpec {

  private val endOfTime = lit("9999-12-31 23:59:59").cast("timestamp")

  test("WWI-shaped star: SCD-2 dim + distributed fact + rank query") {
    // Dimension: city-like from nation ⨯ region, with SCD-2 validity and a
    // second (historical) version for some rows.
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val current = n.join(r, col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey").as("City Key"),
        col("n_name").as("City"),
        col("r_name").as("Sales Territory"),
        lit("2000-01-01 00:00:00").cast("timestamp").as("Valid From"),
        endOfTime.as("Valid To"),
        lit(1).as("Lineage Key"))
    val historical = current
      .withColumn("Valid From", lit("1990-01-01 00:00:00").cast("timestamp"))
      .withColumn("Valid To", lit("2000-01-01 00:00:00").cast("timestamp"))
      .withColumn("City", concat(col("City"), lit(" (old)")))
    Ctas.create(spark, current.unionAll(historical), "dim_city",
      TablePolicy(Distribution.Replicate, Layout.Clustered(Seq("City Key"))))

    // Fact: sale-like from lineitem ⋈ orders ⋈ customer, hash-distributed on
    // the business key, month-partitioned on the invoice date.
    val sale = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(
        col("l_orderkey").as("WWI Invoice ID"),
        col("c_nationkey").as("City Key"),
        col("o_orderdate").as("Invoice Date Key"),
        col("l_quantity").cast("decimal(18,3)").as("Quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,2)").as("Total Excluding Tax"))
    Ctas.create(spark, sale, "fact_sale",
      TablePolicy(Distribution.Hash("WWI Invoice ID", 8),
        partition = Some(MonthPartition("Invoice Date Key"))))

    // SCD-2 current-row filter + the whitepaper rank query.
    val dim = spark.table("dim_city").filter(col("`Valid To`") === endOfTime)
    val ranked = spark.table("fact_sale")
      .join(dim, Seq("City Key"))
      .groupBy(col("`Sales Territory`"), col("City"))
      .agg(sum(col("`Total Excluding Tax`")).cast("decimal(18,2)").as("sales"))
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("`Sales Territory`")).orderBy(col("sales").desc)))
    val rows = ranked.collect()
    assert(rows.nonEmpty)
    // exactly one rank-1 city per territory; no historical rows leaked
    val top = rows.filter(_.getAs[Int]("rnk") == 1)
    assert(top.map(_.getAs[String]("Sales Territory")).distinct.length === top.length)
    assert(rows.forall(!_.getAs[String]("City").endsWith("(old)")))
    // totals reconcile with the source (dimension join loses no fact rows)
    val factTotal = spark.table("fact_sale")
      .agg(sum(col("`Total Excluding Tax`"))).collect()(0).getDecimal(0)
    val rankedTotal = ranked.agg(sum(col("sales"))).collect()(0).getDecimal(0)
    assert(factTotal.compareTo(rankedTotal) === 0)
  }

  test("memory-grant estimator reproduces the reference constants") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType),
      StructField("s_short", StringType), StructField("s_long", StringType)))
    val est = MemoryGrant.estimateBytes(schema, Map("s_short" -> 10))
    val expected = 75497472L + 4 * 8L * 1048576 +
      32L * 1048576 + 16L * 1048576
    assert(est === expected)
    val rep = MemoryGrant.report(spark, Seq("dim_city")).collect()(0)
    assert(rep.getAs[Long]("estimated_grant_bytes") > MemoryGrant.BaseOverheadBytes)
  }
}
