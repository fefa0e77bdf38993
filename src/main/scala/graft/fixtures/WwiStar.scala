package graft.fixtures

import graft.Tables
import graft.catalog.{Distribution, Layout, MonthPartition, TablePolicy}
import graft.functions.DateDim
import graft.sources.Ctas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The full WideWorldImporters-DW star derived from the driver testdata —
  * the engine's canonical sample database (SURVEY.md §1.1; reference:
  * the .sql files under samples/databases/wide-world-importers/tables):
  * 8 dimensions +
  * 6 facts + the Seed.Sale grow table, each created through CTAS with the
  * reference's physical policy:
  *
  *  - dimensions: ROUND_ROBIN + CLUSTERED INDEX on their key
  *    (dimension.city.sql:19-23), SCD-2 validity columns + Lineage Key
  *  - facts: ROUND_ROBIN + CLUSTERED COLUMNSTORE (fact.order.sql)
  *  - Fact.Sale: HASH([WWI Invoice ID]) + CCI + monthly RANGE RIGHT
  *    partitioning on [Invoice Date Key] (fact.sale.sql:27-48)
  *  - Seed.Sale: HASH + CCI, unpartitioned (seed.sale.sql:25-38) — the
  *    staging copy the grow loop re-inserts with shifted dates
  *
  * Bracketed-with-spaces reference column names are kept verbatim.
  */
object WwiStar {

  val EndOfTime = "9999-12-31 23:59:59"

  private def eot = lit(EndOfTime).cast("timestamp")

  private def scd2(df: DataFrame): DataFrame = df
    .withColumn("Valid From", lit("2013-01-01 00:00:00").cast("timestamp"))
    .withColumn("Valid To", eot)
    .withColumn("Lineage Key", lit(1))

  /** Build every table of the star. Returns the table names created. */
  def build(spark: SparkSession, sfDir: String,
      saleBuckets: Int = 8): Seq[String] = {
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val supplier = Tables.supplier(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)

    def dimPolicy(key: String) =
      TablePolicy(Distribution.RoundRobin, Layout.Clustered(Seq(key)))
    val factPolicy = TablePolicy(Distribution.RoundRobin, Layout.Columnstore)

    // ---- dimensions -------------------------------------------------------
    Ctas.create(spark, scd2(
      nation.join(region, col("n_regionkey") === col("r_regionkey")).select(
        col("n_nationkey").cast("int").as("City Key"),
        col("n_name").as("City"),
        col("r_name").as("State Province"),
        col("r_name").as("Sales Territory"))),
      "wwi_dimension_city", dimPolicy("City Key"), Some("wwi build"))

    Ctas.create(spark, scd2(customer.select(
        col("c_custkey").cast("int").as("Customer Key"),
        col("c_name").as("Customer"),
        col("c_mktsegment").as("Category"),
        col("c_name").as("Bill To Customer"))),
      "wwi_dimension_customer", dimPolicy("Customer Key"), Some("wwi build"))

    Ctas.create(spark,
      DateDim.build(spark, "1992-01-01", "1998-12-31"),
      "wwi_dimension_date", dimPolicy("Date"), Some("wwi build"))

    // employees: synthesized salespeople (the testdata has no employee feed)
    Ctas.create(spark, scd2(spark.range(1, 21).select(
        col("id").cast("int").as("Employee Key"),
        concat(lit("Employee "), col("id")).as("Employee"),
        (col("id") % 2 === 0).as("Is Salesperson"))),
      "wwi_dimension_employee", dimPolicy("Employee Key"), Some("wwi build"))

    Ctas.create(spark, scd2(spark.createDataFrame(Seq(
        (1, "Cash"), (2, "Check"), (3, "Credit Card"), (4, "EFT"))).toDF(
        "Payment Method Key", "Payment Method")),
      "wwi_dimension_payment_method", dimPolicy("Payment Method Key"),
      Some("wwi build"))

    Ctas.create(spark, scd2(part.select(
        col("p_partkey").cast("int").as("Stock Item Key"),
        col("p_name").as("Stock Item"),
        col("p_brand").as("Brand"),
        col("p_size").cast("string").as("Size"))),
      "wwi_dimension_stock_item", dimPolicy("Stock Item Key"), Some("wwi build"))

    Ctas.create(spark, scd2(supplier.select(
        col("s_suppkey").cast("int").as("Supplier Key"),
        col("s_name").as("Supplier"),
        lit("Wholesaler").as("Category"))),
      "wwi_dimension_supplier", dimPolicy("Supplier Key"), Some("wwi build"))

    Ctas.create(spark, scd2(spark.createDataFrame(Seq(
        (1, "Customer Invoice"), (2, "Customer Credit Note"),
        (3, "Supplier Invoice"), (4, "Stock Adjustment"))).toDF(
        "Transaction Type Key", "Transaction Type")),
      "wwi_dimension_transaction_type", dimPolicy("Transaction Type Key"),
      Some("wwi build"))

    // ---- Fact.Sale: the flagship hash-distributed partitioned fact --------
    val sale = saleRows(lineitem, orders, customer, part)
    Ctas.create(spark, sale, "wwi_fact_sale",
      TablePolicy(Distribution.Hash("WWI Invoice ID", saleBuckets),
        Layout.Columnstore, Some(MonthPartition("Invoice Date Key"))),
      Some("wwi build fact_sale"))

    // Seed.Sale: unpartitioned staging copy for the grow loop
    Ctas.create(spark, sale.limit(2000), "wwi_seed_sale",
      TablePolicy(Distribution.Hash("WWI Invoice ID", saleBuckets)),
      Some("wwi build seed"))

    // ---- other facts ------------------------------------------------------
    Ctas.create(spark, orders.select(
        col("o_orderkey").as("Order Key"),
        col("o_custkey").cast("int").as("Customer Key"),
        col("o_orderdate").as("Order Date Key"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("Total Excluding Tax")),
      "wwi_fact_order", factPolicy, Some("wwi build"))

    Ctas.create(spark, lineitem.select(
        col("l_partkey").cast("int").as("Stock Item Key"),
        col("l_suppkey").cast("int").as("Supplier Key"),
        col("l_shipdate").as("Date Key"),
        col("l_quantity").cast("int").as("Quantity"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("Amount Excluding Tax")),
      "wwi_fact_purchase", factPolicy, Some("wwi build"))

    Ctas.create(spark, lineitem.select(
        col("l_shipdate").as("Date Key"),
        col("l_partkey").cast("int").as("Stock Item Key"),
        when(col("l_returnflag") === "R", -col("l_quantity"))
          .otherwise(col("l_quantity")).cast("int").as("Quantity")),
      "wwi_fact_movement", factPolicy, Some("wwi build"))

    Ctas.create(spark, orders.select(
        col("o_orderkey").as("Transaction Key"),
        col("o_orderdate").as("Date Key"),
        when(col("o_orderstatus") === "F", 1).otherwise(2)
          .as("Transaction Type Key"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("Total Including Tax")),
      "wwi_fact_transaction", factPolicy, Some("wwi build"))

    Ctas.create(spark, part.select(
        col("p_partkey").cast("int").as("Stock Item Key"),
        (col("p_partkey") % 1000).cast("int").as("Quantity On Hand"),
        (col("p_retailprice")).cast(DecimalType(18, 2)).as("Unit Cost")),
      "wwi_fact_stock_holding", factPolicy, Some("wwi build"))

    Seq("wwi_dimension_city", "wwi_dimension_customer", "wwi_dimension_date",
      "wwi_dimension_employee", "wwi_dimension_payment_method",
      "wwi_dimension_stock_item", "wwi_dimension_supplier",
      "wwi_dimension_transaction_type", "wwi_fact_sale", "wwi_seed_sale",
      "wwi_fact_order", "wwi_fact_purchase", "wwi_fact_movement",
      "wwi_fact_transaction", "wwi_fact_stock_holding")
  }

  /** The 21-column Fact.Sale shape (fact.sale.sql:1-24) derived from
    * lineitem ⋈ orders ⋈ customer ⋈ part.
    */
  private def saleRows(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, part: DataFrame): DataFrame = {
    val taxRate = lit(15.0).cast(DecimalType(18, 3))
    val excl = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 2))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(
        monotonically_increasing_id().as("Sale Key"),
        col("c_nationkey").cast("int").as("City Key"),
        col("c_custkey").cast("int").as("Customer Key"),
        col("c_custkey").cast("int").as("Bill To Customer Key"),
        col("l_partkey").cast("int").as("Stock Item Key"),
        col("o_orderdate").as("Invoice Date Key"),
        col("l_shipdate").as("Delivery Date Key"),
        (col("l_suppkey") % 20 + 1).cast("int").as("Salesperson Key"),
        col("l_orderkey").cast("int").as("WWI Invoice ID"),
        col("p_name").as("Description"),
        col("p_brand").as("Package"),
        col("l_quantity").cast("int").as("Quantity"),
        (col("l_extendedprice") / col("l_quantity"))
          .cast(DecimalType(18, 2)).as("Unit Price"),
        taxRate.as("Tax Rate"),
        excl.as("Total Excluding Tax"),
        (excl * 0.15).cast(DecimalType(18, 2)).as("Tax Amount"),
        (excl * 0.2).cast(DecimalType(18, 2)).as("Profit"),
        (excl * 1.15).cast(DecimalType(18, 2)).as("Total Including Tax"),
        when(col("p_size") > 25, 0).otherwise(col("l_quantity").cast("int"))
          .as("Total Dry Items"),
        when(col("p_size") > 25, col("l_quantity").cast("int")).otherwise(0)
          .as("Total Chiller Items"),
        lit(1).as("Lineage Key"))
  }

  /** The Seed.Sale grow loop: re-insert the seed slice `copies` times with
    * Invoice Date Key shifted forward one month per copy and fresh surrogate
    * keys — the reference's volume-growth pattern for exercising the
    * 132-boundary partition ladder (seed.sale.sql + fact.sale.sql:32-48).
    * Each insert appends new month partitions to the partitioned, bucketed
    * fact. Returns rows inserted.
    */
  def growSale(spark: SparkSession, copies: Int): Long = {
    val seed = spark.table("wwi_seed_sale")
    val maxKey = spark.table("wwi_fact_sale")
      .agg(max(col("`Sale Key`"))).collect()(0).getLong(0)
    var inserted = 0L
    (1 to copies).foreach { i =>
      val shifted = seed
        .withColumn("Invoice Date Key",
          add_months(col("`Invoice Date Key`"), i))
        .withColumn("Sale Key",
          lit(maxKey) + lit(i.toLong) * 10000000L +
            monotonically_increasing_id())
        .withColumn("graft_month",
          date_format(col("`Invoice Date Key`"), "yyyy-MM"))
      shifted.write.mode("append").insertInto("wwi_fact_sale")
      inserted += seed.count()
    }
    inserted
  }
}
