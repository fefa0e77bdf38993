package graft.sources

import graft.catalog.{Distribution, Layout, MonthPartition, TablePolicy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CTAS — the reference's canonical load-and-transform operator (SURVEY.md
  * §2.1 S3; reference: samples/scripts/data-load/CTASLoad-Example.sql:85-91):
  * a parallel materializing write honoring the table's physical policy, with
  * an OPTION(LABEL) analog via the Spark job description.
  *
  * Policy mapping (SURVEY.md §1.3):
  *  - HASH(col, n)   → repartition(n, col) + bucketBy(n, col) — collocated,
  *    shuffle-free equi-joins between tables bucketed on the same key, the
  *    Spark expression of the reference's distribution-aligned joins
  *    (whitepaper.md:42-43)
  *  - ROUND_ROBIN    → writer-default distribution
  *  - REPLICATE      → plain write + table property consumed by
  *    graft.plans.ReplicatedBroadcastRule
  *  - Clustered(cols)→ sortWithinPartitions(cols) for row-group min/max
  *    pruning (segment elimination analog)
  *  - MonthPartition → partitionBy on a derived floor-to-month key
  *    (RANGE RIGHT monthly boundaries, fact.sale.sql:32-48)
  */
object Ctas {

  val MonthKeyCol = "graft_month"

  def create(spark: SparkSession, df: DataFrame, table: String,
      policy: TablePolicy = TablePolicy(), label: Option[String] = None): Unit = {
    label.foreach(spark.sparkContext.setJobDescription)
    try {
      // 1. derive the month partition key
      val withMonth = policy.partition.fold(df)(p =>
        df.withColumn(MonthKeyCol, date_format(col(p.column), "yyyy-MM")))
      // 2. distribute, then sort within the final partitions (clustered-index
      //    row ordering survives only if applied after the redistribution)
      val distributed = policy.distribution match {
        case Distribution.Hash(c, n) => withMonth.repartition(n, col(c))
        case _ => withMonth
      }
      val ordered = policy.layout match {
        case Layout.Clustered(cols) =>
          distributed.sortWithinPartitions(cols.map(col): _*)
        case _ => distributed
      }
      // row count rides the write itself (Observation) — no second scan
      val obs = org.apache.spark.sql.Observation()
      val observed = ordered.observe(obs, count(lit(1)).as("rows"))
      // 3. writer: directory partitioning and/or bucketing
      var writer = observed.write.format("parquet").mode("overwrite")
      if (policy.partition.isDefined) writer = writer.partitionBy(MonthKeyCol)
      policy.distribution match {
        case Distribution.Hash(c, n) =>
          writer = writer.bucketBy(n, c)
          policy.layout match {
            case Layout.Clustered(cols) =>
              writer = writer.sortBy(cols.head, cols.tail: _*)
            case _ => ()
          }
        case _ => ()
      }
      writer.saveAsTable(table)
      val props = Seq(
        TablePolicy.PropDistribution -> policy.distribution.describe,
        TablePolicy.PropLayout -> policy.layout.describe) ++
        policy.partition.map(p => TablePolicy.PropPartition -> s"month(${p.column})")
      val propSql = props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES($propSql)")
      // Auto-stats hook (SURVEY.md §4): the reference engine auto-creates
      // statistics on materialized tables; here the exact row count was
      // observed during the write and size comes from the committed files,
      // stored through the same catalog channel ANALYZE uses — CBO join
      // reordering and the ImpactedTables control side see fresh stats with
      // ZERO post-write scans (an ANALYZE COMPUTE STATISTICS after a 100 TB
      // CTAS would read the table again).
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      val (size, _) = org.apache.spark.sql.execution.command.CommandUtils
        .calculateTotalSize(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], meta)
      spark.sessionState.catalog.alterTableStats(ident,
        Some(org.apache.spark.sql.catalyst.catalog.CatalogStatistics(
          size, Some(BigInt(obs.get("rows").asInstanceOf[Long])))))
    } finally {
      label.foreach(_ => spark.sparkContext.setJobDescription(null))
    }
  }

  /** INSERT INTO append (SURVEY.md §2.1 S5). */
  def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)
}
