package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Storage-introspection views over parquet layouts — the engine's analog of
  * the reference's space/health monitoring toolkit:
  *
  *  - `tableSizes`      ≈ microsoft.vw_table_sizes / vw_table_space_summary
  *    (reference: solutions/monitoring/scripts/views/microsoft.vw_table_sizes.sql:73-129)
  *  - `rowgroupDetails` ≈ RowgroupDetails.sql — parquet row groups are the
  *    columnstore-rowgroup analog (samples/sqlops/MonitoringScripts/RowgroupDetails.sql:1-23)
  *  - `rowgroupHealth`  ≈ TableHealthCount's poor-segment alarm: avg rows per
  *    rowgroup < 100,000 ⇒ rebuild recommended (TableHealthCount.sql:71-72;
  *    the 1,048,576-row target at :15)
  *  - `tableSkew`       ≈ microsoft.vw_tables_with_skew — min/max
  *    per-distribution row ratio ≤ 0.10 flagged (vw_tables_with_skew.sql:19)
  *
  * Footer reads stay off the query path (driver-side metadata pass only).
  */
object StorageViews {

  val RowgroupTarget = 1048576L
  val PoorSegmentThreshold = 100000L
  val SkewAlarmRatio = 0.10

  private def parquetFiles(spark: SparkSession, location: String): Seq[Path] = {
    val p = new Path(location)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath
      }
      buf.result()
    }
  }

  final case class RowgroupRow(table_name: String, file_name: String,
      rowgroup_id: Int, row_count: Long, compressed_bytes: Long,
      total_bytes: Long)

  /** Per-rowgroup detail from parquet footers. */
  def rowgroupDetails(spark: SparkSession,
      tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val rows = for {
      (table, location) <- tables.toSeq
      path <- parquetFiles(spark, location)
      (block, idx) <- {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
        try r.getFooter.getBlocks.asScala.toSeq.zipWithIndex
        finally r.close()
      }
    } yield RowgroupRow(table, path.getName, idx, block.getRowCount,
      block.getCompressedSize, block.getTotalByteSize)
    rows.toDF()
  }

  /** Space summary per table ≈ vw_table_sizes. */
  def tableSizes(spark: SparkSession, tables: Map[String, String]): DataFrame =
    rowgroupDetails(spark, tables)
      .groupBy(col("table_name"))
      .agg(
        countDistinct(col("file_name")).as("n_files"),
        count(lit(1)).as("n_rowgroups"),
        sum(col("row_count")).as("row_count"),
        sum(col("compressed_bytes")).as("compressed_bytes"),
        sum(col("total_bytes")).as("uncompressed_bytes"))

  /** Rowgroup health ≈ TableHealthCount: flags tables whose average rowgroup
    * is below the poor-segment threshold.
    */
  def rowgroupHealth(spark: SparkSession, tables: Map[String, String]): DataFrame =
    tableSizes(spark, tables).select(
      col("table_name"), col("n_rowgroups"), col("row_count"),
      (col("row_count") / col("n_rowgroups")).cast("long").as("avg_rows_per_rowgroup"),
      ((col("row_count") / col("n_rowgroups")) < PoorSegmentThreshold)
        .as("rebuild_recommended"))

  final case class TableSizeRow(execution_time: java.sql.Timestamp,
      database_name: String, schema_name: String, table_name: String,
      two_part_name: String, distribution_policy_name: String,
      distribution_column: Option[String], index_type_desc: String,
      distribution_id: Int, pdw_node_id: Int, partition_nmbr: Int,
      row_count: Long,
      reserved_space_MB: Double, data_space_MB: Double,
      index_space_MB: Double, unused_space_MB: Double,
      reserved_space_GB: Double, data_space_GB: Double,
      index_space_GB: Double, unused_space_GB: Double)

  private val BucketFileRe = """_(\d{5})\.c\d+""".r.unanchored
  private val MonthDirRe = """graft_month=([^/]+)""".r.unanchored

  /** Reference-shaped `vw_table_sizes`: one row per table × distribution ×
    * partition, carrying the physical-policy metadata and space accounting
    * the reference view exposes (reference:
    * solutions/monitoring/scripts/views/microsoft.vw_table_sizes.sql:7-129) —
    * so the toolkit's view-over-view space SQL runs unchanged. Mapping:
    * a bucketed file's bucket id (else the file ordinal) is the
    * distribution_id; the graft_month directory ordinal is partition_nmbr;
    * parquet compressed bytes are data space, uncompressed-minus-compressed
    * is reported as unused (parquet has no separate index allocation).
    */
  def tableSizesRef(spark: SparkSession,
      tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val db = spark.catalog.currentDatabase
    val conf = spark.sessionState.newHadoopConf()
    val rows = tables.toSeq.flatMap { case (table, location) =>
      val policy =
        if (spark.catalog.tableExists(table)) TablePolicy.of(spark, table)
        else TablePolicy()
      val (policyName, distCol) = policy.distribution match {
        case Distribution.Hash(c, _) => ("HASH", Some(c))
        case Distribution.Replicate => ("REPLICATE", None)
        case Distribution.RoundRobin => ("ROUND_ROBIN", None)
      }
      val indexDesc = policy.layout match {
        case Layout.Columnstore => "CLUSTERED COLUMNSTORE"
        case Layout.Clustered(_) => "CLUSTERED"
        case Layout.Heap => "HEAP"
      }
      val files = parquetFiles(spark, location).sortBy(_.toString)
      val monthOf: Map[String, Int] = files
        .flatMap(p => MonthDirRe.findFirstMatchIn(p.toString).map(_.group(1)))
        .distinct.sorted.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap
      files.zipWithIndex.map { case (path, idx) =>
        val (rowsN, comp, total) = {
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
          try {
            val bs = r.getFooter.getBlocks.asScala
            (bs.map(_.getRowCount).sum, bs.map(_.getCompressedSize).sum,
              bs.map(_.getTotalByteSize).sum)
          } finally r.close()
        }
        val distId = path.getName match {
          case BucketFileRe(b) => b.toInt
          case _ => idx
        }
        val part = MonthDirRe.findFirstMatchIn(path.toString)
          .map(m => monthOf(m.group(1))).getOrElse(1)
        val mb = 1024.0 * 1024.0
        val gb = mb * 1024.0
        TableSizeRow(now, db, "default", table, s"[default].[$table]",
          policyName, distCol, indexDesc, distId, 0, part, rowsN,
          total / mb, comp / mb, 0.0, (total - comp) / mb,
          total / gb, comp / gb, 0.0, (total - comp) / gb)
      }
    }
    rows.toDF()
  }

  /** Distribution-skew report ≈ vw_tables_with_skew: bucket rows by the hash
    * of the distribution column (the same hash layout Ctas writes) and flag
    * min/max ratio ≤ 0.10.
    */
  /** Per-distribution detail ≈ the sqlops SkewDetection widget's final
    * per-distribution rollup (reference:
    * samples/sqlops/MonitoringScripts/SkewDetection.sql:103-131).
    */
  def skewDetail(spark: SparkSession, df: DataFrame, distColumn: String,
      buckets: Int = 60): DataFrame = {
    val per = df
      .groupBy(pmod(hash(col(distColumn)), lit(buckets)).as("distribution_id"))
      .agg(count(lit(1)).as("row_count"))
    val tot = per.agg(sum(col("row_count")).as("total_rows"),
      avg(col("row_count")).as("avg_rows"))
    per.crossJoin(broadcast(tot)).select(
      col("distribution_id"), col("row_count"), col("total_rows"),
      (col("row_count") * 100.0 / col("total_rows")).as("pct_of_total"),
      ((col("row_count") - col("avg_rows")) * 100.0 / col("avg_rows"))
        .as("pct_deviation_from_avg"))
  }

  def tableSkew(spark: SparkSession, df: DataFrame, distColumn: String,
      buckets: Int = 60): DataFrame = {
    val perBucket = df
      .groupBy(pmod(hash(col(distColumn)), lit(buckets)).as("distribution_id"))
      .agg(count(lit(1)).as("row_count"))
    perBucket.agg(
        min(col("row_count")).as("min_rows"),
        max(col("row_count")).as("max_rows"),
        sum(col("row_count")).as("total_rows"),
        count(lit(1)).as("n_distributions"))
      .select(col("*"),
        (col("min_rows").cast("double") / col("max_rows")).as("skew_ratio"),
        ((col("min_rows").cast("double") / col("max_rows")) <= SkewAlarmRatio)
          .as("skewed"))
  }
}
