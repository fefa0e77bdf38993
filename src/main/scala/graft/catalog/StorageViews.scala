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

  /** Distribution-skew report ≈ vw_tables_with_skew: bucket rows by the hash
    * of the distribution column (the same hash layout Ctas writes) and flag
    * min/max ratio ≤ 0.10.
    */
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
