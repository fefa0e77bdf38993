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
      total_bytes: Long, state_desc: String, trim_reason_desc: String)

  /** Per-rowgroup detail from parquet footers, with the columnstore rowgroup
    * lifecycle mapped onto parquet semantics (reference:
    * samples/sqlops/MonitoringScripts/RowgroupDetails.sql:1-23): every
    * parquet row group is COMPRESSED (no delta store), and a group below the
    * rowgroup target trimmed either because the writer hit its block-size
    * memory bound mid-file (MEMORY_LIMITATION) or because the load ran out
    * of rows at the end of the file (BULKLOAD — the trailing-batch trim).
    * DICTIONARY_SIZE has no parquet analog and is structurally absent.
    */
  def rowgroupDetails(spark: SparkSession,
      tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val rows = for {
      (table, location) <- tables.toSeq
      path <- parquetFiles(spark, location)
      (block, idx, n) <- {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
        try {
          val bs = r.getFooter.getBlocks.asScala.toSeq
          bs.zipWithIndex.map { case (b, i) => (b, i, bs.size) }
        } finally r.close()
      }
    } yield {
      val trim =
        if (block.getRowCount >= RowgroupTarget) "NO_TRIM"
        else if (idx == n - 1) "BULKLOAD"
        else "MEMORY_LIMITATION"
      RowgroupRow(table, path.getName, idx, block.getRowCount,
        block.getCompressedSize, block.getTotalByteSize, "COMPRESSED", trim)
    }
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

  /** ImpactedTables report (reference:
    * samples/sqlops/MonitoringScripts/ImpactedTables:1-58): flags tables
    * whose catalog statistics are missing or outdated relative to the actual
    * compute-side row counts, or whose per-distribution layout is skewed.
    * The control side is Spark's catalog statistics (ANALYZE output — our
    * stand-in for the control node's sys.partitions counts); the compute
    * side is the footer-derived per-distribution accounting of
    * [[tableSizesRef]]. Reference thresholds are the defaults; `minRows`
    * gates reporting to tables big enough to matter, exactly as the
    * reference's @minRows = 1,000,000 does.
    */
  def impactedTables(spark: SparkSession, tables: Map[String, String],
      minRows: Long = 1000000L, minSkewPercent: Double = 10.0,
      outdatedPercent: Double = 20.0): DataFrame = {
    import spark.implicits._
    val sizes = tableSizesRef(spark, tables)
    val perDist = sizes.groupBy(col("table_name"), col("schema_name"),
        col("distribution_policy_name"), col("index_type_desc"),
        col("distribution_id"))
      .agg(sum(col("row_count")).as("dist_rows"),
        countDistinct(col("partition_nmbr")).as("dist_partitions"))
    val cmp = perDist.groupBy(col("table_name"), col("schema_name"),
        col("distribution_policy_name"), col("index_type_desc"))
      .agg(sum(col("dist_rows")).as("cmp_row_count"),
        (max(col("dist_rows")) - min(col("dist_rows")))
          .as("highest_skew_rows_difference"),
        ((max(col("dist_rows")) - min(col("dist_rows"))) * 100.0 /
          nullif(sum(col("dist_rows")), lit(0L))).as("skew_percent"),
        max(col("dist_partitions")).as("partitions"))
    val ctl = tables.keys.toSeq.map { t =>
      val stats =
        if (spark.catalog.tableExists(t))
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t)).stats
        else None
      (t, stats.flatMap(_.rowCount).map(_.toLong))
    }.toDF("table_name", "ctl_row_count")
    val diffPct = org.apache.spark.sql.functions.abs(
      col("ctl_row_count") - col("cmp_row_count")) * 100.0 /
      nullif(col("cmp_row_count"), lit(0L))
    cmp.join(ctl, Seq("table_name"))
      .select(
        col("schema_name").as("sch_name"), col("table_name"),
        col("index_type_desc").as("table_type"),
        col("distribution_policy_name").as("distribution_type"),
        col("partitions"), col("ctl_row_count"), col("cmp_row_count"),
        diffPct.as("ctl_cmp_difference_percent"),
        col("highest_skew_rows_difference"), col("skew_percent"),
        when(col("ctl_row_count").isNull, "missing stats")
          .when(col("ctl_row_count") =!= col("cmp_row_count") &&
            diffPct > outdatedPercent, "outdated stats")
          .as("stat_info"),
        when(col("skew_percent") >= minSkewPercent, "data skew").as("skew_info"))
      .filter(col("cmp_row_count") > minRows &&
        (col("stat_info").isNotNull || col("skew_info").isNotNull))
      .orderBy(col("sch_name"), col("table_name"))
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
