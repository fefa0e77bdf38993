package graft.maintenance

import graft.functions.TSql
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Backup runs + status reporting (SURVEY.md §2.1 S10) — the engine analog
  * of `sys.pdw_loader_backup_runs` and the LatestBackup widget (reference:
  * samples/sqlops/MonitoringScripts/LatestBackup.sql:2-10). A "backup" here
  * is a consistent parquet snapshot of a catalog table into a target
  * directory; every run is journaled with the DMV's columns so the widget
  * SQL shape (TOP 1 ... ORDER BY run_id DESC, boundary-crossing DATEDIFF
  * seconds) runs unchanged.
  */
object Backup {
  final case class BackupRun(run_id: Long, operation_type: String,
      table_name: String, location: String, status: String, progress: Int,
      start_time: java.sql.Timestamp, end_time: java.sql.Timestamp)
}

final class Backup(spark: SparkSession) {
  import Backup.BackupRun

  private val runs = new ConcurrentLinkedQueue[BackupRun]()
  private val nextId = new AtomicLong(1L)

  /** Snapshot `table` to `targetDir` (overwrite = a full backup). */
  def backup(table: String, targetDir: String): Long = {
    val id = nextId.getAndIncrement()
    val start = new java.sql.Timestamp(System.currentTimeMillis())
    try {
      spark.table(table).write.mode("overwrite").parquet(targetDir)
      runs.add(BackupRun(id, "BACKUP", table, targetDir, "COMPLETED", 100,
        start, new java.sql.Timestamp(System.currentTimeMillis())))
      id
    } catch {
      case e: Throwable =>
        runs.add(BackupRun(id, "BACKUP", table, targetDir, "FAILED", 0,
          start, new java.sql.Timestamp(System.currentTimeMillis())))
        throw e
    }
  }

  /** Restore a snapshot into `table` (CTAS from the backup dir). */
  def restore(targetDir: String, table: String): Long = {
    val id = nextId.getAndIncrement()
    val start = new java.sql.Timestamp(System.currentTimeMillis())
    spark.read.parquet(targetDir).write.mode("overwrite").saveAsTable(table)
    runs.add(BackupRun(id, "RESTORE", table, targetDir, "COMPLETED", 100,
      start, new java.sql.Timestamp(System.currentTimeMillis())))
    id
  }

  /** ≈ sys.pdw_loader_backup_runs. */
  def backupRuns: DataFrame = {
    import spark.implicits._
    runs.asScala.toSeq.toDF()
  }

  /** The LatestBackup widget: TOP 1 by run_id desc with boundary-crossing
    * second difference (LatestBackup.sql:2-10).
    */
  def latestBackup: DataFrame =
    backupRuns
      .orderBy(col("run_id").desc).limit(1)
      .select(col("start_time"), col("end_time"),
        col("progress").as("progress_percent"),
        TSql.datediff("second", col("start_time"), col("end_time"))
          .as("duration_seconds"))
}
