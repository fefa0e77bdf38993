package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Memory-grant estimator (SURVEY.md §4; reference:
  * samples/sqlops/MonitoringScripts/MemoryGrant.sql:70-122): the reference
  * engine sizes a query's memory grant from the target table's shape with
  * documented constants —
  *
  *   75,497,472 bytes base overhead
  *   + 8 MiB per column
  *   + 32 MiB per short-string column (declared length ≤ 32 chars)
  *   + 16 MiB per long-string column
  *
  * Spark's unified memory manager makes the grant advisory rather than
  * enforced (SURVEY.md §4 maps enforcement to the scheduler), so this module
  * reproduces the *reporting* contract: the same estimate the monitoring
  * toolkit shows operators, for capacity planning and WLM slot sizing.
  */
object MemoryGrant {

  val BaseOverheadBytes = 75497472L
  val PerColumnBytes = 8L * 1024 * 1024
  val ShortStringBytes = 32L * 1024 * 1024
  val LongStringBytes = 16L * 1024 * 1024
  val ShortStringMaxLen = 32

  /** Estimate for a schema; `declaredLengths` carries the DDL string lengths
    * (Spark's StringType is unbounded — columns absent from the map count as
    * long strings, the conservative branch of the reference formula).
    */
  def estimateBytes(schema: StructType,
      declaredLengths: Map[String, Int] = Map.empty): Long = {
    val base = BaseOverheadBytes + schema.fields.length * PerColumnBytes
    schema.fields.foldLeft(base) { (acc, f) =>
      f.dataType match {
        case StringType =>
          val short = declaredLengths.get(f.name).exists(_ <= ShortStringMaxLen)
          acc + (if (short) ShortStringBytes else LongStringBytes)
        case _ => acc
      }
    }
  }

  /** Per-table grant report ≈ the MemoryGrant.sql result set. */
  def report(spark: SparkSession, tables: Seq[String],
      declaredLengths: Map[String, Map[String, Int]] = Map.empty): DataFrame = {
    import spark.implicits._
    tables.map { t =>
      val schema = spark.table(t).schema
      val bytes = estimateBytes(schema, declaredLengths.getOrElse(t, Map.empty))
      (t, schema.fields.length,
        schema.fields.count(_.dataType == StringType),
        bytes, bytes / 1048576.0)
    }.toDF("table_name", "n_columns", "n_string_columns",
      "estimated_grant_bytes", "estimated_grant_mib")
  }
}
