package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-on-read external tables over delimited text — the engine's PolyBase
  * analog (SURVEY.md §2.1 S1).
  *
  * Mirrors the reference's external-object triple — DATA SOURCE + FILE FORMAT
  * + EXTERNAL TABLE (reference: samples/scripts/data-load/
  * CTASLoad-Example.sql:47-83) — as plain Scala config over the Spark CSV
  * source. Parallelism comes from file splits exactly as the reference's DMS
  * readers scale with the number of gzip inputs (reference:
  * samples/scripts/data-load/README.md:5).
  */
final case class ExternalFileFormat(
    fieldTerminator: String = ",",       // FIELD_TERMINATOR (incl. "")
    stringDelimiter: String = "\"",      // STRING_DELIMITER
    dateFormat: Option[String] = None,   // DATE_FORMAT
    firstRowHeader: Boolean = false,
    compression: Option[String] = None,  // DATA_COMPRESSION (inferred by ext if None)
    formatType: FormatType = FormatType.DelimitedText) // FORMAT_TYPE

/** FORMAT_TYPE of the external file format — the reference's CREATE EXTERNAL
  * FILE FORMAT supports DELIMITEDTEXT, PARQUET and ORC; the delimiter/header
  * options above apply only to [[FormatType.DelimitedText]], and so does
  * REJECT accounting (columnar formats are self-describing — a malformed-row
  * concept does not exist for them, matching the reference's rule that
  * reject options only fire on text loads).
  */
sealed trait FormatType
object FormatType {
  case object DelimitedText extends FormatType
  case object Parquet extends FormatType
  case object Orc extends FormatType
}

sealed trait RejectType
object RejectType {
  /** REJECT_TYPE = VALUE: fail when more than `n` rows are malformed. */
  final case class Value(n: Long) extends RejectType
  /** REJECT_TYPE = PERCENTAGE: fail when malformed rows exceed pct of total. */
  final case class Percentage(pct: Double) extends RejectType
}

/** Raised when the malformed-row count breaches the declared reject
  * threshold, matching PolyBase's load-failure semantics
  * (REJECT_VALUE=0 ⇒ first bad row fails the load,
  * reference: CTASLoad-Example.sql:79-82).
  */
final case class RejectThresholdExceeded(rejected: Long, total: Long,
    threshold: RejectType)
  extends RuntimeException(
    s"external scan rejected $rejected of $total rows (threshold $threshold)")

final case class ExternalTable(
    location: String,
    schema: StructType,
    format: ExternalFileFormat = ExternalFileFormat(),
    reject: RejectType = RejectType.Value(0)) {

  private val corruptCol = "_graft_corrupt"

  /** Raw permissive read: malformed rows carry the original line in
    * `_graft_corrupt` and nulls elsewhere.
    */
  def readRaw(spark: SparkSession): DataFrame = {
    require(format.formatType == FormatType.DelimitedText,
      "permissive corrupt-row capture applies to delimited text only")
    val reader = spark.read
      .schema(schema.add(StructField(corruptCol, StringType)))
      .option("sep", format.fieldTerminator)
      .option("quote", format.stringDelimiter)
      .option("header", format.firstRowHeader)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
    val withDate = format.dateFormat.fold(reader)(f =>
      reader.option("dateFormat", f).option("timestampFormat", f))
    val withComp = format.compression.fold(withDate)(c =>
      withDate.option("compression", c))
    withComp.csv(location)
  }

  /** Validated read with PolyBase reject accounting, in ONE pass: the
    * permissive scan streams straight into a parquet staging directory while
    * an `Observation` counts total/malformed rows on the fly; the threshold
    * is checked before the staging data is exposed (staging-commit design,
    * SURVEY.md §7.4 risk 3). No cache, no second scan — at 100 TB the load
    * path reads the text exactly once and the returned frame is a columnar
    * re-read of the staged parquet.
    */
  def load(spark: SparkSession, stagingDir: String): DataFrame = {
    if (format.formatType != FormatType.DelimitedText)
      return columnarScan(spark)
    val obs = org.apache.spark.sql.Observation()
    val observed = readRaw(spark).observe(obs,
      count(lit(1)).as("total"),
      sum(col(corruptCol).isNotNull.cast("long")).as("rejected"))
    observed.filter(col(corruptCol).isNull).drop(corruptCol)
      .write.mode("overwrite").parquet(stagingDir)
    val m = obs.get
    val total = m("total").asInstanceOf[Long]
    val rejected = Option(m("rejected")).collect { case l: Long => l }.getOrElse(0L)
    val breach = reject match {
      case RejectType.Value(n) => rejected > n
      case RejectType.Percentage(p) => total > 0 && rejected * 100.0 / total > p
    }
    if (breach) throw RejectThresholdExceeded(rejected, total, reject)
    spark.read.parquet(stagingDir)
  }

  /** Columnar external scan (PARQUET / ORC): already splittable and
    * self-describing, so there is no staging copy and no reject pass — the
    * declared schema is enforced on read exactly as the external table DDL
    * pins column types over the file footer's.
    */
  private def columnarScan(spark: SparkSession): DataFrame = {
    val src = format.formatType match {
      case FormatType.Parquet => "parquet"
      case FormatType.Orc => "orc"
      case FormatType.DelimitedText =>
        throw new IllegalStateException("not a columnar format")
    }
    spark.read.schema(schema).format(src).load(location)
  }

  /** Delimited text: `load` into a generated staging directory — deleted
    * immediately when the reject threshold fails the load (repeated loads,
    * e.g. LoadScriptGenerator.loadAll, must not leak failed stages) and
    * removed on JVM exit otherwise; the returned frame lazily re-reads the
    * staging parquet, so it must outlive the call. `load` itself never
    * deletes: a caller-provided staging dir is caller-owned. Columnar
    * formats scan the location directly with no staging at all.
    */
  def read(spark: SparkSession): DataFrame = {
    if (format.formatType != FormatType.DelimitedText)
      return columnarScan(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_ext_stage")
    ExternalTable.cleanupOnExit(dir.toFile)
    try load(spark, dir.toString)
    catch {
      case e: RejectThresholdExceeded =>
        ExternalTable.deleteRecursively(dir.toFile)
        throw e
    }
  }
}

object ExternalTable {

  /** CETAS-style export — the write half of the PolyBase loop (the
    * whitepaper scales "readers and writers for data ingestion and export"
    * with DWU, whitepaper.md:17): unload a query result to delimited text
    * at `location` using the same [[ExternalFileFormat]] options the scan
    * side declares, in `writers` parallel files (the export analog of the
    * DMS writer count). Returns the row count written. Round-trips through
    * `ExternalTable(location, df.schema, format).read` — the spec's
    * contract.
    */
  def export(df: DataFrame, location: String,
      format: ExternalFileFormat = ExternalFileFormat(),
      writers: Int = 0): Long = {
    val out = if (writers > 0) df.repartition(writers) else df
    format.formatType match {
      case FormatType.DelimitedText =>
        val writer = out.write
          .option("sep", format.fieldTerminator)
          .option("quote", format.stringDelimiter)
          .option("header", format.firstRowHeader)
          .option("emptyValue", "")
        format.dateFormat.foreach(f => writer.option("timestampFormat", f): Unit)
        format.compression.foreach(c => writer.option("compression", c): Unit)
        writer.mode("overwrite").csv(location)
        // the verification read-back must use the same parse options as the
        // write — with a header, an option-less read would count one extra
        // (all-null) row per part file
        df.sparkSession.read.schema(df.schema)
          .option("sep", format.fieldTerminator)
          .option("quote", format.stringDelimiter)
          .option("header", format.firstRowHeader)
          .csv(location).count()
      case FormatType.Parquet | FormatType.Orc =>
        val src = if (format.formatType == FormatType.Parquet) "parquet" else "orc"
        val writer = out.write
        format.compression.foreach(c => writer.option("compression", c): Unit)
        writer.mode("overwrite").format(src).save(location)
        df.sparkSession.read.format(src).load(location).count()
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private lazy val exitHook: java.util.concurrent.ConcurrentLinkedQueue[java.io.File] = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      q.forEach(deleteRecursively)))
    q
  }

  private def cleanupOnExit(dir: java.io.File): Unit = exitHook.add(dir): Unit
}
