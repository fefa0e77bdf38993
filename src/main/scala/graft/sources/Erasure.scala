package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown / right-to-erasure for the document corpus: remove every
  * document matching an opted-out source or an explicit doc_id list,
  * rewrite the table, and return the AUDIT the compliance process files —
  * per source, how many documents and how much text left the corpus.
  *
  * Design for an immutable lake: erasure is a filtered REWRITE into a new
  * table directory (the caller swaps it in atomically and retires the old
  * one), never an in-place mutation — the same copy-on-write shape the
  * CTAS loader uses. The filter is two broadcastable predicates (an isin
  * over sources and an isin over ids at driver-metadata scale; for
  * million-id takedown lists, pass `idsDf` instead and the removal becomes
  * a broadcast anti-join), so the rewrite is one scan, no shuffle.
  *
  * The audit is computed from the SAME pass semantics (conditional
  * aggregation over the source column) and is exact: a row either matched
  * the takedown predicate or it didn't.
  */
object Erasure {

  final case class ErasureReport(source: String, docs_removed: Long,
      chars_removed: Long)

  /** Rewrite `<srcDir>/documents.parquet` minus the matched rows into
    * `<outDir>/documents.parquet`; return the per-source removal audit.
    */
  def eraseDocuments(spark: SparkSession, srcDir: String, outDir: String,
      bySource: Seq[String] = Nil, byDocId: Seq[Long] = Nil,
      idsDf: Option[DataFrame] = None): DataFrame = {
    val docs = graft.Tables.documents(spark, srcDir)
    val directMatch =
      (if (bySource.nonEmpty) col("source").isin(bySource: _*) else lit(false)) ||
        (if (byDocId.nonEmpty) col("doc_id").isin(byDocId: _*) else lit(false))
    val flagged = idsDf match {
      case Some(ids) =>
        // million-id regime: broadcast anti-join semantics via a left join
        // + null test keeps the single-scan shape
        docs.join(broadcast(ids.select(col(ids.columns.head).as("erase_id"))
            .distinct()),
            col("doc_id") === col("erase_id"), "left")
          .withColumn("erase", directMatch || col("erase_id").isNotNull)
          .drop("erase_id")
      case None => docs.withColumn("erase", directMatch)
    }
    val kept = flagged.filter(!col("erase")).drop("erase")
    kept.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    flagged.filter(col("erase"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_removed"),
        sum(length(col("text")).cast("long")).as("chars_removed"))
  }

  final case class RetentionPolicy(eventType: String, maxAgeDays: Long)

  /** Retention-policy sweep over the event stream — the scheduled sibling
    * of the on-demand takedown: each event type carries a maximum age
    * (days before `asOfMs`), expired rows are dropped in one filtered
    * copy-on-write rewrite of `<srcDir>/events.parquet` into `outDir`,
    * and the returned audit reports kept/dropped counts and the dropped
    * time range per type. Types without a policy are retained forever.
    * The age predicate is a pure column expression (partition-prunable on
    * a date-partitioned lake) and the audit is conditional aggregation
    * over the same scan semantics — exact, like the erasure audit.
    */
  def retentionSweep(spark: SparkSession, srcDir: String, outDir: String,
      policies: Seq[RetentionPolicy], asOfMs: Long): DataFrame = {
    val events = graft.Tables.events(spark, srcDir)
    val expired = policies.map { p =>
      col("event_type") === p.eventType &&
        unix_millis(col("ts")) < lit(asOfMs - p.maxAgeDays * 86400000L)
    }.foldLeft(lit(false))(_ || _)
    val flagged = events.withColumn("expired", expired)
    flagged.filter(!col("expired")).drop("expired")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("expired").cast("long")).as("n_dropped"),
        min(when(col("expired"), unix_millis(col("ts")))).as("oldest_dropped_ms"),
        max(when(col("expired"), unix_millis(col("ts")))).as("newest_dropped_ms"))
  }
}
