package graft.streaming

import graft.functions.Text
import graft.operators.TextQueries.{BandCap, MinhashBands, MinhashK, MinhashRows}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-time near-duplicate flagging — the STREAMING face of the q102
  * incremental dedup (`operators/TextQueries.scala`): the operator a
  * 100 TB pipeline actually runs continuously. A nightly batch job
  * re-deduplicating the world is the wrong shape once the corpus dwarfs
  * the daily crawl; the scale shape is a standing candidate emitter that
  * MinHash-probes each arriving document against the corpus signature
  * index and emits crossing candidates as they land, with the cheap
  * classification recount deferred to the consumer (alerting, quarantine
  * routing, or the nightly compaction that also refreshes the index).
  *
  * Everything is stateless on the stream side — signature computation
  * happens INSIDE one row (no aggregation state), and the probe is a
  * stream-static equi-join against the index — so the query runs in
  * append mode with zero state store, survives any retention horizon,
  * and scales with the arrival rate rather than the corpus.
  */
object DocStream {

  /** Banded MinHash signature rows (doc_id, sig, band_idx, band_val) —
    * the SAME 32-component portable-hash signature as the batch q55, but
    * computed entirely inside one row: shingle set → one 32-bit portable
    * hash per shingle → k transform/array_min passes → 8×4 band keys.
    * Bit-identical to q55's explode + min-aggregate formulation because
    * min over the shingle set commutes with the per-element universal
    * hash; row-local, so it runs in a streaming SELECT with no shuffle
    * and no state. Documents with an empty shingle set (< 3 tokens)
    * carry no signature, exactly like q55 where explode drops them.
    */
  def bandedSignature(docs: DataFrame): DataFrame = {
    val fam = Text.hashFamily(MinhashK)
    val h32s = transform(Text.shingleSet(col("text"), 3),
      s => Text.portableHash(s).bitwiseAND(lit(0xFFFFFFFFL)))
    val sig = array((0 until MinhashK).map { i =>
      val (a, b) = fam(i)
      array_min(transform(col("h32s"), h => (h * a + b) % Text.HashP))
    }: _*)
    docs.select(col("doc_id"), h32s.as("h32s"))
      .filter(size(col("h32s")) >= 1)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(array((0 until MinhashBands).map { b =>
          concat_ws(",", (0 until MinhashRows).map(r =>
            col("sig")(b * MinhashRows + r)): _*)
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
  }

  /** Corpus signature index over the already-ingested documents: bucket
    * membership rows keyed (band_idx, band_val), carrying the full
    * signature so the probe can verify estimated Jaccard without a
    * second corpus touch. Buckets that exceed BandCap seen members are
    * dropped — q55's hot-bucket valve applied index-side, so one
    * degenerate shingle (boilerplate headers, empty-ish bodies) cannot
    * turn every arriving document into a fan-out storm. Rebuilt (or
    * incrementally appended) by the nightly compaction; broadcast-class
    * at the band grain because each seen document contributes exactly
    * 8 rows.
    */
  def signatureIndex(seen: DataFrame): DataFrame =
    bandedSignature(seen)
      .withColumn("bucket_n", count(lit(1)).over(
        Window.partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bucket_n") <= BandCap)
      .select(col("doc_id").as("seen"), col("sig").as("sig_seen"),
        col("band_idx"), col("band_val"))

  /** The standing candidate emitter: arriving documents (a streaming
    * DataFrame of doc_id, text) are signature-banded row-locally and
    * stream-static joined against the index; every band collision with
    * signature-estimated Jaccard ≥ 0.5 emits a candidate row
    * (inc_id, seen, band_idx, est_jaccard) immediately. A pair that
    * collides in several bands emits once per band — deduplication is
    * deliberately NOT done here, because watermark-less dropDuplicates
    * would grow state without bound on an endless crawl; the consumer's
    * recount ([[classify]]) dedups at its own (bounded) grain instead.
    */
  def candidateEmitter(incoming: DataFrame, index: DataFrame): DataFrame =
    bandedSignature(incoming)
      .select(col("doc_id").as("inc_id"), col("sig").as("sig_inc"),
        col("band_idx"), col("band_val"))
      .join(index, Seq("band_idx", "band_val"))
      .filter(col("inc_id") =!= col("seen"))
      .select(col("inc_id"), col("seen"), col("band_idx"),
        (size(filter(zip_with(col("sig_inc"), col("sig_seen"),
          (x, y) => x === y), b => b)).cast("double") / MinhashK)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)

  /** Consumer-side classification recount — the q102 contract verbatim
    * over a landed candidate batch: dedup per-band emissions to pairs,
    * count matches per arriving document, pick the best match (highest
    * estimated Jaccard, ties to the smallest seen id), and left-join the
    * full arrival set so unmatched documents classify `novel`. Batch
    * parity: over the same seen/incoming split, this equals
    * q102IncrementalDedup row-for-row (StreamingSpec pins it).
    */
  def classify(incoming: DataFrame, candidates: DataFrame): DataFrame = {
    val uniq = candidates
      .select(col("inc_id"), col("seen"), col("est_jaccard"))
      .dropDuplicates("inc_id", "seen")
    val w = Window.partitionBy(col("inc_id"))
    val best = uniq
      .withColumn("n_matches", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("est_jaccard").desc, col("seen"))))
      .filter(col("rk") === 1)
      .select(col("inc_id"), col("n_matches"),
        col("seen").as("best_match"), col("est_jaccard").as("best_sim"))
    incoming.select(col("doc_id").as("inc_id"))
      .join(best, Seq("inc_id"), "left")
      .select(col("inc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_match"), col("best_sim"),
        when(col("best_match").isNull, "novel").otherwise("duplicate")
          .as("status"))
  }
}
