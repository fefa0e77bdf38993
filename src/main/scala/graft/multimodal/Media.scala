package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * as opaque `binary` columns plus typed metadata, with decode /
  * feature-extract / frame-sample as per-partition transforms.
  *
  * The Spark-side plumbing is real — schemas, partition-iterator batch shape,
  * typed Dataset seams — and the decode seam ([[MediaDecoder]]) has two
  * implementations: [[CodecDecoder]], a REAL pure-JVM decoder for
  * byte-parseable formats (PPM pixel decode + resize + content features,
  * PNG IHDR probe, RIFF/PCM WAV with RMS features, concatenated-PPM frame
  * streams), and [[StubDecoder]], a deterministic stand-in for codec-bound
  * formats (JPEG/H.264/...) this container can't decode. A production
  * deployment swaps in a JNI/javacpp-backed decoder without touching the
  * pipeline: the decoder is invoked inside `mapPartitions`, so batching,
  * off-heap reuse, and per-partition init (the expensive codec setup) all
  * happen once per task, not per row — the property that matters at 100 TB.
  */
object Media {

  final case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, format: String,
      width: Int, height: Int, n_frames: Int, n_bytes: Long)
  final case class MediaFeatures(media_id: Long, features: Array[Float])
  final case class FrameRow(media_id: Long, frame_idx: Int,
      frame_features: Array[Float])

  /** The decode seam. Implementations must be deterministic per byte-content
    * and cheap to construct per partition.
    */
  trait MediaDecoder extends Serializable {
    def probe(kind: String, bytes: Array[Byte]): MediaMetaShape
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    /** Per-frame features for multi-frame media; the default derives them
      * from content+index (what the stub provides), real decoders override
      * with an actual frame decode.
      */
    def frameFeatures(bytes: Array[Byte], frame: Int, dim: Int): Array[Float] =
      features(bytes :+ (frame & 0xFF).toByte, dim)
  }
  final case class MediaMetaShape(format: String, width: Int, height: Int,
      n_frames: Int)

  /** Deterministic stand-in for the real codec: shapes and features are pure
    * functions of the byte content (stable hashes), so tests and plumbing are
    * exact while the real decoder is absent.
    */
  object StubDecoder extends MediaDecoder {
    private def h(bytes: Array[Byte], seed: Int): Long = {
      var acc = 1125899906842597L + seed
      var i = 0
      while (i < bytes.length) { acc = 31 * acc + bytes(i); i += 1 }
      acc
    }
    override def probe(kind: String, bytes: Array[Byte]): MediaMetaShape = {
      val base = math.abs(h(bytes, 7))
      kind match {
        case "image" => MediaMetaShape("fake/png",
          (base % 1920 + 64).toInt, (base / 1920 % 1080 + 64).toInt, 1)
        case "video" => MediaMetaShape("fake/mp4",
          (base % 1280 + 64).toInt, (base / 1280 % 720 + 64).toInt,
          (base % 240 + 2).toInt)
        case "audio" => MediaMetaShape("fake/wav", 0, 0, (base % 4800 + 1).toInt)
        case other => MediaMetaShape(s"fake/$other", 0, 0, 1)
      }
    }
    override def features(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        ((math.abs(h(bytes, d)) % 2000003L) / 1000001.5f) - 1.0f)
  }

  /** Decode metadata per partition (codec init once per task). */
  def probeAll(spark: SparkSession, media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val s = decoder.probe(r.kind, r.media)
        MediaMeta(r.media_id, r.kind, s.format, s.width, s.height, s.n_frames,
          r.media.length.toLong)
      }
    }
  }

  /** Fixed-dim feature extraction (the embed step of a media pipeline). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow], dim: Int,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      MediaFeatures(r.media_id, decoder.features(r.media, dim))))
  }

  /** Uniform frame sampling for video-like media: every k-th frame up to
    * `maxFrames`, each frame getting content+index-derived features.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], dim: Int,
      maxFrames: Int, decoder: MediaDecoder = StubDecoder): Dataset[FrameRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = decoder.probe(r.kind, r.media).n_frames
        val step = math.max(1, n / math.max(1, maxFrames))
        (0 until n by step).take(maxFrames).map { f =>
          FrameRow(r.media_id, f, decoder.frameFeatures(r.media, f, dim))
        }
      }
    }
  }

  final case class SceneCut(media_id: Long, frame: Int, dist: Double)

  /** Shot-boundary (scene-change) detection for multi-frame media: a cut is
    * declared at frame f when the L2 distance between frame f's and frame
    * f−1's content features exceeds `threshold` — the segmentation step a
    * video training pipeline runs before sampling representative frames
    * per shot (sampling uniformly across a 2-shot clip oversamples the
    * long shot; sampling per cut doesn't). Runs at the same per-partition
    * decode seam as [[sampleFrames]]; the previous frame's features carry
    * through the in-order fold so each pair costs one new frame decode.
    * Single-frame and still media yield no cuts. Spec-proven (CodecsSpec
    * constructs a two-shot PPM stream; DuckDB cannot decode media, so no
    * SQL oracle can exist).
    */
  def sceneChanges(spark: SparkSession, media: Dataset[MediaRow], dim: Int,
      threshold: Double,
      decoder: MediaDecoder = CodecDecoder): Dataset[SceneCut] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = decoder.probe(r.kind, r.media).n_frames
        if (n <= 1) Iterator.empty
        else {
          var prev = decoder.frameFeatures(r.media, 0, dim)
          (1 until n).iterator.flatMap { f =>
            val cur = decoder.frameFeatures(r.media, f, dim)
            var s = 0.0
            var i = 0
            while (i < cur.length) {
              val d = cur(i).toDouble - prev(i).toDouble
              s += d * d
              i += 1
            }
            prev = cur
            val dist = math.sqrt(s)
            if (dist > threshold) Some(SceneCut(r.media_id, f, dist))
            else None
          }
        }
      }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long)

  /** Decode each image and fingerprint it with the 64-bit average hash —
    * the per-partition decode seam feeding [[nearDupImages]].
    */
  def perceptualHashes(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      MediaHash(r.media_id, CodecDecoder.averageHash(CodecDecoder.decodeStill(r.media)))))
  }

  /** Decode each audio row to its 64-bit energy-contour fingerprint
    * ([[CodecDecoder.audioHash]]) — feeds [[nearDupImages]]'s banded join,
    * which is agnostic to which perceptual hash produced the bits.
    */
  def audioHashes(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions(_.map(r =>
      MediaHash(r.media_id, CodecDecoder.audioHash(r.media))))
  }

  final case class AudioSegment(media_id: Long, seg_idx: Int, kind: String,
      start_ms: Long, end_ms: Long, n_frames: Int)

  /** Voice-activity-style silence segmentation at the decode seam — the
    * chunking pass an ASR/speech training pipeline runs before
    * transcription: each audio row splits into fixed `frameMs` frames,
    * frames at or below `silencePermille`‰ of the row's loudest frame are
    * silent ([[CodecDecoder.silenceRuns]] — exact integer energies), and
    * consecutive same-class frames merge into typed segments with
    * millisecond boundaries. Same mapPartitions posture as every decode
    * transform: one decoder per task, segments ride out as a typed
    * Dataset keyed by media_id for downstream joins.
    */
  def silenceSegments(spark: SparkSession, media: Dataset[MediaRow],
      frameMs: Int = 10, silencePermille: Int = 10): Dataset[AudioSegment] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val w = CodecDecoder.parseWav(r.media)
      val spf = math.max(1, w.sampleRate * frameMs / 1000)
      // boundaries derive from SAMPLE counts, not frameIndex × nominal ms:
      // at rates where rate·frameMs isn't a multiple of 1000 the nominal
      // stamp drifts linearly from real time
      def ms(frame: Int): Long = frame.toLong * spf * 1000L / w.sampleRate
      CodecDecoder.silenceRuns(r.media, w, spf, silencePermille)
        .zipWithIndex.map { case ((start, n, silent), i) =>
          AudioSegment(r.media_id, i, if (silent) "silence" else "speech",
            ms(start), ms(start + n), n)
        }
    })
  }

  final case class LetterboxReport(media_id: Long, width: Int, height: Int,
      top: Int, bottom: Int, left: Int, right: Int,
      content_width: Int, content_height: Int, is_boxed: Boolean)

  /** Letterbox/pillarbox QA over an image corpus — per image, the uniform
    * dark margins ([[CodecDecoder.letterboxMargins]]) and the implied crop
    * box; `is_boxed` flags images whose bars consume a detectable margin
    * on either axis. Same decode seam as every media pass; pure integer
    * channel comparisons.
    */
  def letterboxReport(spark: SparkSession, media: Dataset[MediaRow],
      thresh: Int = 24): Dataset[LetterboxReport] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val p = CodecDecoder.decodeStill(r.media)
      val (t, b, l, rt) = CodecDecoder.letterboxMargins(p, thresh)
      LetterboxReport(r.media_id, p.width, p.height, t, b, l, rt,
        p.width - l - rt, p.height - t - b,
        t + b > 0 || l + rt > 0)
    })
  }

  final case class AudioClipReport(media_id: Long, n_samples: Long,
      n_clipped: Long, max_run: Long, clipped_permille: Long)

  /** Clipping QA over an audio corpus — the corrupt-capture screen a
    * media-training pipeline runs at ingest: per recording, how many PCM16
    * samples sit at full scale and the longest consecutive clipped run (a
    * sustained plateau is the audible artifact; a lone peak is normal
    * program material). Same decode seam as every media pass
    * (mapPartitions over the binary column — one header parse + one linear
    * sample scan per row, no shuffle), exact integer arithmetic throughout.
    */
  def clippingReport(spark: SparkSession, media: Dataset[MediaRow],
      clipLevel: Int = 32700): Dataset[AudioClipReport] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val w = CodecDecoder.parseWav(r.media)
      val (total, clipped, maxRun) =
        CodecDecoder.clippingScan(r.media, w, clipLevel)
      AudioClipReport(r.media_id, total, clipped, maxRun,
        if (total == 0) 0L else clipped * 1000L / total)
    })
  }

  /** Near-duplicate detection over 64-bit perceptual hashes (images via
    * [[perceptualHashes]], audio via [[audioHashes]]) — the media twin of
    * the SimHash text path: the hash splits into 4 × 16-bit chunks,
    * candidates collide on at least one identical chunk (pigeonhole:
    * Hamming ≤ 3 guarantees one of 4 chunks is untouched, so recall is exact
    * for maxHamming ≤ 3), and the XOR-popcount verification runs only on
    * candidates. Bucket fan-out is bounded by `bandCap` by construction —
    * the same guarantee the text LSH paths carry, so the plan survives a
    * skewed corpus (e.g. millions of near-black frames sharing a chunk).
    */
  def nearDupImages(hashes: DataFrame, maxHamming: Int = 3,
      bandCap: Int = 1000): DataFrame = {
    require(maxHamming <= 3,
      s"pigeonhole over 4 chunks is exact only for Hamming ≤ 3, got $maxHamming")
    val banded = hashes.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("chunk", expr("(phash >> (band * 16)) & 65535"))
    banded.groupBy(col("band"), col("chunk"))
      .agg(sort_array(collect_list(struct(col("media_id"), col("phash"))))
        .as("ms"))
      .filter(size(col("ms")).between(2, bandCap))
      .select(graft.functions.Pairs.inPlace(col("ms"), (x, y) =>
        struct(x.getField("media_id").as("id_a"),
          x.getField("phash").as("ha"),
          y.getField("media_id").as("id_b"),
          y.getField("phash").as("hb"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        expr("bit_count(p.ha ^ p.hb)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Metadata "resize" transform — pure column math over the meta table
    * (aspect-preserving bound to maxDim), no decode needed.
    */
  def resizeMeta(meta: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height"), lit(1)))
    meta.withColumn("resized_width", ceil(col("width") * scale).cast("int"))
      .withColumn("resized_height", ceil(col("height") * scale).cast("int"))
  }
}
