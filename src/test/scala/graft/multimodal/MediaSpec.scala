package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {
  import Media._

  private def mediaDs = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5)),
      MediaRow(2L, "video", Array[Byte](9, 9, 9, 9, 9, 9)),
      MediaRow(3L, "audio", Array[Byte](7, 7)),
      MediaRow(4L, "image", Array[Byte](1, 2, 3, 4, 5))).toDS()
  }

  test("probe is deterministic per content: identical bytes → identical meta") {
    val meta = Media.probeAll(spark, mediaDs).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).copy(media_id = 4L) === meta(4L))
    assert(meta(1L).format === "fake/png")
    assert(meta(2L).n_frames > 1)
    assert(meta(3L).format === "fake/wav")
    assert(meta.values.forall(m => m.width >= 0 && m.n_frames >= 1))
  }

  test("feature extraction yields fixed-dim deterministic vectors") {
    val f = Media.extractFeatures(spark, mediaDs, dim = 16).collect()
      .map(x => x.media_id -> x.features).toMap
    assert(f.values.forall(_.length === 16))
    assert(f(1L).toSeq === f(4L).toSeq)
    assert(f(1L).toSeq !== f(2L).toSeq)
    assert(f.values.forall(_.forall(v => v >= -2f && v <= 2f)))
  }

  test("frame sampling bounds frames and varies features per frame") {
    val frames = Media.sampleFrames(spark, mediaDs, dim = 8, maxFrames = 4)
      .collect().groupBy(_.media_id)
    assert(frames(2L).length <= 4 && frames(2L).length >= 2)
    val fs = frames(2L).sortBy(_.frame_idx)
    assert(fs(0).frame_features.toSeq !== fs(1).frame_features.toSeq)
  }

  test("perceptual-hash near-dup finds rescaled duplicates, not distinct content") {
    import spark.implicits._
    // a P6 gradient, its half-size rescale (visual duplicate), a noisy copy
    // (one corner brightened), and the inverted gradient (distinct content)
    def grad(w: Int, h: Int, invert: Boolean, blotch: Boolean): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val base = x * 255 / math.max(1, w - 1)
        val v0 = if (invert) 255 - base else base
        val v = (if (blotch && x < w / 8 && y < h / 8) 255 else v0).toByte
        val i = (y * w + x) * 3
        px(i) = v; px(i + 1) = v; px(i + 2) = v
      }
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    val rows = Seq(
      MediaRow(1L, "image", grad(64, 64, invert = false, blotch = false)),
      MediaRow(2L, "image", grad(32, 32, invert = false, blotch = false)),
      MediaRow(3L, "image", grad(64, 64, invert = false, blotch = true)),
      MediaRow(4L, "image", grad(64, 64, invert = true, blotch = false))).toDS()
    val hashes = Media.perceptualHashes(spark, rows).toDF()
    val pairs = Media.nearDupImages(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "rescaled duplicate must collide")
    assert(pairs.contains((1L, 3L)), "mildly noisy duplicate must collide")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)),
      "inverted content must not pass verification")
  }

  test("audio fingerprints match gain-scaled copies, not reversed envelopes") {
    import spark.implicits._
    // PCM16 mono WAV whose square-wave amplitude follows a time envelope:
    // a gain-scaled copy keeps every window-to-window energy DELTA sign
    // (identical fingerprint); the reversed envelope flips them all
    def wav(n: Int, gain: Double, invert: Boolean): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      for (s <- 0 until n) {
        val frac = s.toDouble / n
        val env = if (invert) 1.0 - frac else frac
        val amp = (16384 * env * gain).toInt
        val v: Short = (if (s % 8 < 4) amp else -amp).toShort
        data(s * 2) = (v & 0xFF).toByte
        data(s * 2 + 1) = ((v >> 8) & 0xFF).toByte
      }
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + data.length); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
      bb.array()
    }
    val rows = Seq(
      MediaRow(1L, "audio", wav(8000, 1.0, invert = false)),
      MediaRow(2L, "audio", wav(8000, 0.5, invert = false)),
      MediaRow(3L, "audio", wav(8000, 1.0, invert = true))).toDS()
    val hashes = Media.audioHashes(spark, rows).toDF()
    val pairs = Media.nearDupImages(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "gain-scaled copy must collide")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "reversed envelope must not collide")
  }

  test("near-dup bucket cap bounds degenerate fan-out by construction") {
    import spark.implicits._
    // 20 identical hashes: every chunk bucket holds all 20 → capping at 10
    // must drop the bucket entirely (bounded work, no m² pair blowup)
    val flat = (1L to 20L).map(i => (i, 0x1234567812345678L))
      .toDF("media_id", "phash")
    assert(Media.nearDupImages(flat, 3, bandCap = 10).count() === 0)
    assert(Media.nearDupImages(flat, 3).count() === 20L * 19 / 2)
  }

  test("resize preserves aspect ratio within the bound") {
    val meta = Media.probeAll(spark, mediaDs).toDF()
    val resized = Media.resizeMeta(meta, 256)
      .filter(col("kind") === "image").collect()(0)
    val (w, h) = (resized.getAs[Int]("width"), resized.getAs[Int]("height"))
    val (rw, rh) = (resized.getAs[Int]("resized_width"),
      resized.getAs[Int]("resized_height"))
    assert(rw <= 256 + 1 && rh <= 256 + 1)
    assert(math.abs(rw.toDouble / rh - w.toDouble / h) < 0.1)
  }

  test("silence segmentation emits typed ms-bounded segments per media row") {
    import spark.implicits._
    // 8 kHz mono: 30 ms tone, 40 ms silence, 20 ms tone (10 ms frames)
    def block(amp: Short, n: Int): Array[Byte] = {
      val d = new Array[Byte](n * 2)
      for (s <- 0 until n) {
        val v: Short = (if (s % 8 < 4) amp else -amp).toShort
        d(s * 2) = (v & 0xFF).toByte; d(s * 2 + 1) = ((v >> 8) & 0xFF).toByte
      }
      d
    }
    val data = block(16384, 240) ++ block(0, 320) ++ block(16384, 160)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + data.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
    val rows = Seq(Media.MediaRow(7L, "audio", bb.array())).toDS()
    val segs = Media.silenceSegments(spark, rows).collect()
      .sortBy(_.seg_idx)
    assert(segs.map(s => (s.kind, s.start_ms, s.end_ms)).toSeq === Seq(
      ("speech", 0L, 30L), ("silence", 30L, 70L), ("speech", 70L, 90L)))
    assert(segs.forall(_.media_id === 7L))
  }
  test("clipping report: plateau run counted exactly, clean audio passes") {
    import spark.implicits._
    def pcm(vals: Seq[Short]): Array[Byte] = {
      val d = new Array[Byte](vals.length * 2)
      vals.zipWithIndex.foreach { case (v, i) =>
        d(i * 2) = (v & 0xFF).toByte; d(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
      }
      val bb = java.nio.ByteBuffer.allocate(44 + d.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + d.length); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(d.length); bb.put(d)
      bb.array()
    }
    // clean: half-scale square wave; clipped: a 5-sample full-scale plateau
    // (incl. one negative rail) inside otherwise clean material
    val clean = pcm(Seq.tabulate(64)(i => (if (i % 8 < 4) 16384 else -16384).toShort))
    val dirty = pcm(Seq[Short](100, 32767, 32767, -32768, 32767, 32700, 50,
      200, 32767, 10))
    val rows = Seq(Media.MediaRow(1L, "audio", clean),
      Media.MediaRow(2L, "audio", dirty)).toDS()
    val out = Media.clippingReport(spark, rows).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).n_clipped === 0L)
    assert(out(1L).max_run === 0L)
    assert(out(2L).n_samples === 10L)
    // samples at |v| >= 32700: indices 1,2,3,4,5 and 8
    assert(out(2L).n_clipped === 6L)
    assert(out(2L).max_run === 5L)
    assert(out(2L).clipped_permille === 600L)
  }
  test("letterbox margins: bars measured exactly, clean image passes") {
    import spark.implicits._
    def ppm(w: Int, h: Int, bright: (Int, Int) => Boolean): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v: Byte = if (bright(x, y)) 200.toByte else 5.toByte
        val i = (y * w + x) * 3
        px(i) = v; px(i + 1) = v; px(i + 2) = v
      }
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    }
    // 16x12 with 2-row top bar, 3-row bottom bar, 1-col left pillar
    val boxed = ppm(16, 12, (x, y) => y >= 2 && y < 9 && x >= 1)
    val clean = ppm(8, 8, (_, _) => true)
    val allDark = ppm(4, 4, (_, _) => false)
    val rows = Seq(Media.MediaRow(1L, "image", boxed),
      Media.MediaRow(2L, "image", clean),
      Media.MediaRow(3L, "image", allDark)).toDS()
    val out = Media.letterboxReport(spark, rows).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(1L).top === 2 && out(1L).bottom === 3)
    assert(out(1L).left === 1 && out(1L).right === 0)
    assert(out(1L).content_width === 15 && out(1L).content_height === 7)
    assert(out(1L).is_boxed)
    assert(out(2L).top === 0 && out(2L).bottom === 0 &&
      out(2L).left === 0 && out(2L).right === 0 && !out(2L).is_boxed)
    // degenerate all-dark image: all margin, empty content box
    assert(out(3L).top === 4 && out(3L).content_height === 0)
  }
}
