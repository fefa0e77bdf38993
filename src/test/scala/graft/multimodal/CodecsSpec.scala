package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Media.MediaRow
import org.apache.spark.sql.functions._

/** The real pure-JVM codec path: PPM pixel decode/resize/features, PNG IHDR
  * probe, WAV chunk walk + RMS features, PPM-stream frame sampling — all
  * through the same Media pipelines the stub uses.
  */
class CodecsSpec extends SparkSpec {

  /** A w×h P6 gradient: luminance rises left→right. */
  private def ppm(w: Int, h: Int, bright: Int = 255): Array[Byte] = {
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * bright / math.max(1, w - 1)).toByte
      val i = (y * w + x) * 3
      px(i) = v; px(i + 1) = v; px(i + 2) = v
    }
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
  }

  /** Mono PCM16 WAV with n samples of a square wave. */
  private def wav(n: Int, amp: Short = 16384): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    for (s <- 0 until n) {
      val v: Short = if (s % 8 < 4) amp else (-amp).toShort
      data(s * 2) = (v & 0xFF).toByte
      data(s * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + data.length)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
    bb.array()
  }

  private def png(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    bb.putInt(13); bb.put("IHDR".getBytes)
    bb.putInt(w); bb.putInt(h)
    bb.put(8.toByte); bb.put(2.toByte); bb.put(0.toByte); bb.put(0.toByte)
    bb.put(0.toByte); bb.putInt(0) // crc unchecked by the probe
    bb.array()
  }

  test("probe returns exact shapes for PPM, PNG, WAV, and PPM streams") {
    import spark.implicits._
    val stream = ppm(8, 6) ++ ppm(8, 6, 128) ++ ppm(8, 6, 64)
    val rows = Seq(
      MediaRow(1, "image", ppm(16, 9)),
      MediaRow(2, "image", png(640, 480)),
      MediaRow(3, "audio", wav(4000)),
      MediaRow(4, "video", stream)).toDS()
    val meta = Media.probeAll(spark, rows, CodecDecoder)
      .collect().map(m => m.media_id -> m).toMap
    assert(meta(1).format === "image/x-portable-pixmap")
    assert(meta(1).width === 16 && meta(1).height === 9)
    assert(meta(2).format === "image/png")
    assert(meta(2).width === 640 && meta(2).height === 480)
    assert(meta(3).format === "audio/wav" && meta(3).n_frames === 4000)
    assert(meta(4).format === "video/x-ppm-stream" && meta(4).n_frames === 3)
  }

  test("features reflect actual content: gradient rises, louder is bigger") {
    val f = CodecDecoder.features(ppm(32, 32), 4)
    assert(f(0) < f(1), f.toSeq) // left cells darker than right cells
    val loud = CodecDecoder.features(wav(4000, 16384), 4)
    val quiet = CodecDecoder.features(wav(4000, 1024), 4)
    assert(loud(0) > quiet(0))
    assert(math.abs(loud(0) - 0.5) < 0.01) // RMS of a ±0.5 square wave
  }

  test("resize is a real pixel transform and round-trips through PPM bytes") {
    val (p, _) = CodecDecoder.parsePpm(ppm(16, 8))
    val small = CodecDecoder.resizePpm(p, 4, 2)
    assert(small.width === 4 && small.height === 2)
    assert(small.pixels.length === 4 * 2 * 3)
    val (rt, _) = CodecDecoder.parsePpm(CodecDecoder.writePpm(small))
    assert(rt.pixels.toSeq === small.pixels.toSeq)
    // gradient ordering survives the resize
    assert(rt.luminance(0, 0) < rt.luminance(3, 0))
  }

  test("frame sampling decodes the actual frames of a PPM stream") {
    import spark.implicits._
    val stream = ppm(8, 6, 255) ++ ppm(8, 6, 128) ++ ppm(8, 6, 0)
    val rows = Seq(MediaRow(9, "video", stream)).toDS()
    val frames = Media.sampleFrames(spark, rows, dim = 4, maxFrames = 3,
        CodecDecoder)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    // brightness decreases across the stream's frames
    def mean(f: Array[Float]) = f.sum / f.length
    assert(mean(frames(0).frame_features) > mean(frames(1).frame_features))
    assert(mean(frames(1).frame_features) > mean(frames(2).frame_features))
  }

  test("scene-change detection cuts exactly at the shot boundary") {
    import spark.implicits._
    // shot 1: three bright frames; shot 2: three dark frames — one cut
    val stream = ppm(8, 6, 255) ++ ppm(8, 6, 250) ++ ppm(8, 6, 245) ++
      ppm(8, 6, 10) ++ ppm(8, 6, 12) ++ ppm(8, 6, 8)
    val rows = Seq(
      Media.MediaRow(1, "video", stream),
      Media.MediaRow(2, "image", ppm(8, 6, 200))).toDS() // still: no cuts
    val cuts = Media.sceneChanges(spark, rows, dim = 8, threshold = 0.2,
      CodecDecoder).collect()
    assert(cuts.map(_.media_id).toSet === Set(1L))
    assert(cuts.length === 1, cuts.mkString(", "))
    assert(cuts.head.frame === 3)
    // threshold zero flags every inter-frame delta
    val all = Media.sceneChanges(spark, rows, dim = 8, threshold = 0.0,
      CodecDecoder).collect()
    assert(all.length === 5)
  }

  /** Encode a left→right luminance gradient as JPEG/PNG via the JDK codec. */
  private def encodedImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 255 / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  test("JPEG: SOF-walk probe dims, ImageIO pixel decode, content features") {
    val jpg = encodedImage(48, 20, "jpg")
    assert(CodecDecoder.isJpeg(jpg))
    assert(CodecDecoder.jpegDims(jpg) === ((48, 20)))
    val shape = CodecDecoder.probe("image", jpg)
    assert(shape.format === "image/jpeg")
    assert(shape.width === 48 && shape.height === 20 && shape.n_frames === 1)
    // features survive JPEG's lossy round-trip: gradient still rises
    val f = CodecDecoder.features(jpg, 4)
    assert(f(0) < f(1), f.toSeq)
    val p = CodecDecoder.decodeImage(jpg)
    assert(p.width === 48 && p.height === 20)
    assert(p.luminance(0, 0) < p.luminance(47, 0))
  }

  test("PNG: pixel decode upgrades the probe-only path; lossless features") {
    val png = encodedImage(32, 32, "png")
    val shape = CodecDecoder.probe("image", png)
    assert(shape.format === "image/png" && shape.width === 32)
    // PNG is lossless: decoded features equal the PPM-encoded equivalent
    val fromPng = CodecDecoder.features(png, 4)
    val fromPpm = CodecDecoder.features(ppm(32, 32), 4)
    fromPng.zip(fromPpm).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }

  test("GIF: multi-frame probe, per-frame decode, content features") {
    // animated GIF via ImageIO's writer: three gradient frames of rising
    // brightness
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (bright <- Seq(64, 128, 255)) {
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) {
        val v = x * bright / 23
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray

    assert(CodecDecoder.isGif(gif))
    val shape = CodecDecoder.probe("video", gif)
    assert(shape.format === "video/gif")
    assert(shape.width === 24 && shape.height === 16 && shape.n_frames === 3)
    // later frames are brighter; within a frame the gradient rises
    val f0 = CodecDecoder.frameFeatures(gif, 0, 4)
    val f2 = CodecDecoder.frameFeatures(gif, 2, 4)
    assert(f0(3) < f2(3), s"${f0.toSeq} vs ${f2.toSeq}")
    assert(f2(0) < f2(3), f2.toSeq)
  }

  test("AVI/MJPEG: RIFF walk, geometry, frame decode round-trip") {
    val jpegs = Seq(64, 128, 255).map { bright =>
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = x * bright / 31
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val o = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", o))
      o.toByteArray
    }
    val avi = CodecDecoder.writeAviMjpeg(jpegs, 32, 24, fps = 10)

    assert(CodecDecoder.isAvi(avi))
    val parsed = CodecDecoder.parseAvi(avi)
    assert(parsed.width === 32 && parsed.height === 24)
    assert(parsed.totalFrames === 3 && parsed.frameChunks.size === 3)
    val shape = CodecDecoder.probe("video", avi)
    assert(shape.format === "video/avi" && shape.n_frames === 3)
    // per-frame pixel decode: geometry and rising gradient survive MJPEG
    val p = CodecDecoder.aviFrame(avi, parsed, 1)
    assert(p.width === 32 && p.height === 24)
    assert(p.luminance(0, 5) < p.luminance(31, 5))
    val f0 = CodecDecoder.frameFeatures(avi, 0, 4)
    val f2 = CodecDecoder.frameFeatures(avi, 2, 4)
    assert(f0(3) < f2(3), s"${f0.toSeq} vs ${f2.toSeq}")
  }

  test("unknown bytes are reported honestly, not faked") {
    val shape = CodecDecoder.probe("image", Array[Byte](1, 2, 3, 4))
    assert(shape.format === "application/octet-stream")
    assert(shape.width === 0 && shape.n_frames === 0)
  }

  /** Mono PCM16 WAV at 8 kHz whose amplitude per 80-sample block follows
    * `amps` — tone/silence layouts with exact block boundaries.
    */
  private def enveloped(amps: Seq[Short]): Array[Byte] = {
    val data = new Array[Byte](amps.length * 80 * 2)
    for ((a, blk) <- amps.zipWithIndex; s <- 0 until 80) {
      val v: Short = if (s % 8 < 4) a else (-a).toShort
      val i = (blk * 80 + s) * 2
      data(i) = (v & 0xFF).toByte
      data(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + data.length)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
    bb.array()
  }

  test("silence segmentation cuts exactly at the tone/silence boundaries") {
    // 10 ms frames at 8 kHz = 80 samples = one envelope block:
    // 3 tone, 4 silent, 2 tone, 1 silent
    val amps = Seq.fill(3)(16384.toShort) ++ Seq.fill(4)(0.toShort) ++
      Seq.fill(2)(16384.toShort) ++ Seq(0.toShort)
    val b = enveloped(amps)
    val runs = CodecDecoder.silenceRuns(b, 80, 10)
    assert(runs === Seq((0, 3, false), (3, 4, true), (7, 2, false), (9, 1, true)))
    // low-level hum below 1% of peak energy still counts as silence
    val hum = enveloped(Seq.fill(2)(16384.toShort) ++ Seq.fill(3)(512.toShort))
    assert(CodecDecoder.silenceRuns(hum, 80, 10) ===
      Seq((0, 2, false), (2, 3, true)))
    // all-silent input is one silent run, not a divide-by-zero
    val flat = enveloped(Seq.fill(4)(0.toShort))
    assert(CodecDecoder.silenceRuns(flat, 80, 10) === Seq((0, 4, true)))
  }
}
