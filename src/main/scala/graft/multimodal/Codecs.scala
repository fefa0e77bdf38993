package graft.multimodal

import graft.multimodal.Media.{MediaDecoder, MediaMetaShape}

/** A REAL [[MediaDecoder]] for formats parseable in pure JVM code — no
  * native codec libraries required:
  *
  *  - PPM (P6) images: full pixel decode, content features (mean luminance
  *    over a grid), nearest-neighbor resize back to P6 bytes
  *  - JPEG: dimensions from a marker walk to the SOF segment (cheap probe,
  *    no pixel work); full pixel decode for features through the JDK's own
  *    `javax.imageio` (part of every standard JVM — still zero native deps)
  *  - PNG: IHDR metadata probe from the spec'd big-endian fields; pixel
  *    decode for features through `javax.imageio` like JPEG
  *  - WAV (RIFF/PCM): fmt/data chunk walk, sample-accurate frame count,
  *    per-window RMS-energy features
  *  - PPMS streams (concatenated P6 frames): the video stand-in — frame
  *    boundaries parsed from each frame's own header
  *
  * Unknown bytes degrade to an `application/octet-stream` probe rather than
  * a fake, so the pipeline stays honest about what it could not decode.
  */
object CodecDecoder extends MediaDecoder {

  // ------------------------------------------------------------------- PPM

  final case class Ppm(width: Int, height: Int, pixels: Array[Byte]) {
    def luminance(x: Int, y: Int): Double = {
      val i = (y * width + x) * 3
      0.299 * (pixels(i) & 0xFF) + 0.587 * (pixels(i + 1) & 0xFF) +
        0.114 * (pixels(i + 2) & 0xFF)
    }
  }

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6'

  /** Parse one P6 image starting at `off`; returns the image and the offset
    * just past its pixel data.
    */
  def parsePpm(b: Array[Byte], off: Int = 0): (Ppm, Int) = {
    var i = off
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) b(i) match {
        case c if c == ' ' || c == '\n' || c == '\r' || c == '\t' => i += 1
        case '#' => while (i < b.length && b(i) != '\n') i += 1
        case _ => go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    require(b(i) == 'P' && b(i + 1) == '6', "not a P6 ppm")
    i += 2
    val w = int(); val h = int(); val maxval = int()
    require(maxval == 255, s"only maxval 255 supported: $maxval")
    i += 1 // single whitespace after maxval
    val n = w * h * 3
    require(i + n <= b.length, "truncated ppm")
    (Ppm(w, h, java.util.Arrays.copyOfRange(b, i, i + n)), i + n)
  }

  /** Render a PPM back to bytes. */
  def writePpm(p: Ppm): Array[Byte] = {
    val header = s"P6\n${p.width} ${p.height}\n255\n".getBytes("US-ASCII")
    header ++ p.pixels
  }

  /** Nearest-neighbor resize — a REAL pixel transform. */
  def resizePpm(p: Ppm, newW: Int, newH: Int): Ppm = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * p.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * p.width / newW
        val si = (sy * p.width + sx) * 3
        val di = (y * newW + x) * 3
        out(di) = p.pixels(si); out(di + 1) = p.pixels(si + 1)
        out(di + 2) = p.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Ppm(newW, newH, out)
  }

  /** Mean luminance over a ⌈√dim⌉ grid → `dim` features in [0, 1]. */
  def ppmFeatures(p: Ppm, dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val cx = d % g; val cy = d / g
      val x0 = cx * p.width / g; val x1 = math.max(x0 + 1, (cx + 1) * p.width / g)
      val y0 = cy * p.height / g; val y1 = math.max(y0 + 1, (cy + 1) * p.height / g)
      var acc = 0.0; var n = 0
      var y = y0
      while (y < y1 && y < p.height) {
        var x = x0
        while (x < x1 && x < p.width) { acc += p.luminance(x, y); n += 1; x += 1 }
        y += 1
      }
      out(d) = if (n == 0) 0f else (acc / n / 255.0).toFloat
      d += 1
    }
    out
  }

  /** 64-bit average perceptual hash (aHash): area-mean luminance on an 8×8
    * grid, each cell a bit set iff its mean exceeds the grid's mean. Robust
    * to resizing and mild noise (the threshold is relative), so duplicate
    * images that differ in scale or compression artefacts collide within a
    * few bits — the image analog of SimHash's near-metric property:
    * Hamming(aHash(a), aHash(b)) tracks visual difference. Reuses
    * [[ppmFeatures]]'s grid-mean pass (dim 64 = the 8×8 grid exactly).
    */
  def averageHash(p: Ppm): Long = {
    val cells = ppmFeatures(p, 64)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (cells(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** Letterbox/pillarbox margin scan: the count of uniformly-dark rows at
    * the top and bottom and dark columns at the left and right edges — a
    * row/column is dark when its brightest CHANNEL byte stays ≤ `thresh`
    * (pure integer comparisons, no float luminance). The image-curation
    * crop signal: encoded black bars waste tokens/pixels and skew feature
    * grids, and the margins give the exact crop box. Returns
    * (top, bottom, left, right); an all-dark image reports full-height
    * top and 0 elsewhere (the degenerate case is "all margin").
    */
  def letterboxMargins(p: Ppm, thresh: Int = 24): (Int, Int, Int, Int) = {
    def rowDark(y: Int): Boolean = {
      var x = 0
      while (x < p.width) {
        val i = (y * p.width + x) * 3
        if ((p.pixels(i) & 0xFF) > thresh || (p.pixels(i + 1) & 0xFF) > thresh ||
          (p.pixels(i + 2) & 0xFF) > thresh) return false
        x += 1
      }
      true
    }
    def colDark(x: Int): Boolean = {
      var y = 0
      while (y < p.height) {
        val i = (y * p.width + x) * 3
        if ((p.pixels(i) & 0xFF) > thresh || (p.pixels(i + 1) & 0xFF) > thresh ||
          (p.pixels(i + 2) & 0xFF) > thresh) return false
        y += 1
      }
      true
    }
    var top = 0
    while (top < p.height && rowDark(top)) top += 1
    if (top == p.height) return (p.height, 0, 0, 0)
    var bottom = 0
    while (bottom < p.height - top && rowDark(p.height - 1 - bottom)) bottom += 1
    var left = 0
    while (left < p.width && colDark(left)) left += 1
    var right = 0
    while (right < p.width - left && colDark(p.width - 1 - right)) right += 1
    (top, bottom, left, right)
  }

  // ------------------------------------------------------------------- PNG

  def isPng(b: Array[Byte]): Boolean =
    b.length > 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  // ------------------------------------------------------------------ JPEG

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** (width, height) from the SOF marker — a segment walk over the spec'd
    * layout ([0xFF marker][len][precision][height][width]...), no pixel
    * decode. Standalone markers (RSTn/SOI/EOI/TEM) carry no length field.
    */
  def jpegDims(b: Array[Byte]): (Int, Int) = {
    var i = 2
    while (i + 9 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) i += 1
      else {
        val m = b(i + 1) & 0xFF
        if (m == 0xFF) i += 1 // spec'd fill byte (B.1.1.2), not a marker
        else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          return (be16(b, i + 7), be16(b, i + 5))
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2
        else i += 2 + be16(b, i + 2)
      }
    }
    throw new IllegalArgumentException("no SOF marker found")
  }

  /** Pixel decode for any byte-parseable still format: PPM through the
    * native parser, everything else through [[decodeImage]]'s ImageIO path
    * (which does not speak PPM).
    */
  def decodeStill(b: Array[Byte]): Ppm =
    if (isPpm(b)) parsePpm(b)._1 else decodeImage(b)

  /** Decode JPEG/PNG pixels through the JDK's ImageIO into the PPM pixel
    * model, so the feature grid and resize reuse the same machinery.
    */
  def decodeImage(b: Array[Byte]): Ppm = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, "undecodable image bytes")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = (y * w + x) * 3
        out(i) = ((rgb >> 16) & 0xFF).toByte
        out(i + 1) = ((rgb >> 8) & 0xFF).toByte
        out(i + 2) = (rgb & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Ppm(w, h, out)
  }

  // ------------------------------------------------------------------- WAV

  def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataOff: Int, dataLen: Int) {
    def nSamples: Int = dataLen / (channels * (bitsPerSample / 8))
  }

  /** Walk the RIFF chunks for fmt + data (the spec'd layout; chunks may
    * appear in any order and carry padding).
    */
  def parseWav(b: Array[Byte]): Wav = {
    var i = 12
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b.slice(i, i + 4), "US-ASCII")
      val len = le32(b, i + 4)
      if (id == "fmt ") {
        channels = le16(b, i + 10); rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") { dataOff = i + 8; dataLen = len }
      i += 8 + len + (len & 1)
    }
    require(dataOff >= 0 && channels > 0 && bits > 0, "malformed wav")
    Wav(channels, rate, bits, dataOff, math.min(dataLen, b.length - dataOff))
  }

  /** Per-window RMS energy of channel-0 16-bit samples → `dim` features. */
  def wavFeatures(b: Array[Byte], w: Wav, dim: Int): Array[Float] = {
    require(w.bitsPerSample == 16, "only PCM16 features supported")
    val n = w.nSamples
    val out = new Array[Float](dim)
    val stride = w.channels * 2
    var d = 0
    while (d < dim) {
      val s0 = d * n / dim; val s1 = math.max(s0 + 1, (d + 1) * n / dim)
      var acc = 0.0; var c = 0
      var s = s0
      while (s < s1 && s < n) {
        val off = w.dataOff + s * stride
        val v = (le16(b, off).toShort).toDouble / 32768.0
        acc += v * v; c += 1; s += 1
      }
      out(d) = if (c == 0) 0f else math.sqrt(acc / c).toFloat
      d += 1
    }
    out
  }

  /** Integer sum-of-squares energy of channel-0 PCM16 samples per
    * fixed-length frame (trailing partial frame dropped) — EXACT Long
    * arithmetic (max per-frame energy at 16 bit ≈ samples·2³⁰, far inside
    * int64), so silence classification below is bit-reproducible.
    */
  def energyFrames(b: Array[Byte], w: Wav, samplesPerFrame: Int): Array[Long] = {
    require(w.bitsPerSample == 16, "only PCM16 supported")
    require(samplesPerFrame > 0, "frame must hold at least one sample")
    val stride = w.channels * 2
    val nFrames = w.nSamples / samplesPerFrame
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0L
      var s = f * samplesPerFrame
      val end = s + samplesPerFrame
      while (s < end) {
        val v = le16(b, w.dataOff + s * stride).toShort.toLong
        acc += v * v; s += 1
      }
      out(f) = acc; f += 1
    }
    out
  }

  /** Run-length silence segmentation: frames whose energy is at most
    * `silencePermille`‰ of the LOUDEST frame are silent (relative
    * threshold — gain-invariant, like the audio hash), and consecutive
    * same-class frames merge into `(startFrame, nFrames, isSilent)` runs.
    * All comparisons are exact integer products.
    */
  def silenceRuns(b: Array[Byte], samplesPerFrame: Int,
      silencePermille: Int): Seq[(Int, Int, Boolean)] =
    silenceRuns(b, parseWav(b), samplesPerFrame, silencePermille)

  /** Overload for callers that already parsed the header — one parse per
    * media row on the hot decode path.
    */
  def silenceRuns(b: Array[Byte], w: Wav, samplesPerFrame: Int,
      silencePermille: Int): Seq[(Int, Int, Boolean)] = {
    val e = energyFrames(b, w, samplesPerFrame)
    if (e.isEmpty) return Nil
    val emax = e.max
    // a silent recording (emax = 0) is one all-silent run
    val silent = e.map(x => emax == 0L || x * 1000 <= silencePermille * emax)
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int, Boolean)]()
    var start = 0
    var i = 1
    while (i <= silent.length) {
      if (i == silent.length || silent(i) != silent(start)) {
        runs += ((start, i - start, silent(start)))
        start = i
      }
      i += 1
    }
    runs.toSeq
  }

  /** Clipping scan: counts PCM16 samples at or beyond `clipLevel` absolute
    * amplitude and the LONGEST consecutive clipped run — a sustained
    * full-scale plateau is the audible artifact (a single peak sample is
    * normal program material). Exact integer comparisons over one linear
    * pass; multi-channel audio counts every channel's samples.
    */
  def clippingScan(b: Array[Byte], w: Wav,
      clipLevel: Int = 32700): (Long, Long, Long) = {
    require(w.bitsPerSample == 16, "only PCM16 supported")
    val total = w.nSamples.toLong * w.channels
    var i = 0L
    var clipped = 0L
    var run = 0L
    var maxRun = 0L
    while (i < total) {
      val v = le16(b, w.dataOff + (i * 2).toInt).toShort.toInt
      if (v >= clipLevel || v <= -clipLevel) {
        clipped += 1; run += 1
        if (run > maxRun) maxRun = run
      } else run = 0
      i += 1
    }
    (total, clipped, maxRun)
  }

  /** 64-bit audio fingerprint: RMS energy over 65 equal time windows, each
    * bit the sign of the adjacent-window energy DELTA (rising = 1). Delta
    * signs are invariant to overall volume scaling and robust to mild
    * noise — the energy-contour construction audio fingerprinting
    * (Haitsma-Kalker style) builds on — so re-encoded or gain-adjusted
    * copies land within a few bits and the image path's Hamming-banded
    * near-dup join applies unchanged.
    */
  def audioHash(b: Array[Byte]): Long = {
    val w = parseWav(b)
    val e = wavFeatures(b, w, 65)
    var h = 0L
    var i = 0
    while (i < 64) { if (e(i + 1) > e(i)) h |= (1L << i); i += 1 }
    h
  }

  // ------------------------------------------------------------------- GIF

  def isGif(b: Array[Byte]): Boolean =
    b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Logical screen size from the fixed header (no pixel decode). */
  def gifDims(b: Array[Byte]): (Int, Int) = (le16(b, 6), le16(b, 8))

  /** All GIF frames through the JDK's ImageIO (multi-frame aware). Frames
    * are decoded as stored — no disposal-method compositing — which is the
    * right input for frame-level feature extraction (each frame's own
    * pixels, not the animation's composited state).
    */
  def gifFrames(b: Array[Byte]): Seq[Ppm] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val j = (y * w + x) * 3
            out(j) = ((rgb >> 16) & 0xFF).toByte
            out(j + 1) = ((rgb >> 8) & 0xFF).toByte
            out(j + 2) = (rgb & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        Ppm(w, h, out)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Frame count without decoding pixels. */
  def gifFrameCount(b: Array[Byte]): Int = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try { reader.setInput(iis); reader.getNumImages(true) }
    finally { reader.dispose(); iis.close() }
  }

  // ------------------------------------------------------------ AVI (MJPEG)

  def isAvi(b: Array[Byte]): Boolean =
    b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Parsed AVI: main-header geometry plus the offsets of the video chunks
    * ('00dc'/'00db' — for MJPEG each one is a complete JPEG).
    */
  final case class Avi(width: Int, height: Int, totalFrames: Int,
      frameChunks: Seq[(Int, Int)])

  /** Walk the RIFF tree (spec layout: chunks are [id][size LE32][data],
    * 'LIST' carries a 4-byte list type then subchunks, odd sizes pad one
    * byte) collecting the avih geometry and the movi video chunks.
    */
  def parseAvi(b: Array[Byte]): Avi = {
    var width = 0; var height = 0; var total = 0
    val frames = Seq.newBuilder[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val id = new String(b.slice(i, i + 4), "US-ASCII")
        val len = le32(b, i + 4)
        if (id == "LIST") walk(i + 12, i + 8 + len)
        else if (id == "avih") {
          total = le32(b, i + 8 + 16)
          width = le32(b, i + 8 + 32); height = le32(b, i + 8 + 36)
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += ((i + 8, len))
        }
        i += 8 + len + (len & 1)
      }
    }
    walk(12, b.length)
    val fs = frames.result()
    require(width > 0 && fs.nonEmpty, "malformed avi")
    Avi(width, height, if (total > 0) total else fs.size, fs)
  }

  /** Decode AVI frame `i` (MJPEG chunk → JPEG decode). */
  def aviFrame(b: Array[Byte], avi: Avi, i: Int): Ppm = {
    val (off, len) = avi.frameChunks(math.min(i, avi.frameChunks.size - 1))
    decodeImage(java.util.Arrays.copyOfRange(b, off, off + len))
  }

  /** Minimal MJPEG-AVI writer (RIFF/LIST hdrl+movi layout) — the sink side
    * of the video path, and the generator for round-trip specs.
    */
  def writeAviMjpeg(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
    }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(jpegFrames.size).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0.toShort).putShort(0.toShort).putInt(0)
      .putInt(1).putInt(fps).putInt(0).putInt(jpegFrames.size)
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(width).putInt(height).putShort(1.toShort)
      .putShort(24.toShort).put("MJPG".getBytes("US-ASCII"))
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    // nested lists are rendered bottom-up as byte arrays
    def chunkBytes(id: String, data: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id.getBytes("US-ASCII"))
      val l = data.length
      o.write(l & 0xFF); o.write((l >> 8) & 0xFF)
      o.write((l >> 16) & 0xFF); o.write((l >> 24) & 0xFF)
      o.write(data); if ((l & 1) == 1) o.write(0)
      o.toByteArray
    }
    def listBytes(listType: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val payload = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      chunkBytes("LIST", listType.getBytes("US-ASCII") ++ payload)
    }
    val strl = listBytes("strl",
      Seq(chunkBytes("strh", strh.array()), chunkBytes("strf", strf.array())))
    val hdrl = listBytes("hdrl", Seq(chunkBytes("avih", avih.array()), strl))
    val movi = listBytes("movi", jpegFrames.map(f => chunkBytes("00dc", f)))
    val riffPayload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    tag("RIFF"); w32(riffPayload.length); bos.write(riffPayload)
    bos.toByteArray
  }

  // ------------------------------------------------- PPMS frame container

  /** Parse all concatenated P6 frames (the video stand-in format). */
  def parsePpmStream(b: Array[Byte]): Seq[Ppm] = {
    var off = 0
    val frames = Seq.newBuilder[Ppm]
    while (off < b.length && b(off) == 'P') {
      val (p, next) = parsePpm(b, off)
      frames += p
      off = next
    }
    frames.result()
  }

  // ------------------------------------------------------- decoder contract

  override def probe(kind: String, bytes: Array[Byte]): MediaMetaShape =
    if (isPpm(bytes)) {
      val frames = parsePpmStream(bytes)
      val h = frames.head
      if (frames.size == 1) MediaMetaShape("image/x-portable-pixmap",
        h.width, h.height, 1)
      else MediaMetaShape("video/x-ppm-stream", h.width, h.height, frames.size)
    } else if (isJpeg(bytes)) {
      val (w, h) = jpegDims(bytes)
      MediaMetaShape("image/jpeg", w, h, 1)
    } else if (isPng(bytes)) {
      // IHDR is the first chunk: width/height at fixed offsets 16/20
      MediaMetaShape("image/png", be32(bytes, 16), be32(bytes, 20), 1)
    } else if (isGif(bytes)) {
      val (w, h) = gifDims(bytes)
      val n = gifFrameCount(bytes)
      MediaMetaShape(if (n > 1) "video/gif" else "image/gif", w, h, n)
    } else if (isAvi(bytes)) {
      val a = parseAvi(bytes)
      MediaMetaShape("video/avi", a.width, a.height, a.frameChunks.size)
    } else if (isWav(bytes)) {
      val w = parseWav(bytes)
      MediaMetaShape("audio/wav", 0, 0, w.nSamples)
    } else MediaMetaShape("application/octet-stream", 0, 0, 0)

  override def features(bytes: Array[Byte], dim: Int): Array[Float] =
    if (isPpm(bytes)) ppmFeatures(parsePpmStream(bytes).head, dim)
    else if (isJpeg(bytes) || isPng(bytes)) ppmFeatures(decodeImage(bytes), dim)
    else if (isGif(bytes)) ppmFeatures(gifFrames(bytes).head, dim)
    else if (isAvi(bytes)) {
      val a = parseAvi(bytes); ppmFeatures(aviFrame(bytes, a, 0), dim)
    } else if (isWav(bytes)) { val w = parseWav(bytes); wavFeatures(bytes, w, dim) }
    else new Array[Float](dim)

  override def frameFeatures(bytes: Array[Byte], frame: Int,
      dim: Int): Array[Float] =
    if (isPpm(bytes)) {
      val frames = parsePpmStream(bytes)
      ppmFeatures(frames(math.min(frame, frames.size - 1)), dim)
    } else if (isGif(bytes)) {
      val frames = gifFrames(bytes)
      ppmFeatures(frames(math.min(frame, frames.size - 1)), dim)
    } else if (isAvi(bytes)) {
      val a = parseAvi(bytes)
      ppmFeatures(aviFrame(bytes, a, frame), dim)
    } else features(bytes, dim)
}
