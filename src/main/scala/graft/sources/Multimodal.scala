package graft.sources

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The decode kernels for RIFF/WAVE PCM16 audio and 24-bit BMP images
  * are REAL container parsers — chunk-walking, little-endian field
  * decoding, row padding, bottom-up pixel order — implemented in plain
  * JVM arithmetic (neither format needs a codec). Compressed formats
  * (jpeg/mp3/mp4) would need codecs the container lacks, so payloads
  * with any other mime fall back to a clearly-marked deterministic STUB
  * (byte histogram standing in for "decode then featurize"). Everything
  * around the kernels — schema, typed Dataset, per-partition batching,
  * partition-count preservation — is the real Spark plumbing a
  * production codec drops into. At 100 TB the mapPartitions boundary is
  * where a JNI/FFI decoder amortizes its init cost across a whole
  * partition instead of per row.
  */
object Multimodal extends QueryModule {

  /** A media row: opaque bytes + metadata the pipeline can route on. */
  final case class MediaRecord(
      doc_id: Long,
      content: Array[Byte],
      mime: String,
      n_bytes: Long
  )

  /** Extracted features: fixed-width vector per media item. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      energy: Double,
      histogram: Array[Double]
  )

  /** Wrap the documents table as a media table (utf-8 bytes as payload —
    * the same plumbing carries jpeg/wav/mp4 bytes unchanged).
    */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("content"),
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes")
      )
      .as[MediaRecord]
  }

  /** Batch decode: per-partition iteration so a real decoder initializes
    * once per partition. Routes on mime: RIFF/WAVE PCM16 and BMP24 go
    * through the real container parsers below (energy = RMS sample
    * amplitude / mean pixel luminance, histogram = 16-bin sample /
    * luminance distribution); any other mime falls back to the labeled
    * byte-histogram stub.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder init would happen HERE, once per partition
      it.map { m =>
        val (hist, energy) = m.mime match {
          case "audio/wav" =>
            val (_, samples) = parseWavPcm16(m.content)
            val h = new Array[Double](16)
            var sumSq = 0.0
            samples.foreach { s => h((s + 32768) >> 12) += 1.0; sumSq += s.toDouble * s }
            val n = math.max(samples.length, 1)
            (h.map(_ / n), math.sqrt(sumSq / n))
          case "image/bmp" =>
            val (_, _, pixels) = parseBmp24(m.content)
            val h = new Array[Double](16)
            var lumSum = 0.0
            pixels.foreach { p =>
              val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              h(lum >> 4) += 1.0
              lumSum += lum
            }
            val n = math.max(pixels.length, 1)
            (h.map(_ / n), lumSum / n)
          case _ =>
            fakeDecode(m.content)
        }
        MediaFeatures(m.doc_id, m.n_bytes, energy, hist)
      }
    }
  }

  /** STUB for non-parsable mimes: deterministic 16-bin byte histogram
    * (normalized) + mean byte "energy". A production build routes these
    * mimes to a codec instead.
    */
  private def fakeDecode(bytes: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](16)
    var sum  = 0L
    var i    = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % 16) += 1.0
      sum += (bytes(i) & 0xff)
      i += 1
    }
    val n = math.max(bytes.length, 1)
    (hist.map(_ / n), sum.toDouble / n)
  }

  // ------------------------------------------------------------------
  // RIFF/WAVE PCM16 mono — encode + parse in plain JVM arithmetic.

  /** Standard 44-byte-header mono PCM16 WAV container. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)  // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a mono PCM16 RIFF/WAVE payload by walking the chunk list
    * (word-aligned chunks, not a fixed 44-byte offset, so containers
    * with extra chunks — LIST/INFO etc. — parse too). Returns
    * (sampleRate, samples).
    */
  def parseWavPcm16(b: Array[Byte]): (Int, Array[Int]) = {
    def u32(o: Int): Long =
      (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 | (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
    def u16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var rate    = 0
    var samples = Array.empty[Int]
    var off     = 12
    while (off + 8 <= b.length) {
      val id = tag(off)
      val sz = u32(off + 4).toInt
      // reject corrupt/hostile sizes: a u32 >= 2^31 goes negative after
      // .toInt and sz = -8 would leave `off` unchanged forever; a size
      // past the buffer would read out of bounds. The bound is phrased
      // as subtraction because `off + 8 + sz` can wrap negative for sz
      // near Int.MaxValue and sneak past an additive check (off+8 <=
      // b.length is guaranteed by the loop condition, so the RHS is
      // non-negative and cannot itself overflow).
      require(sz >= 0 && sz <= b.length - off - 8,
        s"corrupt RIFF chunk '$id': size $sz at offset $off exceeds payload (${b.length} bytes)")
      if (id == "fmt ") {
        require(u16(off + 8) == 1, "only PCM supported")
        require(u16(off + 10) == 1, "only mono supported")
        rate = u32(off + 12).toInt
        require(u16(off + 22) == 16, "only 16-bit samples supported")
      } else if (id == "data") {
        val n   = sz / 2
        val out = new Array[Int](n)
        var i   = 0
        while (i < n) {
          out(i) = (u16(off + 8 + i * 2) << 16) >> 16 // sign-extend LE int16
          i += 1
        }
        samples = out
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    (rate, samples)
  }

  // ------------------------------------------------------------------
  // BMP (24-bit uncompressed, bottom-up) — encode + parse.

  /** 24bpp bottom-up BMP with the standard 54-byte header and 4-byte
    * row padding; `px(x, y)` supplies (r, g, b) for the pixel at (x, y)
    * in top-down image coordinates.
    */
  def encodeBmp24(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowBytes  = width * 3
    val pad       = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val bb = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0) // BI_RGB, uncompressed
      .putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = px(x, y)
        bb.put(bl.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var k = 0
      while (k < pad) { bb.put(0.toByte); k += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse a 24bpp uncompressed bottom-up BMP payload: honors the
    * pixel-data offset from the file header and the 4-byte row padding.
    * Returns (width, height, pixels) with pixels packed r<<16|g<<8|b in
    * top-down row-major order.
    */
  def parseBmp24(b: Array[Byte]): (Int, Int, Array[Int]) = {
    def i32(o: Int): Int =
      (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 | (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
    def u16(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte, "not a BMP payload")
    val dataOff = i32(10)
    val width   = i32(18)
    val height  = i32(22)
    require(u16(28) == 24, "only 24bpp supported")
    require(i32(30) == 0, "only uncompressed (BI_RGB) supported")
    require(height > 0, "top-down (negative-height) BMPs unsupported")
    val rowBytes = width * 3
    val pad      = (4 - rowBytes % 4) % 4
    val pixels   = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var p = dataOff + (height - 1 - y) * (rowBytes + pad) // bottom-up rows
      var x = 0
      while (x < width) {
        pixels(y * width + x) =
          (b(p + 2) & 0xff) << 16 | (b(p + 1) & 0xff) << 8 | (b(p) & 0xff)
        p += 3
        x += 1
      }
      y += 1
    }
    (width, height, pixels)
  }

  // ------------------------------------------------------------------
  // Deterministic media generators: real WAV/BMP containers whose
  // samples/pixels derive from closed-form arithmetic over doc_id, so
  // the DuckDB oracle can recompute the decoded features without
  // parsing bytes — a hash match proves the encode -> parse round trip
  // is byte-exact.

  /** One mono PCM16 WAV per document: n = 120 + doc_id % 80 samples,
    * sample(i) = ((doc_id*7919 + i*104729) % 65536) - 32768, 8 kHz.
    */
  def wavTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val n = (120 + id % 80).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 7919L + i.toLong * 104729L) % 65536L) - 32768L).toShort
      }
      val bytes = encodeWavPcm16(samples, 8000)
      MediaRecord(id, bytes, "audio/wav", bytes.length.toLong)
    }
  }

  /** One 24bpp BMP per document: (8 + doc_id%8) x (4 + doc_id%4) so the
    * row padding varies 0-3 bytes across docs, channel(x, y) formulas
    * below.
    */
  def bmpTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 8).toInt
      val h = (4 + id % 4).toInt
      val bytes = encodeBmp24(w, h, (x, y) => (
        ((id * 3 + x + 11L * y) % 256).toInt,
        ((id * 2 + 5L * x + y) % 256).toInt,
        ((id + 3L * x + 7L * y) % 256).toInt
      ))
      MediaRecord(id, bytes, "image/bmp", bytes.length.toLong)
    }
  }

  /** Integer decoded-audio features (exact, oracle-checkable). */
  final case class WavDecoded(
      doc_id: Long, sample_rate: Int, n_samples: Long,
      sample_sum: Long, sample_sumsq: Long)

  /** Integer decoded-image features (exact, oracle-checkable). */
  final case class BmpDecoded(
      doc_id: Long, width: Long, height: Long,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** Decode WAV payloads to exact integer PCM statistics. */
  def wavFeatures(media: Dataset[MediaRecord]): Dataset[WavDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (rate, samples) = parseWavPcm16(m.content)
        var sum   = 0L
        var sumSq = 0L
        samples.foreach { s => sum += s; sumSq += s.toLong * s }
        WavDecoded(m.doc_id, rate, samples.length.toLong, sum, sumSq)
      }
    }
  }

  /** Decode BMP payloads to exact integer channel statistics. */
  def bmpFeatures(media: Dataset[MediaRecord]): Dataset[BmpDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, pixels) = parseBmp24(m.content)
        var rs = 0L; var gs = 0L; var bs = 0L
        pixels.foreach { p =>
          rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
        }
        BmpDecoded(m.doc_id, w.toLong, h.toLong, rs, gs, bs)
      }
    }
  }

  /** 8-bit average-hash (aHash) signature of a decoded image. */
  final case class BmpHashed(doc_id: Long, width: Long, height: Long, phash: Int)

  /** Perceptual hash from DECODED pixels: integer luminance
    * lum = r + 2g + b over a 4x2 block grid (block of (x, y) is
    * bx = 4x div w, by = 2y div h), bit (by*4 + bx) set iff the
    * block's mean luminance exceeds the image mean — compared by exact
    * cross-multiplication (block_sum * n_pixels > total_sum * block_n)
    * so there is no division and the oracle replays it in integers.
    * Runs in the same mapPartitions codec boundary as the other
    * decoders.
    */
  def bmpAHash(media: Dataset[MediaRecord]): Dataset[BmpHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = parseBmp24(m.content)
        BmpHashed(m.doc_id, w.toLong, h.toLong, aHashFromPixels(w, h, px))
      }
    }
  }

  /** The container-agnostic aHash kernel over decoded top-down
    * row-major packed pixels — shared by the BMP (q145) and PNG (q195)
    * paths so the signature is a property of the IMAGE, not of the
    * container it arrived in (PngCodecSpec asserts the cross-container
    * equality).
    */
  private[sources] def aHashFromPixels(w: Int, h: Int, px: Array[Int]): Int = {
    val bs = new Array[Long](8)
    val bn = new Array[Long](8)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p   = px(y * w + x)
        val lum = ((p >> 16) & 0xff).toLong + 2L * ((p >> 8) & 0xff) + (p & 0xff)
        val bi  = (y * 2 / h) * 4 + (x * 4 / w)
        bs(bi) += lum
        bn(bi) += 1
        total += lum
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hash = 0
    var i = 0
    while (i < 8) {
      if (bs(i) * n > total * bn(i)) hash |= 1 << i
      i += 1
    }
    hash
  }

  /** Grid-mean feature kernel over decoded pixels: the 8 aHash grid
    * cells' MEAN luminances as a float vector — the dims-invariant
    * "embedding" the q316 image near-dup rides. Means (not the aHash's
    * above/below-average BITS) survive re-rendering exactly: a k×
    * pixel-duplication upscale scales every cell's sum and count by k²,
    * and (k²·bs)/(k²·bn) is bit-equal to bs/bn in IEEE arithmetic, so a
    * re-render's feature vector is IDENTICAL while its (w, h, phash)
    * key — the q145/q261 dedup grain — structurally differs. Double
    * means narrow to FLOAT (the q45/q86 cross-engine discipline).
    */
  private[sources] def gridMeansFromPixels(w: Int, h: Int, px: Array[Int]): Array[Float] = {
    val bs = new Array[Long](8)
    val bn = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p   = px(y * w + x)
        val lum = ((p >> 16) & 0xff).toLong + 2L * ((p >> 8) & 0xff) + (p & 0xff)
        val bi  = (y * 2 / h) * 4 + (x * 4 / w)
        bs(bi) += lum
        bn(bi) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(8)(i => (bs(i).toDouble / bn(i)).toFloat)
  }

  // ------------------------------------------------------------------
  // PNG (8-bit truecolor RGB, non-interlaced) — encode + parse in pure
  // JVM: java.util.zip Deflater/Inflater for the zlib stream, CRC32 for
  // chunk integrity, and the five PNG filter predictors (None/Sub/Up/
  // Average/Paeth) implemented by hand. This is the compressed
  // real-world image format the codec boundary was missing: unlike
  // BMP's raw pixels, the scanlines here round-trip through real
  // DEFLATE compression and per-row filter reconstruction.

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p  = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(bb: java.nio.ByteBuffer, chunkType: String, data: Array[Byte]): Unit = {
    bb.putInt(data.length)
    val t = chunkType.getBytes("US-ASCII")
    bb.put(t)
    bb.put(data)
    val crc = new java.util.zip.CRC32
    crc.update(t)
    crc.update(data)
    bb.putInt(crc.getValue.toInt)
  }

  /** Real PNG writer: 8-bit RGB (color type 2), non-interlaced, one
    * zlib-deflated IDAT. `filterOfRow` picks each scanline's filter
    * type (0-4) so a generated corpus can exercise EVERY predictor the
    * decoder must reconstruct.
    */
  def encodePng(
      width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int),
      filterOfRow: Int => Int
  ): Array[Byte] = {
    val stride = width * 3
    // raw top-down scanlines
    val raw = Array.ofDim[Int](height, stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        raw(y)(x * 3) = r & 0xff; raw(y)(x * 3 + 1) = g & 0xff; raw(y)(x * 3 + 2) = b & 0xff
        x += 1
      }
      y += 1
    }
    // filtered scanline stream: per row a filter-type byte + residuals
    val scan = new Array[Byte](height * (1 + stride))
    y = 0
    while (y < height) {
      val ft = filterOfRow(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      scan(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = raw(y)(i)
        val a = if (i >= 3) raw(y)(i - 3) else 0
        val b = if (y >= 1) raw(y - 1)(i) else 0
        val c = if (i >= 3 && y >= 1) raw(y - 1)(i - 3) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        scan(y * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    // zlib-deflate the scanline stream
    val deflater = new java.util.zip.Deflater
    deflater.setInput(scan)
    deflater.finish()
    val cbuf = new Array[Byte](scan.length + 64)
    var clen = 0
    while (!deflater.finished()) {
      val n = deflater.deflate(cbuf, clen, cbuf.length - clen)
      clen += n
      require(clen < cbuf.length || deflater.finished(), "deflate buffer overflow")
    }
    deflater.end()
    val idat = java.util.Arrays.copyOf(cbuf, clen)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte)  // compression: deflate
      .put(0.toByte)  // filter method 0
      .put(0.toByte)  // non-interlaced
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + (12 + idat.length) + 12)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    pngChunk(bb, "IHDR", ihdr.array())
    pngChunk(bb, "IDAT", idat)
    pngChunk(bb, "IEND", Array.empty[Byte])
    bb.array()
  }

  /** Parse an 8-bit RGB non-interlaced PNG: signature check, chunk walk
    * with CRC32 verification on EVERY chunk (a flipped bit anywhere in
    * type or data quarantines the file), multi-IDAT concatenation,
    * zlib inflate, then per-scanline reconstruction through the five
    * filter predictors. Returns (width, height, pixels) packed
    * r<<16|g<<8|b in top-down row-major order — the same contract as
    * [[parseBmp24]], so downstream kernels are container-agnostic.
    */
  def parsePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val b = bytes
    def i32(o: Int): Int =
      (b(o) & 0xff) << 24 | (b(o + 1) & 0xff) << 16 | (b(o + 2) & 0xff) << 8 | (b(o + 3) & 0xff)
    require(b.length >= 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte &&
      b(4) == 0x0d.toByte && b(5) == 0x0a.toByte && b(6) == 0x1a.toByte && b(7) == 0x0a.toByte,
      "not a PNG payload")
    var off = 8
    var width = -1
    var height = -1
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream
    while (off < b.length && !sawIend) {
      require(b.length - off >= 12, s"truncated chunk header at offset $off")
      val sz = i32(off)
      require(sz >= 0 && sz <= b.length - off - 12,
        s"corrupt PNG chunk: size $sz at offset $off exceeds payload (${b.length} bytes)")
      val chunkType = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(b, off + 4, 4 + sz)
      require(crc.getValue.toInt == i32(off + 8 + sz),
        s"CRC mismatch in $chunkType chunk at offset $off")
      chunkType match {
        case "IHDR" =>
          require(sz == 13, s"IHDR size $sz")
          width = i32(off + 8)
          height = i32(off + 12)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require((b(off + 16) & 0xff) == 8, "only 8-bit depth supported")
          require((b(off + 17) & 0xff) == 2, "only truecolor RGB supported")
          require((b(off + 18) & 0xff) == 0, "bad compression method")
          require((b(off + 19) & 0xff) == 0, "bad filter method")
          require((b(off + 20) & 0xff) == 0, "interlaced PNGs unsupported")
        case "IDAT" => idat.write(b, off + 8, sz)
        case "IEND" => sawIend = true
        case _      => () // ancillary chunk — CRC already verified
      }
      off += 12 + sz
    }
    require(width > 0, "missing IHDR")
    require(sawIend, "missing IEND")
    // A crafted header claiming huge dimensions would force a multi-GB
    // allocation here before the inflate even starts — and the resulting
    // OutOfMemoryError is not NonFatal, so it would fail the job instead
    // of quarantining the record. Bound the scanline buffer by what the
    // compressed payload could possibly inflate to (zlib's theoretical
    // maximum expansion is ~1032:1) BEFORE allocating anything sized from
    // header-claimed dimensions; the long arithmetic also keeps a huge
    // claimed width from overflowing `width * 3`.
    val scanLenL = height.toLong * (1L + 3L * width)
    require(scanLenL <= 1032L * idat.size() + 4096L,
      s"claimed dimensions ${width}x$height ($scanLenL raw bytes) exceed " +
        s"what the ${idat.size()}-byte compressed payload could inflate to")
    // zlib inflate the concatenated IDAT stream
    val stride = width * 3
    val scan = new Array[Byte](scanLenL.toInt)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < scan.length && !inflater.finished()) {
        val n = inflater.inflate(scan, got, scan.length - got)
        require(n > 0 || inflater.finished(), "truncated or corrupt zlib stream")
        got += n
      }
    } finally inflater.end()
    require(got == scan.length, s"inflated $got bytes, expected ${scan.length}")
    // reconstruct scanlines through the five filter predictors
    val pixels = new Array[Int](width * height)
    var prev = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val base = y * (1 + stride)
      val ft = scan(base) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      val cur = new Array[Int](stride)
      var i = 0
      while (i < stride) {
        val x = scan(base + 1 + i) & 0xff
        val a = if (i >= 3) cur(i - 3) else 0
        val up = prev(i)
        val c = if (i >= 3) prev(i - 3) else 0
        cur(i) = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (a + up) / 2) & 0xff
          case 4 => (x + paeth(a, up, c)) & 0xff
        }
        i += 1
      }
      var px = 0
      while (px < width) {
        pixels(y * width + px) = cur(px * 3) << 16 | cur(px * 3 + 1) << 8 | cur(px * 3 + 2)
        px += 1
      }
      prev = cur
      y += 1
    }
    (width, height, pixels)
  }

  /** One PNG per document with the SAME dimensions and channel formulas
    * as [[bmpTable]] (so the decoded pixels — and therefore the aHash —
    * are identical across containers), with the scanline filter type
    * cycling (doc_id + y) % 5 so the corpus exercises every predictor.
    * Documents with doc_id % 41 == 0 ship CORRUPT payloads — alternately
    * truncated mid-header and CRC-flipped on the final chunk — the
    * crawl-reality fixture the quarantine path must absorb (the q108
    * discipline applied to binary media).
    */
  def pngTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val w = (8 + id % 8).toInt
      val h = (4 + id % 4).toInt
      val bytes = encodePng(w, h, (x, y) => (
        ((id * 3 + x + 11L * y) % 256).toInt,
        ((id * 2 + 5L * x + y) % 256).toInt,
        ((id + 3L * x + 7L * y) % 256).toInt
      ), y => ((id + y) % 5).toInt)
      val payload =
        if (id % 41 != 0) bytes
        else if ((id / 41) % 2 == 0) java.util.Arrays.copyOf(bytes, 20) // truncated mid-IHDR
        else { val c = bytes.clone(); c(c.length - 1) = (c(c.length - 1) ^ 0x01).toByte; c } // IEND CRC flip
      MediaRecord(id, payload, "image/png", payload.length.toLong)
    }
  }

  /** PNG aHash with quarantine: a payload that fails ANY decode
    * invariant (signature, chunk bounds, CRC, zlib, filter types,
    * scanline count) lands in status='quarantined' with null features
    * instead of failing the job — corrupt crawl bytes are data, not
    * exceptions (the q108 rule at the codec boundary).
    */
  final case class PngHashed(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], phash: Option[Int])

  def pngAHash(media: Dataset[MediaRecord]): Dataset[PngHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val (w, h, px) = parsePng(m.content)
          PngHashed(m.doc_id, "ok", Some(w.toLong), Some(h.toLong),
            Some(aHashFromPixels(w, h, px)))
        } catch {
          case scala.util.control.NonFatal(_) =>
            PngHashed(m.doc_id, "quarantined", None, None, None)
        }
      }
    }
  }

  /** 8-bit audio energy fingerprint from decoded PCM. */
  final case class WavHashed(doc_id: Long, n_samples: Long, fp: Int)

  /** Audio fingerprint from DECODED samples: the signal is cut into 8
    * sample blocks (block of sample i is 8i div n), bit b set iff the
    * block's mean energy (sum of squared samples) exceeds the signal
    * mean — the same division-free cross-multiplication as the image
    * aHash, exact in 64-bit (|sample| ≤ 2^15, ≤ 200 samples). The
    * audio member of the perceptual-dedup pair (q145 is the image
    * one).
    */
  def wavEnergyHash(media: Dataset[MediaRecord]): Dataset[WavHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (_, samples) = parseWavPcm16(m.content)
        val n  = samples.length
        val es = new Array[Long](8)
        val bn = new Array[Long](8)
        var total = 0L
        var i = 0
        while (i < n) {
          val s  = samples(i).toLong
          val e  = s * s
          val bi = i * 8 / n
          es(bi) += e
          bn(bi) += 1
          total += e
          i += 1
        }
        var fp = 0
        var b = 0
        while (b < 8) {
          if (es(b) * n > total * bn(b)) fp |= 1 << b
          b += 1
        }
        WavHashed(m.doc_id, n.toLong, fp)
      }
    }
  }

  /** Byte-window sampler: every `stride`-th byte window as a "frame".
    * The format-agnostic path — it never decodes, so it applies to any
    * opaque payload (useful for chunked hashing / shipping); decoded,
    * sample-aligned framing is [[wavFrameSample]].
    */
  def frameSample(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .flatMap { m =>
        m.content.grouped(stride).zipWithIndex.map { case (frame, idx) =>
          (m.doc_id, idx, frame.length.toLong)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** One analysis frame of decoded PCM audio: exact integer moments of
    * the samples in [frame_idx*hop, frame_idx*hop + frameLen).
    */
  final case class WavFrame(
      doc_id: Long, frame_idx: Int, n_samples: Int,
      sample_sum: Long, sample_sumsq: Long)

  /** Sample-aligned audio framing: decode the PCM16 container, then cut
    * overlapping analysis windows of `frameLen` samples every `hop`
    * samples (the standard STFT-style framing; hop < frameLen gives
    * overlap). Frames start while their offset is inside the signal, and
    * the tail frame is short rather than zero-padded, so frame counts
    * and per-frame energy (sum of squares) are exact integer arithmetic
    * an oracle can replay. Runs in the same mapPartitions boundary as
    * the other decoders — one decoder init per partition, frames emitted
    * per row via the iterator (never materializing a per-partition list).
    */
  def wavFrameSample(media: Dataset[MediaRecord], frameLen: Int, hop: Int): Dataset[WavFrame] = {
    require(frameLen > 0 && hop > 0, "frameLen and hop must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val (_, samples) = parseWavPcm16(m.content)
        val nFrames = (samples.length + hop - 1) / hop
        (0 until nFrames).iterator.map { f =>
          val start = f * hop
          val end   = math.min(start + frameLen, samples.length)
          var sum = 0L
          var sq  = 0L
          var i   = start
          while (i < end) {
            val s = samples(i)
            sum += s
            sq += s.toLong * s
            i += 1
          }
          WavFrame(m.doc_id, f, end - start, sum, sq)
        }
      }
    }
  }

  override def queries: Map[String, QueryDef] = Map(
    // Metadata path: typed binary column + portable fingerprint. Oracle-
    // checkable because md5/octet_length agree across engines on the
    // identical bytes.
    "q38_multimodal_meta" -> QueryDef(
      fn = (s, d) =>
        asMediaTable(s, d).toDF()
          .select(
            col("doc_id"),
            col("mime"),
            col("n_bytes"),
            md5(col("content")).as("content_md5")
          ),
      oracle = Some("""
        SELECT doc_id, 'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents""")
    ),

    // Feature-extraction path through mapPartitions (typed Dataset). The
    // histogram/energy kernel is the documented stub. The projection
    // multiplies the kernel's normalized outputs back by n_bytes and
    // rounds to long: energy*n recovers the exact byte sum and hist[0]*n
    // the exact mod-16==0 count (error < 0.5 ulp for sums < 2^53), which
    // makes the mapPartitions path fully oracle-checkable — DuckDB
    // recomputes both from the utf-8 bytes (corpus is ASCII, so
    // ord(char) == byte).
    "q39_multimodal_features" -> QueryDef(
      fn = (s, d) =>
        decodeFeatures(asMediaTable(s, d)).toDF()
          .select(
            col("doc_id"),
            col("n_bytes"),
            round(col("energy") * col("n_bytes")).cast("long").as("byte_sum"),
            round(element_at(col("histogram"), 1) * col("n_bytes"))
              .cast("long").as("hist0_cnt")
          ),
      oracle = Some("""
        WITH codes AS (
          SELECT doc_id,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 ord(substr(text,
                   CAST(unnest(range(1, length(text) + 1)) AS INT), 1)) AS c
          FROM documents
        )
        SELECT doc_id, n_bytes,
               CAST(SUM(c) AS BIGINT) AS byte_sum,
               CAST(SUM(CASE WHEN c % 16 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hist0_cnt
        FROM codes
        GROUP BY doc_id, n_bytes""")
    ),

    // Frame-sampling path: every stride-th byte window of the payload as
    // a "frame" row (the video/audio sampling shape — a real decoder
    // emits decoded frames at the same boundaries). Fully
    // oracle-checkable: frame count and sizes are arithmetic over
    // octet_length.
    "q61_frame_sample" -> QueryDef(
      fn = (s, d) => frameSample(asMediaTable(s, d), stride = 64),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
          FROM documents),
        f AS (
          SELECT doc_id, n,
                 unnest(range(0, CAST(CEIL(CAST(n AS DOUBLE) / 64) AS BIGINT)))
                   AS frame_idx
          FROM d)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(LEAST(64, n - frame_idx * 64) AS BIGINT) AS frame_bytes
        FROM f""")
    ),

    // Real audio decode: the generator writes genuine RIFF/WAVE PCM16
    // containers (samples are closed-form arithmetic over doc_id), the
    // query chunk-walks and sign-extends them back out, and the oracle
    // recomputes the statistics from the same closed form — a hash
    // match proves the encode -> parse round trip is byte-exact.
    "q69_wav_decode" -> QueryDef(
      fn = (s, d) => wavFeatures(wavTable(s, d)).toDF(),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 120 + doc_id % 80 AS n FROM documents),
        idx AS (
          SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        s AS (
          SELECT doc_id, n,
                 ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS smp
          FROM idx)
        SELECT doc_id, 8000 AS sample_rate, n AS n_samples,
               CAST(SUM(smp) AS BIGINT) AS sample_sum,
               CAST(SUM(smp * smp) AS BIGINT) AS sample_sumsq
        FROM s GROUP BY doc_id, n""")
    ),

    // Real image decode: genuine 24bpp bottom-up BMPs with per-doc
    // varying row padding (width % 4 covers all four pad sizes); the
    // parser honors the header's pixel-data offset, the padding, and
    // the bottom-up row order, and the oracle recomputes the channel
    // sums from the pixel formulas.
    "q70_bmp_decode" -> QueryDef(
      fn = (s, d) => bmpFeatures(bmpTable(s, d)).toDF(),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 8 + doc_id % 8 AS w, 4 + doc_id % 4 AS h
          FROM documents),
        xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
        SELECT doc_id, w AS width, h AS height,
               CAST(SUM((doc_id * 3 + x + 11 * y) % 256) AS BIGINT) AS r_sum,
               CAST(SUM((doc_id * 2 + 5 * x + y) % 256) AS BIGINT) AS g_sum,
               CAST(SUM((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS b_sum
        FROM px GROUP BY doc_id, w, h""")
    ),

    // IMAGE NEAR-DUP via perceptual hash — multimodal dedup, the
    // missing member of the dedup family (q31-q34 are text-grain): an
    // 8-bit average-hash over DECODED pixels (the real BMP parser, the
    // real codec boundary), then hash-grouped keep-first exactly like
    // exact text dedup. The generated corpus contains true duplicate
    // images by construction (doc_id and doc_id+256 render identical
    // pixels at identical dimensions — every channel formula is mod
    // 256), so the gate proves real collisions collapse and distinct
    // images do not. The oracle replays luminance, the 4x2 block grid,
    // and the division-free mean comparison in closed form. Scale:
    // decode is one mapPartitions pass; grouping is one hash aggregate
    // on (dims, hash) — linear, no pair joins.
    "q145_image_phash_dedup" -> QueryDef(
      fn = (s, d) => {
        // checkpoint the doc-grain hash table: it feeds both the
        // keeper aggregate and the join probe, and the encode+decode
        // pass it truncates is the query's dominant cost
        val hashed = bmpAHash(bmpTable(s, d)).toDF().localCheckpoint(true)
        val keep = hashed
          .groupBy(col("width"), col("height"), col("phash"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
        hashed
          .join(keep, Seq("width", "height", "phash"))
          .select(
            col("doc_id"), col("width"), col("height"), col("phash"),
            col("keeper_id"), col("group_n"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 8 + doc_id % 8 AS w, 4 + doc_id % 4 AS h
          FROM documents),
        xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        pxg AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        lums AS (
          SELECT doc_id, w, h,
                 (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 (doc_id * 3 + x + 11 * y) % 256
                   + 2 * ((doc_id * 2 + 5 * x + y) % 256)
                   + (doc_id + 3 * x + 7 * y) % 256 AS lum
          FROM pxg),
        blocks AS (
          SELECT doc_id, w, h, bi,
                 CAST(SUM(lum) AS BIGINT) AS bs, COUNT(*) AS bn
          FROM lums GROUP BY doc_id, w, h, bi),
        tot AS (
          SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts, CAST(SUM(bn) AS BIGINT) AS n
          FROM blocks GROUP BY doc_id),
        hashes AS (
          SELECT b.doc_id, b.w, b.h,
                 CAST(SUM(CASE WHEN b.bs * t.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS phash
          FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id, b.w, b.h),
        keep AS (
          SELECT w, h, phash, MIN(doc_id) AS keeper_id, COUNT(*) AS group_n
          FROM hashes GROUP BY w, h, phash)
        SELECT hs.doc_id, hs.w AS width, hs.h AS height, hs.phash,
               k.keeper_id, k.group_n, hs.doc_id <> k.keeper_id AS is_dup
        FROM hashes hs
        JOIN keep k ON k.w = hs.w AND k.h = hs.h AND k.phash = hs.phash"""),
    ),

    // PNG DECODE + QUARANTINE + PERCEPTUAL DEDUP — the compressed
    // real-world image format through the same codec boundary: genuine
    // PNGs (zlib DEFLATE via java.util.zip, CRC32-checked chunks,
    // scanline filters cycling through all five predictors per
    // (doc_id + row) % 5), decoded by hand-rolled filter
    // reconstruction, routed into the q145 aHash dedup. The corpus
    // ships deterministically CORRUPT payloads (doc_id % 41 == 0 —
    // alternately truncated and CRC-flipped) that must land in the
    // quarantine lane, not fail the job. The oracle replays the clean
    // docs' pixel closed forms (identical to q145's — the pixels, and
    // so the hashes, are container-independent) and the corruption
    // predicate; a hash match proves signature/CRC/inflate/unfilter
    // are all byte-exact AND that quarantine catches exactly the
    // corrupt slice. Scale: one mapPartitions decode pass, one
    // (dims, hash) aggregate — linear, no pairs.
    "q195_png_phash_dedup" -> QueryDef(
      fn = (s, d) => {
        // one decode pass feeds the keeper aggregate, the join probe,
        // and the quarantine lane — checkpoint like q145
        val hashed = pngAHash(pngTable(s, d)).toDF().localCheckpoint(true)
        val ok = hashed.where(col("status") === "ok")
        val keep = ok
          .groupBy(col("width"), col("height"), col("phash"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
        ok.join(keep, Seq("width", "height", "phash"))
          .select(
            col("doc_id"), col("status"), col("width"), col("height"), col("phash"),
            col("keeper_id"), col("group_n"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))
          .unionByName(
            hashed.where(col("status") === "quarantined")
              .select(
                col("doc_id"), col("status"), col("width"), col("height"), col("phash"),
                lit(null).cast("long").as("keeper_id"),
                lit(null).cast("long").as("group_n"),
                lit(null).cast("boolean").as("is_dup")))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 8 + doc_id % 8 AS w, 4 + doc_id % 4 AS h
          FROM documents WHERE doc_id % 41 <> 0),
        xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        pxg AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        lums AS (
          SELECT doc_id, w, h,
                 (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 (doc_id * 3 + x + 11 * y) % 256
                   + 2 * ((doc_id * 2 + 5 * x + y) % 256)
                   + (doc_id + 3 * x + 7 * y) % 256 AS lum
          FROM pxg),
        blocks AS (
          SELECT doc_id, w, h, bi,
                 CAST(SUM(lum) AS BIGINT) AS bs, COUNT(*) AS bn
          FROM lums GROUP BY doc_id, w, h, bi),
        tot AS (
          SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts, CAST(SUM(bn) AS BIGINT) AS n
          FROM blocks GROUP BY doc_id),
        hashes AS (
          SELECT b.doc_id, b.w, b.h,
                 CAST(SUM(CASE WHEN b.bs * t.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS phash
          FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id, b.w, b.h),
        keep AS (
          SELECT w, h, phash, MIN(doc_id) AS keeper_id, COUNT(*) AS group_n
          FROM hashes GROUP BY w, h, phash)
        SELECT hs.doc_id, 'ok' AS status,
               hs.w AS width, hs.h AS height, hs.phash,
               k.keeper_id, k.group_n, hs.doc_id <> k.keeper_id AS is_dup
        FROM hashes hs
        JOIN keep k ON k.w = hs.w AND k.h = hs.h AND k.phash = hs.phash
        UNION ALL
        SELECT doc_id, 'quarantined' AS status,
               CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
               CAST(NULL AS INTEGER) AS phash,
               CAST(NULL AS BIGINT) AS keeper_id, CAST(NULL AS BIGINT) AS group_n,
               CAST(NULL AS BOOLEAN) AS is_dup
        FROM documents WHERE doc_id % 41 = 0"""),
    ),

    // BASELINE JPEG DECODE + QUARANTINE + PERCEPTUAL DEDUP — the third
    // real container through the codec boundary (BMP raw, PNG DEFLATE,
    // now JPEG entropy coding): genuine baseline JPEGs (marker stream,
    // canonical DHT Huffman tables, byte-stuffed entropy data, zigzag/
    // run-length ACs, dequant + IDCT), decoded by the hand-rolled
    // JpegCodec and routed into the q145 aHash dedup. The corpus is
    // constant-8×8-tile images, whose DCT is DC-only and losslessly
    // quantized BY CONSTRUCTION (JpegCodec scaladoc) — so even though
    // JPEG is lossy in general, the gate here is bit-exact: the oracle
    // replays the closed-form tile pixels and the hash must match.
    // Corrupt slice (doc_id % 43 == 0 — alternately truncated and
    // rewritten to an arithmetic-coded SOF9 frame) must quarantine.
    "q261_jpeg_phash_dedup" -> QueryDef(
      fn = (s, d) => {
        val hashed = JpegCodec.jpegAHash(JpegCodec.jpegTable(s, d))
          .toDF().localCheckpoint(true)
        val ok = hashed.where(col("status") === "ok")
        val keep = ok
          .groupBy(col("width"), col("height"), col("phash"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
        ok.join(keep, Seq("width", "height", "phash"))
          .select(
            col("doc_id"), col("status"), col("width"), col("height"), col("phash"),
            col("keeper_id"), col("group_n"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))
          .unionByName(
            hashed.where(col("status") === "quarantined")
              .select(
                col("doc_id"), col("status"), col("width"), col("height"), col("phash"),
                lit(null).cast("long").as("keeper_id"),
                lit(null).cast("long").as("group_n"),
                lit(null).cast("boolean").as("is_dup")))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
          FROM documents WHERE doc_id % 43 <> 0),
        xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        pxg AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        lums AS (
          SELECT doc_id, w, h,
                 (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 4 * ((doc_id * 5 + 7 * (x // 8) + 11 * (y // 8)) % 256) AS lum
          FROM pxg),
        blocks AS (
          SELECT doc_id, w, h, bi,
                 CAST(SUM(lum) AS BIGINT) AS bs, COUNT(*) AS bn
          FROM lums GROUP BY doc_id, w, h, bi),
        tot AS (
          SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts, CAST(SUM(bn) AS BIGINT) AS n
          FROM blocks GROUP BY doc_id),
        hashes AS (
          SELECT b.doc_id, b.w, b.h,
                 CAST(SUM(CASE WHEN b.bs * t.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS phash
          FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id, b.w, b.h),
        keep AS (
          SELECT w, h, phash, MIN(doc_id) AS keeper_id, COUNT(*) AS group_n
          FROM hashes GROUP BY w, h, phash)
        SELECT hs.doc_id, 'ok' AS status,
               hs.w AS width, hs.h AS height, hs.phash,
               k.keeper_id, k.group_n, hs.doc_id <> k.keeper_id AS is_dup
        FROM hashes hs
        JOIN keep k ON k.w = hs.w AND k.h = hs.h AND k.phash = hs.phash
        UNION ALL
        SELECT doc_id, 'quarantined' AS status,
               CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
               CAST(NULL AS INTEGER) AS phash,
               CAST(NULL AS BIGINT) AS keeper_id, CAST(NULL AS BIGINT) AS group_n,
               CAST(NULL AS BOOLEAN) AS is_dup
        FROM documents WHERE doc_id % 43 = 0"""),
    ),

    // VIDEO FRAME-SAMPLE DEDUP + QUARANTINE — the video member of the
    // multimodal family: an MJPEG-style container (length-prefixed
    // baseline-JPEG frames, see [[VideoContainer]]) is parsed at the
    // mapPartitions codec boundary, every 2nd frame is SAMPLED and
    // decoded through the q261 JPEG path, per-frame aHashes roll up
    // into an exact integer video fingerprint (Σ (phash+1)·2^(9f) over
    // sampled frames — 9 bits per slot, ≤ 4 frames, overflow-free
    // BIGINT), and videos dedup at (dims, frame count, fingerprint)
    // grain — the sample-frames → hash → near-dup shape a corpus
    // pipeline runs over video shards. Corrupt containers (doc_id % 41
    // == 0 — alternately truncated mid-frame and magic-corrupted) must
    // quarantine WHOLE (a container whose sampled frames don't all
    // decode is untrustworthy at any frame). Scale: one decode map
    // pass over sampled frames only (stride cuts decode cost, the
    // whole point of sampling); the only shuffle is the (video)-grain
    // fingerprint aggregate + the tiny keeper join.
    "q308_video_frame_dedup" -> QueryDef(
      fn = (s, d) => {
        val hashed = VideoContainer
          .sampledFrameHashes(VideoContainer.videoTable(s, d), stride = 2)
          .toDF().localCheckpoint(true)
        val ok = hashed.where(col("status") === "ok")
        val vids = ok
          .groupBy(col("doc_id"), col("width"), col("height"), col("n_frames"))
          .agg(
            count(lit(1)).as("n_sampled"),
            sum(expr("shiftleft(CAST(phash + 1 AS BIGINT), 9 * frame_idx)"))
              .as("fp"))
        val keep = vids
          .groupBy(col("width"), col("height"), col("n_frames"), col("fp"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
        vids.join(keep, Seq("width", "height", "n_frames", "fp"))
          .select(
            col("doc_id"), lit("ok").as("status"), col("width"), col("height"),
            col("n_frames"), col("n_sampled"), col("fp"),
            col("keeper_id"), col("group_n"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))
          .unionByName(
            hashed.where(col("status") === "quarantined")
              .select(
                col("doc_id"), col("status"), col("width"), col("height"),
                col("n_frames"),
                lit(null).cast("long").as("n_sampled"),
                lit(null).cast("long").as("fp"),
                lit(null).cast("long").as("keeper_id"),
                lit(null).cast("long").as("group_n"),
                lit(null).cast("boolean").as("is_dup")))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h,
                 2 + doc_id % 3 AS nf
          FROM documents WHERE doc_id % 41 <> 0),
        fr AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM d),
        sfr AS (SELECT * FROM fr WHERE f % 2 = 0),
        vxs AS (SELECT doc_id, w, h, nf, f, unnest(range(0, w)) AS x FROM sfr),
        vpx AS (SELECT doc_id, w, h, nf, f, x, unnest(range(0, h)) AS y FROM vxs),
        vlum AS (
          SELECT doc_id, w, h, nf, f,
                 (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 4 * ((doc_id * 5 + 13 * f + 7 * (x // 8) + 11 * (y // 8)) % 256) AS lum
          FROM vpx),
        vblk AS (
          SELECT doc_id, w, h, nf, f, bi,
                 CAST(SUM(lum) AS BIGINT) AS bs, COUNT(*) AS bn
          FROM vlum GROUP BY doc_id, w, h, nf, f, bi),
        vtot AS (
          SELECT doc_id, f, CAST(SUM(bs) AS BIGINT) AS ts,
                 CAST(SUM(bn) AS BIGINT) AS n
          FROM vblk GROUP BY doc_id, f),
        vhash AS (
          SELECT b.doc_id, b.w, b.h, b.nf, b.f,
                 CAST(SUM(CASE WHEN b.bs * t.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS phash
          FROM vblk b JOIN vtot t ON t.doc_id = b.doc_id AND t.f = b.f
          GROUP BY b.doc_id, b.w, b.h, b.nf, b.f),
        vids AS (
          SELECT doc_id, w, h, nf, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                 CAST(SUM(CAST(phash + 1 AS BIGINT) << (9 * f)) AS BIGINT) AS fp
          FROM vhash GROUP BY doc_id, w, h, nf),
        vkeep AS (
          SELECT w, h, nf, fp, MIN(doc_id) AS keeper_id, COUNT(*) AS group_n
          FROM vids GROUP BY w, h, nf, fp)
        SELECT v.doc_id, 'ok' AS status, v.w AS width, v.h AS height,
               CAST(v.nf AS INTEGER) AS n_frames, v.n_sampled, v.fp,
               k.keeper_id, k.group_n, v.doc_id <> k.keeper_id AS is_dup
        FROM vids v
        JOIN vkeep k ON k.w = v.w AND k.h = v.h AND k.nf = v.nf AND k.fp = v.fp
        UNION ALL
        SELECT doc_id, 'quarantined' AS status,
               CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
               CAST(NULL AS INTEGER) AS n_frames,
               CAST(NULL AS BIGINT) AS n_sampled, CAST(NULL AS BIGINT) AS fp,
               CAST(NULL AS BIGINT) AS keeper_id, CAST(NULL AS BIGINT) AS group_n,
               CAST(NULL AS BOOLEAN) AS is_dup
        FROM documents WHERE doc_id % 41 = 0"""),
    ),

    // COLOR JPEG DECODE (YCbCr 4:2:0) + QUARANTINE — q261's 3-component
    // twin: real production wire format (two DQTs, four DHTs, SOF0 with
    // 2x2/1x1/1x1 sampling, MCU-interleaved entropy data with
    // per-component DC predictors), decoded by the hand-rolled
    // parseJpegColor. Constant chroma per MCU keeps every block of
    // every component DC-only, so the decode is bit-exact and the
    // oracle replays the luma aHash AND the exact chroma plane sums in
    // closed form. Corrupt slice (doc_id % 37 == 0 — alternately
    // truncated and rewritten to unsupported 4:2:2 sampling) must
    // quarantine. Scale: one decode map pass, no shuffle at all.
    "q268_jpeg_color_decode" -> QueryDef(
      fn = (s, d) =>
        JpegCodec.jpegColorStats(JpegCodec.jpegColorTable(s, d)).toDF()
          .select(col("doc_id"), col("status"), col("width"), col("height"),
            col("phash"), col("cb_sum"), col("cr_sum")),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 16 * (1 + doc_id % 2) AS w, 16 * (1 + doc_id % 3) AS h
          FROM documents WHERE doc_id % 37 <> 0),
        xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
        pxg AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
        lums AS (
          SELECT doc_id, w, h,
                 (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 4 * ((doc_id * 5 + 7 * (x // 8) + 11 * (y // 8)) % 256) AS lum
          FROM pxg),
        blocks AS (
          SELECT doc_id, w, h, bi,
                 CAST(SUM(lum) AS BIGINT) AS bs, COUNT(*) AS bn
          FROM lums GROUP BY doc_id, w, h, bi),
        tot AS (
          SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts, CAST(SUM(bn) AS BIGINT) AS n
          FROM blocks GROUP BY doc_id),
        hashes AS (
          SELECT b.doc_id, b.w, b.h,
                 CAST(SUM(CASE WHEN b.bs * t.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS phash
          FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id, b.w, b.h),
        mg AS (SELECT doc_id, w, h, unnest(range(0, w // 16)) AS mx FROM d),
        mgy AS (SELECT doc_id, mx, unnest(range(0, h // 16)) AS my FROM mg),
        ch AS (
          SELECT doc_id,
                 CAST(SUM(((doc_id * 7 + 13 * mx + 3 * my) % 256) * 64) AS BIGINT) AS cb_sum,
                 CAST(SUM(((doc_id * 11 + 5 * mx + 17 * my) % 256) * 64) AS BIGINT) AS cr_sum
          FROM mgy GROUP BY doc_id)
        SELECT hs.doc_id, 'ok' AS status,
               CAST(hs.w AS BIGINT) AS width, CAST(hs.h AS BIGINT) AS height,
               hs.phash, ch.cb_sum, ch.cr_sum
        FROM hashes hs JOIN ch ON ch.doc_id = hs.doc_id
        UNION ALL
        SELECT doc_id, 'quarantined' AS status,
               CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
               CAST(NULL AS INTEGER) AS phash,
               CAST(NULL AS BIGINT) AS cb_sum, CAST(NULL AS BIGINT) AS cr_sum
        FROM documents WHERE doc_id % 37 = 0"""),
    ),

    // EMBEDDING-SPACE IMAGE NEAR-DUP (q268 decode → q300 auto-B index →
    // q152 survivor selection, composed for media): every image decodes
    // to a dims-invariant grid-mean FEATURE vector; candidates come
    // from an auto-sized seeded IVF (B = ⌈n/32⌉ — one corpus count,
    // never all-pairs); exact cosine ≥ threshold edges feed the same
    // star-contraction components as the text/semantic dedup; keeper =
    // component minimum. The corpus plants 2× RE-RENDERS for every 5th
    // doc — same content, doubled dims — which the (w, h, phash) grain
    // of q145/q195/q261 structurally MISSES and this pipeline catches
    // with recall 1.0 (ImageEmbedDedupSpec floors it at both sfs; the
    // re-render's grid means are bit-equal, see gridMeansFromPixels).
    // Crop-robust matching needs a learned semantic embedding (no
    // semantic content in the synthetic tile corpus to crop-match) —
    // the pipeline from decode to survivors is identical when one is
    // swapped in at the feature column. Scale: decode map pass, one
    // bounded-top-1 assignment aggregate (no n×B window), ~list-length
    // candidate fanout per image, log-diameter CC.
    "q316_image_embed_dedup" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val top1 = udaf(graft.operators.TopKAggregator.topK(1),
          org.apache.spark.sql.Encoders.product[graft.operators.TopKAggregator.Scored])
        val feats = JpegCodec.jpegGridFeatures(JpegCodec.jpegVariantTable(s, d)).toDF()
          .where(col("status") === "ok")
          .select(col("doc_id"),
            col("embedding"),
            sqrt(call_function("vec_dot", col("embedding"), col("embedding"))).as("nrm"))
          .where(col("nrm") > 0)
          .localCheckpoint(true) // decode once: seeds, assignment, rerank all read it
        val b = math.ceil(feats.count().toDouble / 32.0).toLong
        val seeds = feats.where(col("doc_id") < b)
          .select(col("doc_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
        val assigned = feats
          .crossJoin(broadcast(seeds))
          .withColumn("csim",
            call_function("vec_dot", col("embedding"), col("ce")) / (col("nrm") * col("cn")))
          .groupBy(col("doc_id"))
          .agg(
            first(col("embedding")).as("embedding"),
            first(col("nrm")).as("nrm"),
            top1(col("cid"), col("csim")).as("raw"))
          .select(col("doc_id"), col("embedding"), col("nrm"),
            element_at(col("raw"), 1).getField("id").as("cid"))
        val aSide = assigned.select(col("cid"), col("doc_id").as("ida"),
          col("embedding").as("ea"), col("nrm").as("na"))
        val bSide = assigned.select(col("cid"), col("doc_id").as("idb"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        val pairs = aSide.join(bSide, "cid")
          .where(col("ida") < col("idb"))
          .withColumn("sim",
            call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
          .where(col("sim") >= 0.999999)
          .select(col("ida"), col("idb"))
        val labels = graft.functions.DedupQueries
          .connectedComponents(pairs)
          .withColumnRenamed("id", "doc_id")
        feats.select(col("doc_id"))
          .join(broadcast(labels), Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            when(col("label").isNull, "singleton")
              .when(col("label") === col("doc_id"), "keeper")
              .otherwise("dropped").as("status"),
            coalesce(col("label"), col("doc_id")).as("cluster_id"))
      },
      oracle = Some("""
        WITH RECURSIVE geo AS (
          SELECT doc_id AS img_id, doc_id AS src, 1 AS scale,
                 8 * (2 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h
          FROM documents
          UNION ALL
          SELECT doc_id + 1000000, doc_id, 2,
                 16 * (2 + doc_id % 3), 16 * (1 + doc_id % 2)
          FROM documents WHERE doc_id % 5 = 0),
        xs AS (SELECT img_id, src, scale, w, h, unnest(range(0, w)) AS x FROM geo),
        pxg AS (SELECT img_id, src, scale, w, h, x, unnest(range(0, h)) AS y FROM xs),
        lums AS (
          SELECT img_id, (y * 2 // h) * 4 + (x * 4 // w) AS bi,
                 4 * ((src * 5 + 7 * ((x // scale) // 8) + 11 * ((y // scale) // 8)) % 256) AS lum
          FROM pxg),
        fm AS (
          SELECT img_id, bi,
                 CAST(CAST(SUM(lum) AS DOUBLE) / COUNT(*) AS REAL) AS m
          FROM lums GROUP BY img_id, bi),
        e AS (
          SELECT img_id AS vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                   v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
          FROM (SELECT img_id, list(m ORDER BY bi) AS embedding FROM fm GROUP BY img_id)
          WHERE sqrt(list_sum(list_transform(embedding,
                  v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) > 0),
        bcfg AS (
          SELECT CAST(CEIL(CAST(COUNT(*) AS DOUBLE) / 32.0) AS BIGINT) AS b FROM e),
        c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM e
              WHERE vec_id < (SELECT b FROM bcfg)),
        scored AS (
          SELECT c.cid, e.vec_id, e.embedding, e.nrm,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_sum(list_transform(list_zip(e.embedding, c.ce),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * c.cn) DESC,
                   c.cid ASC) AS r
          FROM e CROSS JOIN c),
        asg AS (SELECT cid, vec_id, embedding, nrm FROM scored WHERE r = 1),
        pairs AS (
          SELECT a.vec_id AS ida, b.vec_id AS idb
          FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm)
                >= 0.999999),
        und AS (
          SELECT ida AS a, idb AS b FROM pairs
          UNION ALL
          SELECT idb AS a, ida AS b FROM pairs),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        labels AS (
          SELECT a AS vec_id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a)
        SELECT e.vec_id AS doc_id,
               CASE WHEN l.label IS NULL THEN 'singleton'
                    WHEN l.label = e.vec_id THEN 'keeper'
                    ELSE 'dropped' END AS status,
               COALESCE(l.label, e.vec_id) AS cluster_id
        FROM e LEFT JOIN labels l ON l.vec_id = e.vec_id"""),
    ),

    // AUDIO NEAR-DUP via energy fingerprint — q145's audio twin: an
    // 8-bit block-energy signature over DECODED PCM through the real
    // WAV parser, then hash-grouped keep-first. Unlike the image side,
    // the generated corpus has no engineered exact-duplicate audio
    // (the sample formula's period, lcm(80, 65536), exceeds any test
    // doc_id range), so the collapse here is genuine fingerprint
    // collision — which is exactly what a coarse perceptual hash is
    // FOR: the keeper groups are the candidate sets a finer
    // verification pass (full sample compare) would rerank, the same
    // two-tier shape as LSH -> exact-Jaccard (q32/q33). Scale: decode
    // pass + one (n_samples, fp)-keyed aggregate — linear, no pairs.
    "q146_audio_fingerprint_dedup" -> QueryDef(
      fn = (s, d) => {
        // same checkpoint rationale as q145: one decode pass, two readers
        val hashed = wavEnergyHash(wavTable(s, d)).toDF().localCheckpoint(true)
        val keep = hashed
          .groupBy(col("n_samples"), col("fp"))
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("group_n"))
        hashed
          .join(keep, Seq("n_samples", "fp"))
          .select(
            col("doc_id"), col("n_samples"), col("fp"),
            col("keeper_id"), col("group_n"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 120 + doc_id % 80 AS n FROM documents),
        smp AS (
          SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        v AS (
          SELECT doc_id, n, (i * 8) // n AS bi,
                 ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS s
          FROM smp),
        blocks AS (
          SELECT doc_id, n, bi,
                 CAST(SUM(s * s) AS BIGINT) AS es, COUNT(*) AS bn
          FROM v GROUP BY doc_id, n, bi),
        tot AS (
          SELECT doc_id, CAST(SUM(es) AS BIGINT) AS ts
          FROM blocks GROUP BY doc_id),
        hashes AS (
          SELECT b.doc_id, b.n,
                 CAST(SUM(CASE WHEN b.es * b.n > t.ts * b.bn
                               THEN CAST(1 AS BIGINT) << b.bi ELSE 0 END) AS INTEGER) AS fp
          FROM blocks b JOIN tot t ON t.doc_id = b.doc_id
          GROUP BY b.doc_id, b.n),
        keep AS (
          SELECT n, fp, MIN(doc_id) AS keeper_id, COUNT(*) AS group_n
          FROM hashes GROUP BY n, fp)
        SELECT h.doc_id, h.n AS n_samples, h.fp,
               k.keeper_id, k.group_n, h.doc_id <> k.keeper_id AS is_dup
        FROM hashes h
        JOIN keep k ON k.n = h.n AND k.fp = h.fp"""),
    ),

    // MULTIMODAL RECORD ASSEMBLY — the last step before a multimodal
    // training run: one manifest row per document joining every
    // modality at doc grain (text stats from the table, image dims and
    // audio length from the REAL decoders, embedding dimensionality
    // from the vector table via a left join, so a missing vector
    // degrades to emb_dim 0 instead of dropping the record). All
    // doc-keyed equi-joins — the linear assembly shape regardless of
    // corpus size; the oracle replays the decoders' closed forms.
    "q147_multimodal_assembly" -> QueryDef(
      fn = (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        val img = bmpFeatures(bmpTable(s, d)).toDF()
          .select(col("doc_id"), col("width"), col("height"))
        val aud = wavFeatures(wavTable(s, d)).toDF()
          .select(col("doc_id"), col("n_samples"))
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), size(col("embedding")).as("emb_dim"))
        docs
          .join(img, Seq("doc_id"))
          .join(aud, Seq("doc_id"))
          .join(emb, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("source"), col("lang"), col("n_chars"),
            col("width"), col("height"), col("n_samples"),
            coalesce(col("emb_dim"), lit(0)).as("emb_dim"),
            (lit(3) + when(col("emb_dim").isNotNull, 1).otherwise(0)).as("n_modalities"))
      },
      oracle = Some("""
        SELECT d.doc_id, d.source, d.lang, d.n_chars,
               CAST(8 + d.doc_id % 8 AS BIGINT) AS width,
               CAST(4 + d.doc_id % 4 AS BIGINT) AS height,
               CAST(120 + d.doc_id % 80 AS BIGINT) AS n_samples,
               CAST(COALESCE(len(e.embedding), 0) AS INTEGER) AS emb_dim,
               CAST(CASE WHEN e.vec_id IS NOT NULL THEN 4 ELSE 3 END AS INTEGER) AS n_modalities
        FROM documents d
        LEFT JOIN embeddings e ON e.vec_id = d.doc_id"""),
    ),

    // Real frame sampling: decoded sample-aligned analysis windows (64
    // samples every 32 — 50% overlap, the STFT shape) over genuine WAV
    // containers, with exact integer per-frame energy. The oracle
    // replays the closed-form samples and the same window arithmetic, so
    // a hash match proves framing boundaries, tail-frame truncation, and
    // the energy sums are all decode-exact.
    "q81_wav_frames" -> QueryDef(
      fn = (s, d) => wavFrameSample(wavTable(s, d), frameLen = 64, hop = 32).toDF(),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, 120 + doc_id % 80 AS n FROM documents),
        f AS (
          SELECT doc_id, n,
                 unnest(range(0, (n + 31) // 32)) AS frame_idx
          FROM d),
        s AS (
          SELECT doc_id, frame_idx,
                 unnest(range(frame_idx * 32, LEAST(frame_idx * 32 + 64, n))) AS i
          FROM f),
        v AS (
          SELECT doc_id, frame_idx,
                 ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS smp
          FROM s)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(smp) AS BIGINT) AS sample_sum,
               CAST(SUM(smp * smp) AS BIGINT) AS sample_sumsq
        FROM v GROUP BY doc_id, frame_idx""")
    )
  )
}
