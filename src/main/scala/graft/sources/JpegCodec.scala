package graft.sources

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** BASELINE JPEG (ITU-T T.81 sequential DCT, grayscale) — encode +
  * decode in pure JVM, the third real compressed container through the
  * codec boundary after BMP (raw, q145) and PNG (DEFLATE, q195). The
  * decoder walks the real marker structure (SOI/APPn/DQT/SOF0/DHT/SOS/
  * EOI), builds canonical Huffman tables from DHT exactly as the spec
  * prescribes, entropy-decodes with byte unstuffing, run-length/zigzag
  * expands, dequantizes, and runs a double-precision IDCT.
  *
  * Exactness contract: the generated corpus is made of CONSTANT 8×8
  * tiles, whose DCT is DC-only — F₀₀ = 8·(v−128), every AC zero — and
  * the DC quant step is 8, so quantization is lossless BY CONSTRUCTION
  * and the decode must reproduce the closed-form tile pixels bit-for-
  * bit (the q195 gate discipline applied to a lossy-in-general codec:
  * pick the subspace where the math is exact, gate there, and exercise
  * the general machinery — Huffman AC paths, runs, ZRL — in the spec).
  *
  * Supported subset (everything else quarantines, never misdecodes):
  * 8-bit precision, no restart intervals; grayscale single-component
  * 1×1 frames via [[parseJpegGray]] (dimensions multiple of 8), and
  * 3-component YCbCr 4:2:0 frames — sampling exactly (2×2, 1×1, 1×1),
  * up to four quant/Huffman tables, MCU-interleaved scan — via
  * [[parseJpegColor]] (dimensions multiple of 16). Progressive (SOF2),
  * arithmetic (SOF9+), and other sampling layouts are rejected at the
  * SOF marker. The constant-tile exactness contract extends to color
  * per component: chroma is constant per MCU, so all six blocks of
  * every MCU are DC-only and quantize losslessly.
  */
object JpegCodec {

  import Multimodal.MediaRecord

  /** Standard zigzag order: zigzag index → natural (row-major) index. */
  private[sources] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant table (natural order): DC step 8 — exactly the DCT gain of a
    * constant block, so constant tiles quantize losslessly; AC step 16.
    */
  private[sources] val Quant: Array[Int] =
    Array.tabulate(64)(i => if (i == 0) 8 else 16)

  // Canonical Huffman tables (counts-by-length + symbols-in-order, the
  // DHT wire format). DC: the 12 magnitude categories, all 4-bit codes
  // (12/16 satisfies Kraft; the all-ones code stays unused as the spec
  // recommends). AC: EOB, ZRL, and (run ≤ 3, size ≤ 8), all 6-bit
  // codes (34/64, all-ones unused).
  private[sources] val DcCounts: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private[sources] val DcSymbols: Array[Int] = (0 to 11).toArray
  private[sources] val AcCounts: Array[Int] =
    Array(0, 0, 0, 0, 0, 34, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private[sources] val AcSymbols: Array[Int] =
    Array(0x00, 0xF0) ++ (for { r <- 0 to 3; s <- 1 to 8 } yield (r << 4) | s)

  /** Canonical code assignment (T.81 C.2): symbol → (code, length). */
  private def canonicalCodes(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var si = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < counts(len - 1)) {
        out += symbols(si) -> ((code, len))
        code += 1
        si += 1
        i += 1
      }
      code <<= 1
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // ENCODER

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(value: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit =
      if (nbits > 0) { put(0xFF, 8 - nbits) } // pad with 1s
  }

  private def category(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode QUANTIZED coefficient blocks (natural order, MCU row-major)
    * into a complete baseline grayscale JPEG. Exposed at coefficient
    * grain so the spec can drive the AC run-length/ZRL paths directly.
    */
  private[sources] def encodeJpegFromCoeffs(
      w: Int, h: Int, blocks: Seq[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0, s"dims ${w}x$h")
    require(blocks.length == (w / 8) * (h / 8), "block count != MCU count")
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 1 + 64); out.write(0x00) // DQT, Pq=0 Tq=0
    var zi = 0
    while (zi < 64) { out.write(Quant(Zigzag(zi))); zi += 1 } // zigzag order
    marker(0xC0); u16(8 + 3) // SOF0, 1 component
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1, quant 0
    def dht(clazz: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + symbols.length); out.write(clazz << 4)
      counts.foreach(out.write); symbols.foreach(out.write)
    }
    dht(0, DcCounts, DcSymbols)
    dht(1, AcCounts, AcSymbols)
    marker(0xDA); u16(6 + 2) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcC = canonicalCodes(DcCounts, DcSymbols)
    val acC = canonicalCodes(AcCounts, AcSymbols)
    val bw = new BitWriter(out)
    def amp(v: Int, s: Int): Int = if (v < 0) v + (1 << s) - 1 else v
    var prevDc = 0
    blocks.foreach { blk =>
      val diff = blk(0) - prevDc
      prevDc = blk(0)
      val s = category(diff)
      val (c, l) = dcC(s)
      bw.put(c, l)
      if (s > 0) bw.put(amp(diff, s), s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = blk(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (zc, zl) = acC(0xF0); bw.put(zc, zl); run -= 16 }
          val sz = category(v)
          val sym = (run << 4) | sz
          require(acC.contains(sym), s"AC (run=$run, size=$sz) outside the table")
          val (ac, al) = acC(sym)
          bw.put(ac, al)
          bw.put(amp(v, sz), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acC(0x00); bw.put(ec, el) } // EOB
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode a constant-8×8-tile grayscale image: tile (tx, ty) has
    * uniform value `tile(tx, ty)` ∈ [0, 255]. DC-only blocks, lossless
    * under [[Quant]].
    */
  private[sources] def encodeJpegGray(
      w: Int, h: Int, tile: (Int, Int) => Int): Array[Byte] = {
    val blocks = for { by <- 0 until h / 8; bx <- 0 until w / 8 } yield {
      val blk = new Array[Int](64)
      blk(0) = tile(bx, by) - 128 // quantized DC: 8(v-128)/8
      blk
    }
    encodeJpegFromCoeffs(w, h, blocks)
  }

  /** Encode a 3-component YCbCr 4:2:0 baseline JPEG from constant
    * tiles: luma tile (tx, ty) at 8×8 grain, chroma tiles (mx, my) at
    * MCU (16×16 luma) grain — each chroma 8×8 block covers one MCU, so
    * every block of every component is DC-only and quantizes
    * losslessly (the grayscale exactness argument per component). The
    * wire format is the full production layout: two DQTs (luma 0,
    * chroma 1), SOF0 with sampling 2×2/1×1/1×1, four DHTs (DC/AC ×
    * luma/chroma), and MCU-interleaved entropy data (4 Y blocks
    * row-major, then Cb, then Cr) with per-component DC predictors.
    */
  private[sources] def encodeJpegColor(
      w: Int, h: Int,
      yTile: (Int, Int) => Int,
      cbTile: (Int, Int) => Int,
      crTile: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0, s"dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    marker(0xD8) // SOI
    marker(0xDB); u16(2 + 2 * 65) // DQT: tables 0 (luma) and 1 (chroma)
    for (tq <- 0 to 1) {
      out.write(tq) // Pq=0
      var zi = 0
      while (zi < 64) { out.write(Quant(Zigzag(zi))); zi += 1 }
    }
    marker(0xC0); u16(8 + 3 * 3) // SOF0, 3 components
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y: 2x2, quant 0
    out.write(2); out.write(0x11); out.write(1) // Cb: 1x1, quant 1
    out.write(3); out.write(0x11); out.write(1) // Cr: 1x1, quant 1
    def dht(clazz: Int, th: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + symbols.length); out.write((clazz << 4) | th)
      counts.foreach(out.write); symbols.foreach(out.write)
    }
    dht(0, 0, DcCounts, DcSymbols); dht(1, 0, AcCounts, AcSymbols)
    dht(0, 1, DcCounts, DcSymbols); dht(1, 1, AcCounts, AcSymbols)
    marker(0xDA); u16(6 + 2 * 3) // SOS, 3 components
    out.write(3)
    out.write(1); out.write(0x00) // Y: DC/AC tables 0
    out.write(2); out.write(0x11) // Cb: tables 1
    out.write(3); out.write(0x11) // Cr: tables 1
    out.write(0); out.write(63); out.write(0)
    val dcC = canonicalCodes(DcCounts, DcSymbols)
    val acC = canonicalCodes(AcCounts, AcSymbols)
    val bw = new BitWriter(out)
    def amp(v: Int, s: Int): Int = if (v < 0) v + (1 << s) - 1 else v
    val pred = new Array[Int](3)
    def dcOnlyBlock(ci: Int, dcQ: Int): Unit = {
      val diff = dcQ - pred(ci)
      pred(ci) = dcQ
      val s = category(diff)
      val (c, l) = dcC(s)
      bw.put(c, l)
      if (s > 0) bw.put(amp(diff, s), s)
      val (ec, el) = acC(0x00)
      bw.put(ec, el) // EOB straight away: DC-only
    }
    var my = 0
    while (my < h / 16) {
      var mx = 0
      while (mx < w / 16) {
        // T.81 interleave: the component's data units left-to-right,
        // top-to-bottom inside the MCU, components in frame order
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) { dcOnlyBlock(0, yTile(2 * mx + u, 2 * my + v) - 128); u += 1 }
          v += 1
        }
        dcOnlyBlock(1, cbTile(mx, my) - 128)
        dcOnlyBlock(2, crTile(mx, my) - 128)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // DECODER

  /** Double-precision 8×8 IDCT (T.81 A.3.3); exact for DC-only blocks
    * (f = F₀₀/8 uniformly — the corpus case). StrictMath keeps the cos
    * table identical across JVMs.
    */
  private[sources] def idct8x8(coef: Array[Int]): Array[Int] = {
    val cos = Array.tabulate(8, 8)((x, u) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0))
    val c = Array.tabulate(8)(u => if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) acc += c(u) * c(v) * f * cos(x)(u) * cos(y)(v)
            u += 1
          }
          v += 1
        }
        val p = math.round(acc / 4.0).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Canonical Huffman decode tables (T.81 F.2.2.3): per code length,
    * the smallest/largest code and the symbol-array offset.
    */
  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr  = new Array[Int](17)
    locally {
      var code = 0
      var si = 0
      for (len <- 1 to 16) {
        if (counts(len - 1) > 0) {
          valPtr(len) = si
          minCode(len) = code
          code += counts(len - 1)
          si += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (maxCode(len) >= 0 && code <= maxCode(len))
          return symbols(valPtr(len) + code - minCode(len))
      }
      throw new IllegalArgumentException("invalid Huffman code in entropy data")
    }
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; any bare marker
    * inside the coefficient data is corruption (we never emit RSTn).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "entropy data truncated")
        var byt = b(pos) & 0xFF
        pos += 1
        if (byt == 0xFF) {
          require(pos < b.length, "entropy data truncated at 0xFF")
          val nxt = b(pos) & 0xFF
          require(nxt == 0x00, f"unexpected marker 0xFF$nxt%02X in entropy data")
          pos += 1
          byt = 0xFF
        }
        acc = byt; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = nbits = 0
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Parse a baseline grayscale JPEG → (width, height, gray pixels
    * 0..255, top-down row-major). Every malformation throws
    * IllegalArgumentException — the quarantine lane's contract.
    */
  private[sources] def parseJpegGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
      "not a JPEG payload (missing SOI)")
    var pos = 2
    def u16(p: Int): Int = {
      require(p + 1 < b.length, s"truncated at offset $p")
      ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    }
    var quant: Array[Int] = null
    var dcTab: HuffTable = null
    var acTab: HuffTable = null
    var width = -1
    var height = -1
    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 1 < b.length, s"truncated marker stream at offset $pos")
      require((b(pos) & 0xFF) == 0xFF, f"expected marker at offset $pos")
      val m = b(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD8 => // duplicate SOI: tolerate nothing
          throw new IllegalArgumentException("unexpected second SOI")
        case mm if mm >= 0xE0 && mm <= 0xEF => pos += u16(pos) // APPn
        case 0xFE => pos += u16(pos)                            // COM
        case 0xDB =>
          val end = pos + u16(pos)
          // clamp against the BUFFER, not just the claimed segment end: a
          // payload truncated mid-segment must fail through the same IAE
          // path as every other malformation, not surface as an
          // ArrayIndexOutOfBoundsException from the b(...) reads below
          require(end <= b.length, "truncated DQT segment")
          var p = pos + 2
          while (p < end) {
            require((b(p) & 0xF0) == 0, "only 8-bit quant tables supported")
            require(end - p >= 65, "truncated DQT")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = b(p + 1 + i) & 0xFF; i += 1 }
            if ((b(p) & 0x0F) == 0) quant = q // component uses table 0
            p += 65
          }
          pos = end
        case 0xC0 =>
          val end = pos + u16(pos)
          require(end <= b.length && end - pos >= 11, "truncated SOF0 segment")
          require((b(pos + 2) & 0xFF) == 8, "only 8-bit precision supported")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require((b(pos + 7) & 0xFF) == 1, "only single-component (grayscale) supported")
          require((b(pos + 9) & 0xFF) == 0x11, "only 1x1 sampling supported")
          require((b(pos + 10) & 0x0F) == 0, "component must use quant table 0")
          require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
            s"unsupported dimensions ${width}x$height (multiples of 8 only)")
          pos = end
        case mm if (mm >= 0xC1 && mm <= 0xCF) && mm != 0xC4 && mm != 0xC8 =>
          throw new IllegalArgumentException(
            f"unsupported frame type 0xFF$mm%02X (baseline SOF0 only)")
        case 0xC4 =>
          val end = pos + u16(pos)
          require(end <= b.length, "truncated DHT segment")
          var p = pos + 2
          while (p < end) {
            require(end - p >= 17, "truncated DHT")
            val tc = (b(p) >> 4) & 0x0F
            val th = b(p) & 0x0F
            val counts = Array.tabulate(16)(i => b(p + 1 + i) & 0xFF)
            val n = counts.sum
            require(end - p >= 17 + n, "truncated DHT symbols")
            val symbols = Array.tabulate(n)(i => b(p + 17 + i) & 0xFF)
            val t = new HuffTable(counts, symbols)
            if (th == 0) { if (tc == 0) dcTab = t else acTab = t }
            p += 17 + n
          }
          pos = end
        case 0xDD =>
          throw new IllegalArgumentException("restart intervals (DRI) unsupported")
        case 0xDA =>
          val end = pos + u16(pos)
          require(end <= b.length && end - pos >= 8, "truncated SOS segment")
          require((b(pos + 2) & 0xFF) == 1, "SOS must reference 1 component")
          require((b(pos + 4) & 0xFF) == 0x00, "SOS must use DC/AC tables 0")
          require((b(pos + 5) & 0xFF) == 0 && (b(pos + 6) & 0xFF) == 63,
            "spectral selection must be 0..63 (baseline)")
          sosAt = end
        case other =>
          throw new IllegalArgumentException(f"unexpected marker 0xFF$other%02X")
      }
    }
    require(quant != null, "missing DQT")
    require(dcTab != null && acTab != null, "missing DHT")
    require(width > 0, "missing SOF0")
    val mcusX = width / 8
    val mcusY = height / 8
    // A crafted header claiming huge dimensions would allocate the pixel
    // array before any entropy byte is read (the PNG lesson): every MCU
    // consumes at least 10 bits (shortest DC code 4 + EOB 6), so the
    // claimed MCU count is bounded by the payload's bit budget.
    require(mcusX.toLong * mcusY <= 8L * b.length / 10 + 1,
      s"claimed dimensions ${width}x$height exceed what the " +
        s"${b.length}-byte payload could encode")
    val px = new Array[Int](width * height)
    val br = new BitReader(b, sosAt)
    var dc = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        val coef = new Array[Int](64)
        val s0 = dcTab.decode(br)
        require(s0 <= 11, s"bad DC category $s0")
        dc += extend(br.bits(s0), s0)
        coef(0) = dc * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = acTab.decode(br)
          val r = (rs >> 4) & 0x0F
          val s = rs & 0x0F
          if (s == 0) {
            if (r == 15) k += 16
            else if (r == 0) eob = true
            else throw new IllegalArgumentException(f"bad AC symbol 0x$rs%02X")
          } else {
            k += r
            require(k < 64, "AC run overflows the block")
            coef(Zigzag(k)) = extend(br.bits(s), s) * quant(Zigzag(k))
            k += 1
          }
        }
        val blk = idct8x8(coef)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            px((my * 8 + y) * width + mx * 8 + x) = blk(y * 8 + x)
            x += 1
          }
          y += 1
        }
        mx += 1
      }
      my += 1
    }
    // byte-align, then require EOI (0xFF fill bytes before a marker are
    // legal per the spec)
    br.align()
    var p = br.pos
    require(p < b.length, "missing EOI")
    while (p + 1 < b.length && (b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) == 0xFF)
      p += 1
    require(p + 1 < b.length && (b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) == 0xD9,
      "missing EOI after entropy data")
    (width, height, px)
  }

  /** Parse a baseline 3-component YCbCr 4:2:0 JPEG → (width, height,
    * luma plane at full resolution, Cb and Cr planes at half
    * resolution, all top-down row-major, values 0..255). The color
    * counterpart of [[parseJpegGray]]: full marker walk with up to four
    * quant tables and four Huffman tables (class × id), per-component
    * table selection from SOF/SOS, MCU-interleaved entropy decoding
    * with independent DC predictors. Every malformation — truncation
    * anywhere, mismatched sampling factors, bad table ids — throws
    * IllegalArgumentException (the quarantine lane's contract).
    * Supported subset: 8-bit, exactly (2×2, 1×1, 1×1) sampling, no
    * restart intervals, dimensions multiple of 16.
    */
  private[sources] def parseJpegColor(
      b: Array[Byte]): (Int, Int, Array[Int], Array[Int], Array[Int]) = {
    require(b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
      "not a JPEG payload (missing SOI)")
    var pos = 2
    def u16(p: Int): Int = {
      require(p + 1 < b.length, s"truncated at offset $p")
      ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    }
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width = -1
    var height = -1
    val compQ = new Array[Int](3)
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 1 < b.length, s"truncated marker stream at offset $pos")
      require((b(pos) & 0xFF) == 0xFF, f"expected marker at offset $pos")
      val m = b(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD8 =>
          throw new IllegalArgumentException("unexpected second SOI")
        case mm if mm >= 0xE0 && mm <= 0xEF => pos += u16(pos) // APPn
        case 0xFE => pos += u16(pos)                            // COM
        case 0xDB =>
          val end = pos + u16(pos)
          require(end <= b.length, "truncated DQT segment")
          var p = pos + 2
          while (p < end) {
            require((b(p) & 0xF0) == 0, "only 8-bit quant tables supported")
            require(end - p >= 65, "truncated DQT")
            val tq = b(p) & 0x0F
            require(tq < 4, s"bad quant table id $tq")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = b(p + 1 + i) & 0xFF; i += 1 }
            quant(tq) = q
            p += 65
          }
          pos = end
        case 0xC0 =>
          val end = pos + u16(pos)
          require(end <= b.length && end - pos >= 17, "truncated SOF0 segment")
          require((b(pos + 2) & 0xFF) == 8, "only 8-bit precision supported")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require((b(pos + 7) & 0xFF) == 3, "color decoder requires 3 components")
          for (ci <- 0 until 3) {
            val o = pos + 8 + 3 * ci
            require((b(o) & 0xFF) == ci + 1, "component ids must be 1,2,3")
            val samp = b(o + 1) & 0xFF
            val want = if (ci == 0) 0x22 else 0x11
            require(samp == want,
              f"unsupported sampling factors 0x$samp%02X on component ${ci + 1} " +
                "(YCbCr 4:2:0 = 2x2,1x1,1x1 only)")
            compQ(ci) = b(o + 2) & 0x0F
          }
          require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
            s"unsupported dimensions ${width}x$height (multiples of 16 only)")
          pos = end
        case mm if (mm >= 0xC1 && mm <= 0xCF) && mm != 0xC4 && mm != 0xC8 =>
          throw new IllegalArgumentException(
            f"unsupported frame type 0xFF$mm%02X (baseline SOF0 only)")
        case 0xC4 =>
          val end = pos + u16(pos)
          require(end <= b.length, "truncated DHT segment")
          var p = pos + 2
          while (p < end) {
            require(end - p >= 17, "truncated DHT")
            val tc = (b(p) >> 4) & 0x0F
            val th = b(p) & 0x0F
            require(tc <= 1 && th < 4, s"bad DHT table spec (class $tc, id $th)")
            val counts = Array.tabulate(16)(i => b(p + 1 + i) & 0xFF)
            val n = counts.sum
            require(end - p >= 17 + n, "truncated DHT symbols")
            val symbols = Array.tabulate(n)(i => b(p + 17 + i) & 0xFF)
            val t = new HuffTable(counts, symbols)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + n
          }
          pos = end
        case 0xDD =>
          throw new IllegalArgumentException("restart intervals (DRI) unsupported")
        case 0xDA =>
          val end = pos + u16(pos)
          require(end <= b.length && end - pos >= 12, "truncated SOS segment")
          require((b(pos + 2) & 0xFF) == 3, "SOS must reference 3 components")
          compDc = new Array[Int](3)
          compAc = new Array[Int](3)
          for (ci <- 0 until 3) {
            val o = pos + 3 + 2 * ci
            require((b(o) & 0xFF) == ci + 1, "SOS component ids must be 1,2,3")
            compDc(ci) = (b(o + 1) >> 4) & 0x0F
            compAc(ci) = b(o + 1) & 0x0F
          }
          require((b(pos + 9) & 0xFF) == 0 && (b(pos + 10) & 0xFF) == 63,
            "spectral selection must be 0..63 (baseline)")
          sosAt = end
        case other =>
          throw new IllegalArgumentException(f"unexpected marker 0xFF$other%02X")
      }
    }
    require(width > 0, "missing SOF0")
    for (ci <- 0 until 3) {
      require(quant(compQ(ci)) != null, s"missing DQT for component ${ci + 1}")
      require(dcTabs(compDc(ci)) != null && acTabs(compAc(ci)) != null,
        s"missing DHT for component ${ci + 1}")
    }
    val mcusX = width / 16
    val mcusY = height / 16
    // allocation guard (the q261/PNG lesson): each MCU consumes ≥ 60
    // bits (6 blocks × shortest DC code 4 + EOB 6), bounding the
    // claimed MCU count by the payload's bit budget before any pixel
    // array is allocated
    require(mcusX.toLong * mcusY <= 8L * b.length / 60 + 1,
      s"claimed dimensions ${width}x$height exceed what the " +
        s"${b.length}-byte payload could encode")
    val yP = new Array[Int](width * height)
    val cw = width / 2
    val chh = height / 2
    val cbP = new Array[Int](cw * chh)
    val crP = new Array[Int](cw * chh)
    val br = new BitReader(b, sosAt)
    val dcPred = new Array[Int](3)
    def decodeBlock(ci: Int): Array[Int] = {
      val q = quant(compQ(ci))
      val coef = new Array[Int](64)
      val s0 = dcTabs(compDc(ci)).decode(br)
      require(s0 <= 11, s"bad DC category $s0")
      dcPred(ci) += extend(br.bits(s0), s0)
      coef(0) = dcPred(ci) * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = acTabs(compAc(ci)).decode(br)
        val r = (rs >> 4) & 0x0F
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16
          else if (r == 0) eob = true
          else throw new IllegalArgumentException(f"bad AC symbol 0x$rs%02X")
        } else {
          k += r
          require(k < 64, "AC run overflows the block")
          coef(Zigzag(k)) = extend(br.bits(s), s) * q(Zigzag(k))
          k += 1
        }
      }
      idct8x8(coef)
    }
    def place(plane: Array[Int], pw: Int, bx: Int, by: Int, blk: Array[Int]): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { plane((by * 8 + y) * pw + bx * 8 + x) = blk(y * 8 + x); x += 1 }
        y += 1
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var v = 0
        while (v < 2) {
          var u = 0
          while (u < 2) { place(yP, width, 2 * mx + u, 2 * my + v, decodeBlock(0)); u += 1 }
          v += 1
        }
        place(cbP, cw, mx, my, decodeBlock(1))
        place(crP, cw, mx, my, decodeBlock(2))
        mx += 1
      }
      my += 1
    }
    br.align()
    var p = br.pos
    require(p < b.length, "missing EOI")
    while (p + 1 < b.length && (b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) == 0xFF)
      p += 1
    require(p + 1 < b.length && (b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) == 0xD9,
      "missing EOI after entropy data")
    (width, height, yP, cbP, crP)
  }

  // ------------------------------------------------------------------
  // CORPUS + HASH LANE (q261)

  /** One grayscale JPEG per document: w = 8·(2 + id%3), h = 8·(1 +
    * id%2), tile (tx, ty) value (id·5 + 7·tx + 11·ty) % 256 — constant
    * tiles, so the encode is exact (see the object scaladoc) and the
    * oracle can replay the pixels in closed form. Documents with
    * doc_id % 43 == 0 ship CORRUPT payloads — alternately truncated
    * mid-header and rewritten to an unsupported SOF9 (arithmetic
    * coding) frame — the quarantine fixture.
    */
  def jpegTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val w = 8 * (2 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      val bytes = encodeJpegGray(w, h,
        (tx, ty) => ((id * 5 + 7L * tx + 11L * ty) % 256).toInt)
      val payload =
        if (id % 43 != 0) bytes
        else if ((id / 43) % 2 == 0) java.util.Arrays.copyOf(bytes, 12) // truncated mid-DQT
        else {
          val c = bytes.clone()
          // SOF0 marker sits right after SOI(2) + DQT(2+2+65): flip it
          // to SOF9 (arithmetic) — a REAL format the decoder must
          // refuse, not garbage bytes
          val sofAt = 2 + 2 + 2 + 65
          require((c(sofAt) & 0xFF) == 0xFF && (c(sofAt + 1) & 0xFF) == 0xC0)
          c(sofAt + 1) = 0xC9.toByte
          c
        }
      MediaRecord(id, payload, "image/jpeg", payload.length.toLong)
    }
  }

  /** Planted-variant id offset for [[jpegVariantTable]]. */
  val VariantOffset = 1000000L

  /** Variant corpus for the EMBEDDING-space image dedup (q316): every
    * document's q261-geometry grayscale JPEG, PLUS — for doc_id % 5 ==
    * 0 — a planted 2× RE-RENDER (id = doc_id + [[VariantOffset]],
    * pixel(x, y) = base(x/2, y/2), so dims double while content is the
    * same). The (w, h, phash) dedup grain q145/q195/q261 use
    * structurally MISSES these (dims differ), which is exactly the gap
    * the grid-mean feature closes. All payloads are well-formed —
    * quarantine is q261's gate, not this one's.
    */
  def jpegVariantTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].flatMap { id =>
      val w = 8 * (2 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      def tile(tx: Int, ty: Int) = ((id * 5 + 7L * tx + 11L * ty) % 256).toInt
      val base = encodeJpegGray(w, h, tile)
      val out  = Seq(MediaRecord(id, base, "image/jpeg", base.length.toLong))
      if (id % 5 == 0) {
        val up = encodeJpegGray(2 * w, 2 * h, (tx, ty) => tile(tx / 2, ty / 2))
        out :+ MediaRecord(id + VariantOffset, up, "image/jpeg", up.length.toLong)
      } else out
    }
  }

  final case class JpegFeatures(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], embedding: Option[Array[Float]])

  /** Decode → dims-invariant grid-mean feature vector (q268's decode
    * path feeding [[Multimodal.gridMeansFromPixels]]) — the per-image
    * "embedding" extraction pass of the media near-dup pipeline. Same
    * codec-boundary discipline as [[jpegAHash]].
    */
  def jpegGridFeatures(media: Dataset[MediaRecord]): Dataset[JpegFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val (w, h, gray) = parseJpegGray(m.content)
          val px = new Array[Int](gray.length)
          var i = 0
          while (i < px.length) {
            val g = gray(i)
            px(i) = (g << 16) | (g << 8) | g
            i += 1
          }
          JpegFeatures(m.doc_id, "ok", Some(w.toLong), Some(h.toLong),
            Some(Multimodal.gridMeansFromPixels(w, h, px)))
        } catch {
          case scala.util.control.NonFatal(_) =>
            JpegFeatures(m.doc_id, "quarantined", None, None, None)
        }
      }
    }
  }

  final case class JpegHashed(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], phash: Option[Int])

  /** One YCbCr 4:2:0 color JPEG per document: w = 16·(1 + id%2), h =
    * 16·(1 + id%3); luma tile (tx, ty) value (id·5 + 7tx + 11ty) % 256
    * (the q261 formula at the same 8×8 grain), chroma constant per MCU:
    * Cb = (id·7 + 13mx + 3my) % 256, Cr = (id·11 + 5mx + 17my) % 256 —
    * all DC-only, so the decode is exact per component and the oracle
    * replays every plane in closed form. Documents with doc_id % 37 ==
    * 0 ship CORRUPT payloads — alternately truncated mid-header and
    * rewritten to 2×1 luma sampling (4:2:2 — a REAL layout this decoder
    * does not support and must refuse, the round-10 verdict's
    * "mismatched sampling factors" quarantine fixture).
    */
  def jpegColorTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val w = 16 * (1 + id % 2).toInt
      val h = 16 * (1 + id % 3).toInt
      val bytes = encodeJpegColor(w, h,
        (tx, ty) => ((id * 5 + 7L * tx + 11L * ty) % 256).toInt,
        (mx, my) => ((id * 7 + 13L * mx + 3L * my) % 256).toInt,
        (mx, my) => ((id * 11 + 5L * mx + 17L * my) % 256).toInt)
      val payload =
        if (id % 37 != 0) bytes
        else if ((id / 37) % 2 == 0) java.util.Arrays.copyOf(bytes, 12) // truncated mid-DQT
        else {
          val c = bytes.clone()
          // Y sampling byte: SOI(2) + DQT(2+2+2·65) + SOF0 marker/len/
          // precision/h/w/nc (10) + component id (1)
          val sampAt = 2 + 134 + 2 + 2 + 1 + 2 + 2 + 1 + 1
          require((c(sampAt) & 0xFF) == 0x22)
          c(sampAt) = 0x21.toByte // 4:2:2 — real, unsupported, must refuse
          c
        }
      MediaRecord(id, payload, "image/jpeg", payload.length.toLong)
    }
  }

  final case class JpegColorStats(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], phash: Option[Int],
      cb_sum: Option[Long], cr_sum: Option[Long])

  /** Color decode with quarantine: luma aHash (pixels packed r=g=b, the
    * q261 convention — luminance 4·Y, monotone so block comparisons are
    * unchanged) plus exact Cb/Cr plane sums at chroma resolution, the
    * integer-exact color statistics the closed-form oracle can replay.
    */
  def jpegColorStats(media: Dataset[MediaRecord]): Dataset[JpegColorStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val (w, h, yP, cbP, crP) = parseJpegColor(m.content)
          val px = new Array[Int](yP.length)
          var i = 0
          while (i < px.length) {
            val g = yP(i)
            px(i) = (g << 16) | (g << 8) | g
            i += 1
          }
          var cb = 0L
          var cr = 0L
          i = 0
          while (i < cbP.length) { cb += cbP(i); cr += crP(i); i += 1 }
          JpegColorStats(m.doc_id, "ok", Some(w.toLong), Some(h.toLong),
            Some(Multimodal.aHashFromPixels(w, h, px)), Some(cb), Some(cr))
        } catch {
          case scala.util.control.NonFatal(_) =>
            JpegColorStats(m.doc_id, "quarantined", None, None, None, None, None)
        }
      }
    }
  }

  /** JPEG aHash with quarantine — the q195 contract at the JPEG
    * boundary: corrupt bytes are data, not exceptions. Gray pixels pack
    * r=g=b (aHash luminance is then 4·gray — a monotone scaling, so
    * block comparisons are unchanged).
    */
  def jpegAHash(media: Dataset[MediaRecord]): Dataset[JpegHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val (w, h, gray) = parseJpegGray(m.content)
          val px = new Array[Int](gray.length)
          var i = 0
          while (i < px.length) {
            val g = gray(i)
            px(i) = (g << 16) | (g << 8) | g
            i += 1
          }
          JpegHashed(m.doc_id, "ok", Some(w.toLong), Some(h.toLong),
            Some(Multimodal.aHashFromPixels(w, h, px)))
        } catch {
          case scala.util.control.NonFatal(_) =>
            JpegHashed(m.doc_id, "quarantined", None, None, None)
        }
      }
    }
  }
}
