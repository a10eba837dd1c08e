package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The baseline-JPEG codec kernels behind q261: constant-tile images
  * must round-trip EXACTLY (DC-only blocks under the lossless-by-
  * construction quant table); the general entropy machinery (AC
  * run-lengths, ZRL, multi-category DC diffs, byte stuffing) must
  * decode the coefficients it was fed; corrupt payloads must be
  * rejected, never misdecoded; and crafted huge-dimension headers must
  * fail BEFORE allocation.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def tileVal(id: Long)(tx: Int, ty: Int): Int =
    ((id * 5 + 7L * tx + 11L * ty) % 256).toInt

  test("constant-tile images round-trip pixel-exactly across all corpus dims") {
    for (id <- Seq(0L, 1L, 2L, 3L, 17L, 255L, 256L, 1000L)) {
      val w = 8 * (2 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      val bytes = JpegCodec.encodeJpegGray(w, h, tileVal(id))
      val (pw, ph, px) = JpegCodec.parseJpegGray(bytes)
      assert((pw, ph) == (w, h), s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val want = tileVal(id)(x / 8, y / 8)
        assert(px(y * w + x) == want, s"doc $id pixel ($x,$y)")
      }
    }
  }

  private def cbVal(id: Long)(mx: Int, my: Int): Int =
    ((id * 7 + 13L * mx + 3L * my) % 256).toInt
  private def crVal(id: Long)(mx: Int, my: Int): Int =
    ((id * 11 + 5L * mx + 17L * my) % 256).toInt

  test("color 4:2:0 images round-trip every plane pixel-exactly") {
    for (id <- Seq(0L, 1L, 2L, 5L, 37L, 255L, 1000L)) {
      val w = 16 * (1 + id % 2).toInt
      val h = 16 * (1 + id % 3).toInt
      val bytes = JpegCodec.encodeJpegColor(w, h, tileVal(id), cbVal(id), crVal(id))
      val (pw, ph, yP, cbP, crP) = JpegCodec.parseJpegColor(bytes)
      assert((pw, ph) == (w, h), s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w)
        assert(yP(y * w + x) == tileVal(id)(x / 8, y / 8), s"doc $id Y ($x,$y)")
      val cw = w / 2
      for (y <- 0 until h / 2; x <- 0 until cw) {
        assert(cbP(y * cw + x) == cbVal(id)(x / 8, y / 8), s"doc $id Cb ($x,$y)")
        assert(crP(y * cw + x) == crVal(id)(x / 8, y / 8), s"doc $id Cr ($x,$y)")
      }
    }
  }

  test("mismatched sampling factors and cross-decoder frames are refused") {
    val color = JpegCodec.encodeJpegColor(16, 16, tileVal(3), cbVal(3), crVal(3))
    // 4:2:2 (2x1 luma): a REAL layout outside the supported subset
    val c422 = color.clone()
    val sampAt = 2 + 134 + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert((c422(sampAt) & 0xFF) == 0x22)
    c422(sampAt) = 0x21.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.parseJpegColor(c422))
    assert(e.getMessage.contains("sampling factors"), e.getMessage)
    // 4:4:4 (1x1 luma) equally refused
    val c444 = color.clone()
    c444(sampAt) = 0x11.toByte
    intercept[IllegalArgumentException](JpegCodec.parseJpegColor(c444))
    // the gray decoder refuses a color frame and vice versa
    intercept[IllegalArgumentException](JpegCodec.parseJpegGray(color))
    val gray = JpegCodec.encodeJpegGray(16, 16, tileVal(3))
    intercept[IllegalArgumentException](JpegCodec.parseJpegColor(gray))
    // every truncation prefix of a color payload fails through IAE too
    for (n <- 4 until color.length)
      intercept[IllegalArgumentException](
        JpegCodec.parseJpegColor(java.util.Arrays.copyOf(color, n)))
  }

  test("AC coefficients, runs, and ZRL decode to the coefficients encoded") {
    // one 8x8 block exercising: DC, a leading AC, a 3-zero run, a
    // 16-zero ZRL run, and negative amplitudes; quantized values stay
    // within the table's (run<=3 after ZRL, size<=8) support
    val blk = new Array[Int](64)
    blk(0) = -37 // DC (quantized)
    import JpegCodec.Zigzag
    blk(Zigzag(1)) = 5     // run 0
    blk(Zigzag(5)) = -9    // run 3
    blk(Zigzag(22)) = 100  // run 16 (ZRL) + run 0
    blk(Zigzag(25)) = -128 // run 2, size 8
    val bytes = JpegCodec.encodeJpegFromCoeffs(8, 8, Seq(blk))
    val (w, h, px) = JpegCodec.parseJpegGray(bytes)
    assert((w, h) == (8, 8))
    // reference: dequantize + the same IDCT kernel — equality proves
    // the Huffman/zigzag/run-length/amplitude path reproduced the
    // block verbatim (IDCT numerics are pinned by the DC-exact test
    // and the analytic single-AC test below)
    val deq = Array.tabulate(64)(i => blk(i) * JpegCodec.Quant(i))
    val want = JpegCodec.idct8x8(deq)
    assert(px.toSeq == want.toSeq)
  }

  test("single AC coefficient matches the analytic cosine surface") {
    // F(u=1, v=0) = q: f(x, y) = (q/4)·(1/sqrt2)·cos((2x+1)pi/16),
    // constant in y — computed here independently of the codec
    val blk = new Array[Int](64)
    blk(1) = 3 // natural index 1 = (u=1, v=0), quantized
    val bytes = JpegCodec.encodeJpegFromCoeffs(8, 8, Seq(blk))
    val (_, _, px) = JpegCodec.parseJpegGray(bytes)
    val q = 3.0 * JpegCodec.Quant(1)
    for (y <- 0 until 8; x <- 0 until 8) {
      val f = (q / 4.0) * (1.0 / StrictMath.sqrt(2.0)) *
        StrictMath.cos((2 * x + 1) * StrictMath.PI / 16.0)
      val want = math.max(0, math.min(255, math.round(f).toInt + 128))
      assert(px(y * 8 + x) == want, s"pixel ($x,$y)")
    }
  }

  test("multi-block images carry DC differences across MCUs") {
    // 4 blocks with DCs crossing zero both ways — exercises diff
    // categories and negative amplitude encoding
    val dcs = Seq(-120, 90, -3, 127)
    val blocks = dcs.map { dc => val b = new Array[Int](64); b(0) = dc; b }
    val bytes = JpegCodec.encodeJpegFromCoeffs(16, 16, blocks)
    val (_, _, px) = JpegCodec.parseJpegGray(bytes)
    val expected = dcs.map(dc => math.max(0, math.min(255, dc + 128)))
    val got = Seq(px(0), px(8), px(8 * 16), px(8 * 16 + 8))
    assert(got == expected)
  }

  test("corrupt payloads are rejected, never misdecoded") {
    val bytes = JpegCodec.encodeJpegGray(16, 8, tileVal(7))
    intercept[IllegalArgumentException](
      JpegCodec.parseJpegGray("not a jpeg".getBytes("US-ASCII")))
    // truncation mid-header (the corpus's even corrupt lane) — and the
    // full IAE contract: EVERY malformation fails through the same path
    intercept[IllegalArgumentException](
      JpegCodec.parseJpegGray(java.util.Arrays.copyOf(bytes, 12)))
    // truncation inside every header segment (DQT/SOF/DHT/SOS bodies):
    // each prefix must raise IAE, never ArrayIndexOutOfBoundsException
    for (n <- 4 until bytes.length)
      intercept[IllegalArgumentException](
        JpegCodec.parseJpegGray(java.util.Arrays.copyOf(bytes, n)))
    // SOF9 (arithmetic coding) — the odd corrupt lane
    val sof9 = bytes.clone()
    val sofAt = 2 + 2 + 2 + 65
    assert((sof9(sofAt + 1) & 0xFF) == 0xC0)
    sof9(sofAt + 1) = 0xC9.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.parseJpegGray(sof9))
    assert(e.getMessage.contains("baseline SOF0 only"), e.getMessage)
    // truncated entropy data
    intercept[IllegalArgumentException](
      JpegCodec.parseJpegGray(java.util.Arrays.copyOf(bytes, bytes.length - 6)))
  }

  test("header-claimed huge dimensions are rejected before allocation") {
    val bytes = JpegCodec.encodeJpegGray(16, 8, tileVal(7)).clone()
    // SOF0 height/width sit at sofAt + 5 (after marker, len, precision)
    val sofAt = 2 + 2 + 2 + 65
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putShort(sofAt + 5, 32760.toShort) // height
    bb.putShort(sofAt + 7, 32760.toShort) // width
    val e = intercept[IllegalArgumentException](JpegCodec.parseJpegGray(bytes))
    assert(e.getMessage.contains("could encode"), e.getMessage)
  }

  test("quarantine catches exactly the corrupt slice; hashes are dimension-consistent") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val rows = JpegCodec.jpegAHash(JpegCodec.jpegTable(spark, d))
      .map(r => (r.doc_id, r.status, r.width, r.height)).collect()
    rows.foreach { case (id, st, w, h) =>
      val want = if (id % 43 == 0) "quarantined" else "ok"
      assert(st == want, s"doc $id: $st, want $want")
      if (st == "ok") {
        assert(w.contains(8L * (2 + id % 3)), s"doc $id width $w")
        assert(h.contains(8L * (1 + id % 2)), s"doc $id height $h")
      }
    }
  }
}
