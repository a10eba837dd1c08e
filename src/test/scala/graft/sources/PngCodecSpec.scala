package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec kernels behind q195: encode → parse must round-trip
  * pixels exactly through real DEFLATE compression and each of the five
  * scanline filter predictors; corrupt payloads must quarantine (never
  * decode to wrong pixels); and the aHash must be a property of the
  * image, not the container (PNG signature == BMP signature for the
  * same pixels).
  */
class PngCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def px(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 3 + x + 11L * y) % 256).toInt,
    ((id * 2 + 5L * x + y) % 256).toInt,
    ((id + 3L * x + 7L * y) % 256).toInt
  )

  test("encode -> parse round-trips pixels exactly under every filter predictor") {
    for (ft <- 0 to 4) {
      val (w, h) = (13, 7) // odd width: row stride exercises the a/c=0 edges
      val bytes = Multimodal.encodePng(w, h, px(ft * 1000L + 17), _ => ft)
      val (pw, ph, pixels) = Multimodal.parsePng(bytes)
      assert((pw, ph) == (w, h), s"filter $ft dims")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(ft * 1000L + 17)(x, y)
        val got = pixels(y * w + x)
        assert(got == (r << 16 | g << 8 | b),
          s"filter $ft pixel ($x,$y): got ${got.toHexString}, want ${(r << 16 | g << 8 | b).toHexString}")
      }
    }
  }

  test("per-row mixed filters (the generator's (id+y) % 5 cycle) round-trip") {
    val (w, h) = (9, 6)
    val bytes = Multimodal.encodePng(w, h, px(99), y => (99 + y) % 5)
    val (_, _, pixels) = Multimodal.parsePng(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(99)(x, y)
      assert(pixels(y * w + x) == (r << 16 | g << 8 | b), s"pixel ($x,$y)")
    }
  }

  test("a flipped bit anywhere fails the CRC, truncation fails the chunk walk") {
    val bytes = Multimodal.encodePng(8, 4, px(7), _ => 4)
    // flip one bit in the IDAT data region (after IHDR = 8 + 25 bytes,
    // inside the IDAT chunk data)
    val corrupt = bytes.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x10).toByte
    intercept[IllegalArgumentException](Multimodal.parsePng(corrupt))
    intercept[IllegalArgumentException](
      Multimodal.parsePng(java.util.Arrays.copyOf(bytes, 20)))
    intercept[IllegalArgumentException](
      Multimodal.parsePng("not a png at all".getBytes("US-ASCII")))
  }

  test("header-claimed huge dimensions are rejected before allocation, not OOM") {
    // take a valid PNG and rewrite IHDR to claim 65535x65535 (with a
    // recomputed CRC so the chunk walk accepts it): the decoder must
    // reject on the payload-size bound — an IllegalArgumentException the
    // quarantine path absorbs — instead of allocating a ~12 GB scanline
    // buffer and dying on OutOfMemoryError
    val bytes = Multimodal.encodePng(8, 4, px(7), _ => 0).clone()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(8 + 8, 65535)  // IHDR width  (8 sig + 4 len + 4 type)
    bb.putInt(8 + 12, 65535) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 8 + 4, 4 + 13)
    bb.putInt(8 + 8 + 13, crc.getValue.toInt)
    val e = intercept[IllegalArgumentException](Multimodal.parsePng(bytes))
    assert(e.getMessage.contains("could inflate to"), e.getMessage)
  }

  test("aHash is container-independent: PNG signature == BMP signature per doc") {
    import spark.implicits._
    val fromPng = Multimodal.pngAHash(Multimodal.pngTable(spark, d))
      .filter(_.status == "ok")
      .map(r => (r.doc_id, r.width.get, r.height.get, r.phash.get))
      .collect().toSet
    val fromBmp = Multimodal.bmpAHash(Multimodal.bmpTable(spark, d))
      .map(r => (r.doc_id, r.width, r.height, r.phash))
      .filter(t => t._1 % 41 != 0) // PNG corpus quarantines this slice
      .collect().toSet
    assert(fromPng == fromBmp,
      s"PNG-side ${fromPng.size} signatures vs BMP-side ${fromBmp.size}")
  }

  test("quarantine catches exactly the corrupt slice") {
    import spark.implicits._
    val statuses = Multimodal.pngAHash(Multimodal.pngTable(spark, d))
      .map(r => (r.doc_id, r.status)).collect()
    statuses.foreach { case (id, st) =>
      val want = if (id % 41 == 0) "quarantined" else "ok"
      assert(st == want, s"doc $id: $st, want $want")
    }
  }
}
