package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("media table carries opaque bytes with consistent metadata") {
    val media = Multimodal.asMediaTable(spark, dir)
    val bad = media.toDF().where(octet_length(col("content")) =!= col("n_bytes"))
    assert(bad.count() == 0)
  }

  test("per-partition decode produces normalized histograms deterministically") {
    val feats = Multimodal.decodeFeatures(Multimodal.asMediaTable(spark, dir))
    val rows  = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.histogram.length == 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, s"histogram must normalize: ${f.doc_id}")
      assert(f.energy >= 0 && f.energy <= 255)
    }
    // determinism across runs/partitionings
    val again = Multimodal
      .decodeFeatures(Multimodal.asMediaTable(spark, dir).repartition(7))
      .collect().map(f => f.doc_id -> f.energy).toMap
    assert(rows.map(f => f.doc_id -> f.energy).toMap == again)
  }

  test("frame sampling splits payloads into strided frames") {
    val frames = Multimodal.frameSample(Multimodal.asMediaTable(spark, dir), stride = 64)
    assert(frames.where(col("frame_bytes") > 64).count() == 0)
    assert(frames.count() > 0)
  }

  test("WAV PCM16 encode -> parse round-trips samples exactly") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes   = Multimodal.encodeWavPcm16(samples, 44100)
    val (rate, parsed) = Multimodal.parseWavPcm16(bytes)
    assert(rate == 44100)
    assert(parsed.toSeq == samples.map(_.toInt).toSeq)
  }

  test("WAV parser walks extra chunks instead of assuming a 44-byte header") {
    val samples = Array[Short](100, -200, 300)
    val base    = Multimodal.encodeWavPcm16(samples, 8000)
    // splice a LIST chunk (odd-sized, to exercise word alignment)
    // between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    // patch the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val (rate, parsed) = Multimodal.parseWavPcm16(spliced)
    assert(rate == 8000)
    assert(parsed.toSeq == Seq(100, -200, 300))
  }

  test("BMP24 encode -> parse round-trips pixels exactly across all pad widths") {
    // widths 5..8 cover row padding 1, 2, 3, 0
    (5 to 8).foreach { w =>
      val h = 3
      def px(x: Int, y: Int) = (x * 40 % 256, y * 80 % 256, (x + y) % 256)
      val bytes = Multimodal.encodeBmp24(w, h, px)
      val (pw, ph, pixels) = Multimodal.parseBmp24(bytes)
      assert(pw == w && ph == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        assert(pixels(y * w + x) == (r << 16 | g << 8 | b),
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("malformed payloads are rejected, not misdecoded") {
    intercept[IllegalArgumentException](
      Multimodal.parseWavPcm16("nonsense bytes here".getBytes))
    intercept[IllegalArgumentException](
      Multimodal.parseBmp24(Array.fill[Byte](60)(7)))
  }

  test("decodeFeatures routes wav/bmp through the real parsers") {
    import org.apache.spark.sql.{Dataset, SparkSession}
    val s = spark
    import s.implicits._
    // constant-amplitude WAV: RMS == |amplitude|
    val wav = Multimodal.encodeWavPcm16(Array.fill[Short](50)(1000), 8000)
    // uniform mid-gray BMP: mean luminance == 128
    val bmp = Multimodal.encodeBmp24(6, 4, (_, _) => (128, 128, 128))
    val media: Dataset[Multimodal.MediaRecord] = Seq(
      Multimodal.MediaRecord(1L, wav, "audio/wav", wav.length.toLong),
      Multimodal.MediaRecord(2L, bmp, "image/bmp", bmp.length.toLong)
    ).toDS()
    val feats = Multimodal.decodeFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(math.abs(feats(1L).energy - 1000.0) < 1e-9)
    assert(math.abs(feats(2L).energy - 128.0) < 1e-9)
    // all 50 samples of 1000 land in bin (1000+32768)>>12 = 8
    assert(feats(1L).histogram(8) == 1.0)
    // all pixels land in luminance bin 128>>4 = 8
    assert(feats(2L).histogram(8) == 1.0)
  }
}
