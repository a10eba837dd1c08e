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
}
