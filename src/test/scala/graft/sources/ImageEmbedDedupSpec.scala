package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-near-dup floor for the embedding-space image dedup (q316):
  * every planted 2× re-render must land in its base image's cluster
  * (recall 1.0 — deterministic: the re-render's grid-mean feature is
  * bit-equal to its base's, so same IVF list, cosine ~1 edge, same
  * component), while the (w, h, phash) grain the pHash dedups use
  * catches NONE of them (dims differ by construction). Both gated
  * scale factors.
  */
class ImageEmbedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(sf: String): String = s"/root/testdata/$sf"

  private def checkSf(sf: String): Unit = {
    val d = corpus(sf)
    assume(new java.io.File(d).isDirectory, s"corpus absent: $d")

    val out = graft.SparkEntry.queries("q316_image_embed_dedup")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val variants = out.keys.filter(_ >= JpegCodec.VariantOffset).toSeq
    assert(variants.nonEmpty, "no planted variants in the corpus")

    // recall floor = 1.0: every variant shares its base's cluster and
    // is never the keeper (the base id is always smaller)
    variants.foreach { v =>
      val base = v - JpegCodec.VariantOffset
      assert(out(v)._2 == out(base)._2,
        s"variant $v not clustered with base $base: ${out(v)} vs ${out(base)}")
      assert(out(v)._1 == "dropped", s"variant $v should be dropped: ${out(v)}")
    }

    // the pHash grain misses ALL of them: no variant shares a
    // (w, h, phash) group with its base (dims doubled)
    val hashed = JpegCodec.jpegAHash(JpegCodec.jpegVariantTable(spark, d)).toDF()
      .where(col("status") === "ok")
      .select(col("doc_id"), col("width"), col("height"), col("phash"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    val caughtByPhash = variants.count { v =>
      hashed(v) == hashed(v - JpegCodec.VariantOffset)
    }
    assert(caughtByPhash == 0,
      s"$caughtByPhash variants unexpectedly share the (w, h, phash) key with their base")

    // and the phash BITS alone do match (scale-invariant comparisons):
    // the miss is purely the dims grain — the precise gap the
    // embedding feature closes
    val phashOnlyMatches = variants.count { v =>
      hashed(v)._3 == hashed(v - JpegCodec.VariantOffset)._3
    }
    assert(phashOnlyMatches == variants.size,
      "re-render aHash bits should be scale-invariant by construction")
    spark.catalog.clearCache()
  }

  test("planted 2x re-renders: embed-dedup recall 1.0, phash-grain recall 0 (sf0.001)") {
    checkSf("sf0.001")
  }

  test("planted 2x re-renders: embed-dedup recall 1.0, phash-grain recall 0 (sf0.01)") {
    checkSf("sf0.01")
  }
}
