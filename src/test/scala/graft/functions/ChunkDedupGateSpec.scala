package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The planted cross-document-overlap pair the round-13 verdict asked
  * for: doc-grain dedup (whole-doc hash AND the minhash bands) provably
  * misses it, the chunk-grain gate (q322's report consumed as a drop
  * stage, wired into the q290/q309 build) provably catches it.
  *
  * Corpus: A = 200 distinct tokens; B = A's first 56 tokens + 24 unique
  * tokens (the classic "short excerpt of a long original"); C fully
  * unique. B's q320-grain windows at starts 0/24/48: the first two lie
  * inside the shared prefix and fingerprint identically to A's windows
  * at the same starts; the third mixes shared and unique tokens. So
  * 2 of B's 3 chunks are duplicates → dup·2 = 4 > 3 → B drops.
  * Meanwhile Jaccard over 3-shingles ≈ 54/222 ≈ 0.24 — far below the
  * banding design point — and the whole-doc hashes differ, so neither
  * doc-grain stage can see the overlap.
  */
class ChunkDedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planted = {
    import spark.implicits._
    val a = (1 to 200).map(i => s"alpha$i")
    val b = a.take(56) ++ (1 to 24).map(i => s"beta$i")
    val c = (1 to 80).map(i => s"gamma$i")
    Seq(
      (1L, a.mkString(" ")),
      (2L, b.mkString(" ")),
      (3L, c.mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("chunk gate drops exactly the planted excerpt") {
    val drops = CorpusBuildQueries.chunkDupDrops(planted)
      .collect().map(_.getLong(0)).toSet
    assert(drops === Set(2L))
  }

  test("doc-grain exact dedup misses the pair: whole-doc hashes differ") {
    val hashes = planted
      .select(md5(TextFunctions.normalizeText(col("text"))).as("h"))
      .collect().map(_.getString(0))
    assert(hashes.distinct.length === 3)
  }

  test("doc-grain near-dup (minhash bands) misses the pair") {
    graft.plans.VectorFunctions.register(spark)
    val pairs = DedupQueries
      .minhashCandidatePairsOf(DedupQueries.shingleDfOf(planted))
      .select(col("ida"), col("idb")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)), s"bands unexpectedly paired A,B: $pairs")
  }

  test("keeper is order-stable: the LOWER doc_id survives") {
    // swap ids: the excerpt now precedes the original, so the ORIGINAL's
    // first two windows become the duplicates — but 2 of the original's
    // 8 chunks is a minority, so nothing drops: majority is the gate
    import spark.implicits._
    val a = (1 to 200).map(i => s"alpha$i")
    val b = a.take(56) ++ (1 to 24).map(i => s"beta$i")
    val swapped = Seq(
      (1L, b.mkString(" ")),
      (2L, a.mkString(" "))
    ).toDF("doc_id", "text")
    val drops = CorpusBuildQueries.chunkDupDrops(swapped)
      .collect().map(_.getLong(0)).toSet
    assert(drops === Set.empty[Long])
  }
}
