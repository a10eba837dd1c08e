package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic edge cases for the corpus-diagnostic operators added after
  * the round-7 gate (q153 exact-substring spans, q154 BPE merge pairs,
  * q155 source overlap) on CRAFTED corpora where every expected number
  * is hand-derivable — the sf corpus oracle proves engine-equivalence,
  * these prove the operator computes the thing it claims.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Stage a throwaway documents.parquet with the driver's schema. */
  private def stage(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_diag_").toString
    rows
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q153: cross-doc shared 8-token span, within-doc repeat, and short doc") {
    val dir = stage(Seq(
      // doc 1 and 2 share exactly the window "a b c d e f g h"
      (1L, "a b c d e f g h x y z", "en", "s1"),        // 11 tokens -> 4 windows
      (2L, "p q r a b c d e f g h w", "en", "s1"),      // 12 tokens -> 5 windows
      (3L, "one two three four five six seven", "en", "s1"), // 7 tokens -> 0 windows
      (4L, "m m m m m m m m m", "en", "s1")             // 9 tokens -> 2 identical windows
    ))
    val got = graft.SparkEntry.queries("q153_exact_substring_spans")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 1L, 0.25)))
    assert(got(2L) === ((5L, 1L, 0.2)))
    assert(got(3L) === ((0L, 0L, 0.0)))
    assert(got(4L) === ((2L, 2L, 1.0))) // within-doc verbatim repetition counts
  }

  test("q154: pair counts are weighted by word frequency over the distinct vocab") {
    val dir = stage(Seq(
      (1L, "abc abc xy", "en", "s1"),
      (2L, "abc q", "en", "s1") // 'q' is 1 char: contributes no pair
    ))
    val got = graft.SparkEntry.queries("q154_bpe_merge_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // abc x3 -> ab:3, bc:3; xy x1 -> xy:1; ties break by pair ASC
    assert(got.toSeq === Seq(("ab", 3L), ("bc", 3L), ("xy", 1L)))
  }

  test("q155: shingle-set Jaccard at source grain; zero-overlap pairs absent") {
    val dir = stage(Seq(
      (1L, "a b c d", "en", "srcA"), // shingles: "a b c", "b c d"
      (2L, "a b c e", "en", "srcB"), // shingles: "a b c", "b c e"
      (3L, "z0 z1 z2", "en", "srcC") // disjoint shingle set
    ))
    val got = graft.SparkEntry.queries("q155_source_overlap")(spark, dir).collect()
    assert(got.length === 1) // only the overlapping pair appears
    val r = got.head
    assert((r.getString(0), r.getString(1)) === (("srcA", "srcB")))
    assert((r.getLong(2), r.getLong(3)) === ((1L, 3L))) // |inter|=1, |union|=3
    assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-15)
  }

  test("q157 kernel: CDC boundaries are insertion-local; tokens conserved") {
    import spark.implicits._
    // 30 seeded docs (30-80 tokens from a small vocab) and for each a
    // twin with one token PREPENDED. Content-defined framing means the
    // twin's chunks differ from the original's ONLY up to the first
    // surviving boundary: ≤1 head chunk lost from the original, ≤2
    // gained by the twin (the prefix may introduce one extra boundary
    // inside the head). Fixed-stride framing (q124) shifts EVERY frame
    // — this bound is exactly what "content-defined" buys.
    val rnd   = new scala.util.Random(7)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel")
    val docs = (0 until 30).map { i =>
      val n = 30 + rnd.nextInt(51)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val twins = docs.map { case (id, text) => (id + 1000L, s"qqq $text") }
    val chunks = DedupQueries
      .cdcChunks((docs ++ twins).toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getString(2), r.getInt(3))).toSeq).toMap
    docs.foreach { case (id, text) =>
      val a = chunks(id).map(_._1).groupBy(identity).view.mapValues(_.size).toMap
      val b = chunks(id + 1000L).map(_._1).groupBy(identity).view.mapValues(_.size).toMap
      def excess(x: Map[String, Int], y: Map[String, Int]) =
        x.map { case (k, n) => math.max(0, n - y.getOrElse(k, 0)) }.sum
      assert(excess(a, b) <= 1, s"doc $id: original lost ${excess(a, b)} chunks")
      assert(excess(b, a) <= 2, s"doc $id: twin gained ${excess(b, a)} chunks")
      // token conservation: chunk sizes sum to the doc's token count
      assert(chunks(id).map(_._2).sum === text.split(" ").length)
    }
  }

  test("q153/q155 on the sf0.001 corpus: internal consistency") {
    val dir = "/root/testdata/sf0.001"
    val subs = graft.SparkEntry.queries("q153_exact_substring_spans")(spark, dir).cache()
    // duplicated positions never exceed total positions; frac consistent
    assert(subs.where(col("n_dup") > col("n_windows")).count() === 0L)
    assert(subs.where(col("n_windows") > 0 &&
      abs(col("dup_frac") - col("n_dup").cast("double") / col("n_windows")) > lit(1e-12))
      .count() === 0L)
    subs.unpersist()
    val ov = graft.SparkEntry.queries("q155_source_overlap")(spark, dir).cache()
    // jaccard in (0, 1]; union >= inter >= 1; pairs ordered src_a < src_b
    assert(ov.where(col("jaccard") <= 0 || col("jaccard") > 1).count() === 0L)
    assert(ov.where(col("n_union") < col("n_inter") || col("n_inter") < 1).count() === 0L)
    assert(ov.where(col("src_a") >= col("src_b")).count() === 0L)
    ov.unpersist()
  }
}
