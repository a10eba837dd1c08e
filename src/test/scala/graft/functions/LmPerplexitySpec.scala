package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q166 bigram-LM perplexity filter: hand-computable LM probabilities on
  * a 3-document corpus, plus corpus invariants.
  */
class LmPerplexitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stage(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ppl_").toString
    rows.map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q166: NLL matches the hand-built bigram LM; relative cut flags the outlier") {
    // LM over all three docs: (a,b):3 of 4 a-starts -> p(b|a)=3/4,
    // (a,c):1 -> p(c|a)=1/4, (b,a):2 of 2 -> p(a|b)=1.
    val dir = stage(Seq(
      (1L, "a b a b a"), // bigrams ab,ba,ab,ba: nll = -(2·ln(3/4)+2·ln(1))/4
      (2L, "a b"),       // nll = -ln(3/4)
      (3L, "a c")))      // nll = -ln(1/4) — the improbable doc
    val got = graft.SparkEntry.queries("q166_lm_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val ln34 = -math.log(3.0 / 4.0)
    assert(got(1L)._1 === 4L)
    assert(math.abs(got(1L)._2 - 2 * ln34 / 4) < 1e-6)
    assert(math.abs(got(2L)._2 - ln34) < 1e-6)
    assert(math.abs(got(3L)._2 - (-math.log(1.0 / 4.0))) < 1e-6)
    // mean nll ≈ 0.605939; only doc 3 (1.386294) clears the 1.05× cut
    assert(got.view.mapValues(_._3).toMap === Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("q175: unseen bigrams back off to 0.4x add-one unigrams; OOV keeps the floor") {
    // train (ids 1,2): "a b" twice -> p(b|a)=1; unigrams a:2 b:2 ->
    // T=4, V=2. eval (id 3): "a b a c" -> (a,b) seen p=1; (b,a) backs
    // off 0.4*(2+1)/6 = 0.2; (a,c) has OOV 'c' -> 0.4*(0+1)/6.
    val dir = stage(Seq((1L, "a b"), (2L, "a b"), (3L, "a b a c")))
    val got = graft.SparkEntry.queries("q175_lm_backoff_score")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("doc_id") === 3L)
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Long]("n_backoff") === 2L)
    val want = -(math.log(1.0) + math.log(0.2) + math.log(0.4 / 6)) / 3
    assert(math.abs(r.getAs[Double]("nll") - want) < 1e-5)
  }

  test("q175: only the eval slice is scored; train docs never appear") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q175_lm_backoff_score")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id"))
    assert(out.nonEmpty && out.forall(_ % 3 == 0))
  }

  test("q166: corpus invariants — every multi-token doc scored, positive NLL, minority tail") {
    val dir  = "/root/testdata/sf0.001"
    val out  = graft.SparkEntry.queries("q166_lm_perplexity")(spark, dir).cache()
    val docs = graft.Tables.documents(spark, dir)
      .where(size(split(TextFunctions.normalizeText(col("text")), " ")) >= 2).count()
    assert(out.count() === docs)
    assert(out.where(col("nll") <= 0.0).count() === 0L)
    val flagged = out.where(col("is_flagged")).count()
    assert(flagged < docs / 2) // the cut marks a tail, not the body
    out.unpersist()
  }
}
