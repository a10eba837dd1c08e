package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multinomial Naive Bayes (q273-q275) and χ² feature selection (q276):
  * the fit's smoothed counts and log-likelihood ratios are hand-traced
  * on a constructed corpus, apply reproduces the hand-computed holdout
  * score (prior + sorted term fold), and the evaluation queries are
  * sanity-bounded on the real corpus.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A corpus whose labels and token counts are fully known:
    * `good` scores 100 on the rule gate (length 200-4000 → 40, ≥3
    * stopword hits → 30, +30 base, no punct/digit penalty); `bad`
    * scores 45 (<50 chars → 10, 0 stops → 5, +30). Ids 0-3 are train
    * folds, id 4 is the holdout fold (doc_id % 5 == 4).
    */
  private def tinyCorpus(): String = {
    val good = ("the cake and the bread of the day is fresh " * 5).trim
    val bad = "zzz qqq zzz"
    val dir = java.nio.file.Files.createTempDirectory("nbspec").toString
    import spark.implicits._
    Seq(
      (0L, good, "en", "s1", good.length.toLong),
      (1L, good, "en", "s1", good.length.toLong),
      (2L, bad, "und", "s2", bad.length.toLong),
      (3L, bad, "und", "s2", bad.length.toLong),
      (4L, good, "en", "s1", good.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q273 fit hand-trace: smoothed llr of known token counts") {
    val d = tinyCorpus()
    val rows = graft.SparkEntry.queries("q273_nb_fit")(spark, d)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("c0"), r.getAs[Long]("c1"), r.getAs[Double]("llr")))).toMap
    assert(rows.size === 10) // the cake and bread of day is fresh zzz qqq
    // 3 good docs × (15×the + 5×each of 7 others) = N1 150; 2 bad docs
    // × (2×zzz + 1×qqq) = N0 6; V = 10
    assert(rows("the")._1 === 0L && rows("the")._2 === 45L)
    assert(rows("zzz")._1 === 4L && rows("zzz")._2 === 0L)
    assert(rows("qqq")._1 === 2L && rows("qqq")._2 === 0L)
    val llrThe = math.log((45.0 + 1) * (6 + 10) / ((0 + 1) * (150.0 + 10)))
    val llrZzz = math.log((0.0 + 1) * (6 + 10) / ((4 + 1) * (150.0 + 10)))
    assert(math.abs(rows("the")._3 - llrThe) < 1e-6, s"llr(the) = ${rows("the")._3}")
    assert(math.abs(rows("zzz")._3 - llrZzz) < 1e-6, s"llr(zzz) = ${rows("zzz")._3}")
  }

  test("q274 apply hand-trace: holdout score = prior + Σ c·llr over train model") {
    val d = tinyCorpus()
    val rows = graft.SparkEntry.queries("q274_nb_apply")(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") === 4L)
    assert(r.getAs[Int]("actual") === 1)
    assert(r.getAs[Long]("n_toks") === 50L)
    // train: 2 good (N1=100: the 30, 7 others 10 each), 2 bad (N0=6),
    // V=10, priors D1=D0=2 → prior=0
    def llr(c0: Long, c1: Long): Double =
      math.log((c1 + 1.0) * (6 + 10) / ((c0 + 1.0) * (100.0 + 10)))
    val expected = 15 * llr(0, 30) + 35 * llr(0, 10)
    assert(math.abs(r.getAs[Double]("nb_score") - expected) < 1e-5,
      s"score = ${r.getAs[Double]("nb_score")}, expected ≈ $expected")
    assert(r.getAs[Boolean]("predicted_good"))
  }

  test("q274/q275 separate good from bad on the real corpus (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val conf = graft.SparkEntry.queries("q275_nb_confusion")(spark, d)
      .collect().map(r => (r.getAs[Int]("actual"),
        r.getAs[Boolean]("predicted_good")) -> r.getAs[Long]("n")).toMap
    val n = conf.values.sum
    assert(n === 100L) // one fold of 500 docs
    val correct = conf.getOrElse((1, true), 0L) + conf.getOrElse((0, false), 0L)
    assert(correct.toDouble / n >= 0.7,
      s"NB holdout accuracy = ${correct.toDouble / n} (confusion $conf)")
  }

  test("q288: maintained NB model equals the one-shot fit row for row") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val oneShot = graft.SparkEntry.queries("q273_nb_fit")(spark, d)
      .collect().map(_.toSeq).toSet
    val maintained = graft.SparkEntry.queries("q288_nb_incremental")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(maintained === oneShot)
  }

  test("q279 OOV rate counts exactly the tokens missing from the train vocab") {
    val good = ("the cake and the bread of the day is fresh " * 5).trim
    val dir = java.nio.file.Files.createTempDirectory("oovspec").toString
    import spark.implicits._
    Seq(
      (0L, good, "en", "s1", good.length.toLong),
      (1L, good, "en", "s1", good.length.toLong),
      (2L, "zzz qqq zzz", "und", "s2", 11L),
      (3L, "zzz qqq zzz", "und", "s2", 11L),
      // holdout: 12 seen tokens + 2 occurrences of an unseen one
      (4L, "the cake and the bread of the day is fresh zebra zebra qqq",
        "en", "s1", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q279_oov_rate")(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("lang") === "en")
    assert(r.getAs[Long]("n_toks") === 13L)
    assert(r.getAs[Long]("n_oov") === 2L)
    assert(math.abs(r.getAs[Double]("oov_rate") - 2.0 / 13.0) < 1e-6)
  }

  test("q280 McNemar cells partition the holdout and the statistic is consistent") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q280_mcnemar_models")(spark, d).head()
    val (n, br, bw, lo, no) = (r.getAs[Long]("n"), r.getAs[Long]("both_right"),
      r.getAs[Long]("both_wrong"), r.getAs[Long]("logit_only"), r.getAs[Long]("nb_only"))
    assert(n === 100L)
    assert(br + bw + lo + no === n)
    val m = r.getAs[Double]("mcnemar")
    val expected = if (lo + no > 0) (lo - no).toDouble * (lo - no) / (lo + no) else 0.0
    assert(math.abs(m - expected) < 1e-6)
    // both models must actually work: agreement dominates disagreement
    assert(br > lo + no, s"both_right=$br logit_only=$lo nb_only=$no")
  }

  test("q276 chi² matches an independent recount on the real corpus (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val got = graft.SparkEntry.queries("q276_chi2_tokens")(spark, d)
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("df_good"), r.getAs[Double]("chi2")))).toMap
    assert(got.nonEmpty)
    // independent recount: document-level presence × rule-gate label
    // straight off the raw table with basic ops
    val pres = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        when(graft.functions.TextFunctions.qualityScore(col("text")) >= 80, 1L)
          .otherwise(0L).as("y"),
        explode(array_distinct(split(
          graft.functions.TextFunctions.normalizeText(col("text")), " "))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("df"), sum("y").as("a"))
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("a")))).toMap
    val dG = graft.Tables.documents(spark, d)
      .where(graft.functions.TextFunctions.qualityScore(col("text")) >= 80).count()
    val dB = 500L - dG
    got.foreach { case (tok, (df, a, chi2)) =>
      val (edf, ea) = pres(tok)
      assert(df === edf && a === ea, s"counts for '$tok'")
      val (ad, bd, cd, dd) = (a.toDouble, (df - a).toDouble,
        (dG - a).toDouble, (dB - (df - a)).toDouble)
      val num = ad * dd - bd * cd
      val expected = ((dG + dB).toDouble * num * num) /
        (((ad + bd) * (cd + dd)) * ((ad + cd) * (bd + dd)))
      assert(math.abs(chi2 - expected) < 1e-5, s"chi2('$tok') = $chi2 vs $expected")
      assert(df >= 20 && (500 - df) >= 20, s"df filter violated for '$tok'")
      assert(!chi2.isNaN && !chi2.isInfinite && chi2 >= 0.0)
    }
    // the corpus's quality gate leans on English stopword density, so at
    // least one token must be strongly associated with the label
    assert(got.values.map(_._3).max > 3.841459, "no token clears the 95% χ² bar")
  }
}
