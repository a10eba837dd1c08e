package graft.operators

import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IRLS logistic quality classifier (q263-q265): the trained model
  * must reproduce the rule gate it distills on held-out documents, its
  * probabilities must be calibrated-sane, and a perfectly separable toy
  * corpus must stay finite through the η clamp (the case where naive
  * IRLS diverges and the weight μ(1-μ) underflows to an exact 0).
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fit is sane and apply agrees with the rule gate on the real corpus (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val fit = graft.SparkEntry.queries("q263_logit_quality_fit")(spark, d).head()
    assert(fit.getAs[Long]("n") === 500L)
    for (i <- 0 to 4) {
      val b = fit.getAs[Double](s"b$i")
      assert(!b.isNaN && !b.isInfinite, s"b$i = $b")
    }
    val applied = graft.SparkEntry.queries("q264_logit_quality_apply")(spark, d)
    val labels = graft.Tables.documents(spark, d).select(col("doc_id"),
      when(TextFunctions.qualityScore(col("text")) >= 80, true).otherwise(false).as("label"))
    val joined = applied.join(labels, "doc_id").collect()
    assert(joined.length === 500)
    joined.foreach { r =>
      val p = r.getAs[Double]("p_good")
      assert(p >= 0.0 && p <= 1.0)
      // the hard decision is η ≥ 0 ⇔ p ≥ 0.5 (sigmoid monotone)
      assert(r.getAs[Boolean]("predicted_good") === (p >= 0.5), s"doc ${r.get(0)}")
    }
    val acc = joined.count(r =>
      r.getAs[Boolean]("predicted_good") == r.getAs[Boolean]("label")).toDouble / joined.length
    assert(acc >= 0.85, s"train-set agreement with the rule gate = $acc")
  }

  test("holdout AUC separates good from bad docs (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q265_logit_holdout_auc")(spark, d).head()
    assert(r.getAs[Long]("n_good") > 0 && r.getAs[Long]("n_bad") > 0)
    val auc = r.getAs[Double]("auc")
    assert(auc > 0.85 && auc <= 1.0, s"holdout AUC = $auc")
  }

  test("holdout average precision is high and bounded by construction") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q277_logit_avg_precision")(spark, d).head()
    val (nh, np, ap) = (r.getAs[Long]("n_holdout"), r.getAs[Long]("n_pos"),
      r.getAs[Double]("ap"))
    assert(nh === 100L && np > 0 && np < nh)
    // AP of a random ranking ≈ base rate (np/nh); the model must beat it
    // decisively, and AP can never exceed 1
    assert(ap > np.toDouble / nh && ap <= 1.0, s"AP = $ap")
    // lower bound when all positives rank first is exactly 1.0; with the
    // strict (η, doc_id) order AP ≥ the worst case (positives last):
    // Σ i/(nh - np + i) / np
    val worst = (1L to np).map(i => i.toDouble / (nh - np + i)).sum / np
    assert(ap >= worst - 1e-9)
  }

  test("holdout Brier skill beats the climatological baseline") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q272_logit_brier")(spark, d).head()
    val (brier, base, skill) = (r.getAs[Double]("brier"),
      r.getAs[Double]("brier_base"), r.getAs[Double]("skill"))
    assert(brier >= 0.0 && brier <= 1.0)
    assert(base >= 0.0 && base <= 0.25 + 1e-9) // p̄(1−p̄) ≤ ¼ by construction
    assert(skill > 0.25, s"Brier skill = $skill — the model must beat the constant predictor")
  }

  test("q289 source report covers every source with consistent rates") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val rows = graft.SparkEntry.queries("q289_source_quality_report")(spark, d).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("n")).sum === 500L)
    rows.foreach { r =>
      val (p, k, l) = (r.getAs[Double]("avg_p_good"),
        r.getAs[Double]("keep_rate"), r.getAs[Double]("label_rate"))
      assert(p > 0.0 && p < 1.0, s"${r.get(0)} avg_p=$p")
      assert(k >= 0.0 && k <= 1.0 && l >= 0.0 && l <= 1.0)
    }
    // the report must discriminate: sources differ in keep rate
    assert(rows.map(_.getAs[Double]("keep_rate")).distinct.length > 1)
  }

  test("q287 learning curve: four nested fits, sane AUCs, more data never hurts much") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val rows = graft.SparkEntry.queries("q287_learning_curve")(spark, d)
      .collect().sortBy(_.getAs[Int]("train_folds"))
    assert(rows.map(_.getAs[Int]("train_folds")).toSeq === Seq(1, 2, 3, 4))
    // folds are doc_id % 5 buckets of the 500-doc corpus: 100 docs each
    assert(rows.map(_.getAs[Long]("n_train")).toSeq === Seq(100L, 200L, 300L, 400L))
    rows.foreach { r =>
      val auc = r.getAs[Double]("auc")
      assert(auc > 0.5 && auc <= 1.0, s"${r.get(0)} folds: auc = $auc")
    }
    // the full-train model must not be materially worse than the
    // smallest-train one (noise tolerance, not strict monotonicity)
    assert(rows.last.getAs[Double]("auc") >= rows.head.getAs[Double]("auc") - 0.05)
  }

  test("q286 Murphy decomposition agrees with a recomputation from the q270 deciles") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q286_brier_decomposition")(spark, d).head()
    val (rel, res, unc, bb) = (r.getAs[Double]("reliability"),
      r.getAs[Double]("resolution"), r.getAs[Double]("uncertainty"),
      r.getAs[Double]("binned_brier"))
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc > 0.0 && unc <= 0.25 + 1e-9)
    assert(math.abs(bb - (rel - res + unc)) < 3e-6) // the Murphy identity
    // independent recomputation from the gated q270 reliability diagram
    val dec = graft.SparkEntry.queries("q270_logit_calibration")(spark, d).collect()
    val n = dec.map(_.getAs[Long]("n")).sum.toDouble
    val yb = dec.map(x => x.getAs[Long]("n") * x.getAs[Double]("rate")).sum / n
    val rel2 = dec.map { x =>
      val dp = x.getAs[Double]("avg_p") - x.getAs[Double]("rate")
      x.getAs[Long]("n") * dp * dp
    }.sum / n
    val res2 = dec.map { x =>
      val dy = x.getAs[Double]("rate") - yb
      x.getAs[Long]("n") * dy * dy
    }.sum / n
    assert(math.abs(rel - rel2) < 1e-4, s"reliability $rel vs $rel2")
    assert(math.abs(res - res2) < 1e-4, s"resolution $res vs $res2")
    assert(math.abs(unc - yb * (1 - yb)) < 1e-4)
    // a well-calibrated model: reliability is a small fraction of resolution
    assert(rel < res, s"reliability $rel should be below resolution $res")
  }

  test("per-language grouped fit covers every language with finite, distinct models") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val rows = graft.SparkEntry.queries("q271_logit_fit_by_lang")(spark, d).collect()
    assert(rows.map(_.getAs[String]("lang")).sorted.toSeq ===
      Seq("de", "en", "es", "fr", "zh"))
    assert(rows.map(_.getAs[Long]("n")).sum === 500L)
    rows.foreach { r =>
      for (i <- 0 to 4) {
        val b = r.getAs[Double](s"b$i")
        assert(!b.isNaN && !b.isInfinite, s"${r.get(0)}.b$i = $b")
      }
    }
    // the groups must be genuinely different models, not one global fit
    // copied five ways (the en stopword coefficient dominates: its label
    // boundary leans hardest on English marker density)
    val b1s = rows.map(r => r.getAs[String]("lang") -> r.getAs[Double]("b1")).toMap
    assert(b1s.values.toSeq.distinct.size === 5)
  }

  test("calibration deciles are complete and predicted probability rises monotonically") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val rows = graft.SparkEntry.queries("q270_logit_calibration")(spark, d)
      .orderBy(col("decile")).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
    val avgs = rows.map(_.getAs[Double]("avg_p"))
    // deciles cut on η, and μ is monotone in η, so mean predicted
    // probability must be strictly increasing decile over decile
    avgs.sliding(2).foreach { case Array(a, b) => assert(a < b, s"$a !< $b") }
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n") === 10L)
    }
  }

  /** 20 docs, labels perfectly separable from the features: 10 long
    * stopword-rich texts (quality 100) vs 10 short stop-free strings
    * (quality 45). Naive unclamped IRLS would push μ to an exact 0/1
    * here and poison z with 0/0; the clamp + ridge must keep every
    * coefficient finite and classify the toy corpus perfectly.
    */
  private lazy val toyDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_logit_toy_").toString
    val good = "the cat and the dog of the house is happy " // 43 chars, 4 stops
    val docs = (0L until 20L).map { id =>
      val text = if (id % 2 == 0) good * 6 else s"zz$id qq xx"
      (id, text, "en", if (id < 10) "web" else "books", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("a perfectly separable toy corpus stays finite through the clamp") {
    val fit = graft.SparkEntry.queries("q263_logit_quality_fit")(spark, toyDir).head()
    for (i <- 0 to 4) {
      val b = fit.getAs[Double](s"b$i")
      assert(!b.isNaN && !b.isInfinite, s"b$i = $b")
    }
    val applied = graft.SparkEntry.queries("q264_logit_quality_apply")(spark, toyDir).collect()
    assert(applied.length === 20)
    applied.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("predicted_good") === (id % 2 == 0), s"doc $id")
    }
    val auc = graft.SparkEntry.queries("q265_logit_holdout_auc")(spark, toyDir).head()
    assert(auc.getAs[Double]("auc") === 1.0)
  }
}
