package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end multiclass NB (q295-q298) on a transparent synthetic
  * corpus staged as a real documents.parquet — signature tokens per
  * class, so the expected decisions and the χ² value are computable by
  * hand.
  */
class MulticlassNbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 60 docs, 20 per class; class c's docs say its signature token
    * twice plus the shared token "beta". doc_id % 5 == 4 is the eval
    * fold (4 docs per class).
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_mnb_spec_").toString
    val sig = Map(0 -> ("aa", "alpha"), 1 -> ("bb", "bravo"), 2 -> ("cc", "charlie"))
    val docs = (0 until 60).map { i =>
      val (lang, tok) = sig(i % 3)
      val text = s"$tok $tok beta"
      (i.toLong, text, lang, s"src${i % 2}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q296 predicts every eval doc's class from its signature token") {
    val out = MulticlassNb.queries("q296_nb_lang_apply").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("actual"), r.getAs[String]("pred")))
    assert(out.length === 12) // 60 docs / 5
    out.foreach { case (id, actual, pred) =>
      assert(pred === actual, s"doc $id predicted $pred, actual $actual")
    }
  }

  test("q297 confusion matrix is diagonal on the separable corpus") {
    val cells = MulticlassNb.queries("q297_nb_lang_confusion").fn(spark, dir)
      .collect().map(r => ((r.getAs[String]("actual"), r.getAs[String]("pred")),
        r.getAs[Long]("n"))).toMap
    assert(cells === Map(("aa", "aa") -> 4L, ("bb", "bb") -> 4L, ("cc", "cc") -> 4L))
  }

  test("q298 χ² is n for perfectly class-associated tokens; ubiquitous tokens are margin-excluded") {
    val chi = MulticlassNb.queries("q298_chi2_lang").fn(spark, dir)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Double]("chi2")).toMap
    // hand trace for 'alpha' (present in all 20 'aa' docs, absent from
    // the 40 others): Σ_k (O−E)²/E over present+absent cells
    //   aa: (20 − 20·20/60)²/(20·20/60) + (0 − 20·40/60)²/(20·40/60) = 26.667 + 13.333
    //   bb = cc: 6.667/…  + …            = 6.667·… → 10.0 each
    // total = 60 = n (perfect association)
    Seq("alpha", "bravo", "charlie").foreach { t =>
      assert(math.abs(chi(t) - 60.0) < 1e-6, s"$t chi2 = ${chi(t)}")
    }
    // 'beta' is in every doc: absence margin 0 < MinDf → excluded
    assert(!chi.contains("beta"))
  }
}
