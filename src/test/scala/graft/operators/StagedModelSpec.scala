package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** staged ≡ refit, asserted engine-side (the gates prove it against
  * DuckDB; this pins the two Spark paths to each other directly, so a
  * staging regression is caught even on corpora without an oracle run).
  */
class StagedModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("staged logistic apply (q291) ≡ refit apply (q264)") {
    assert(rows("q291_logit_staged_apply") === rows("q264_logit_quality_apply"))
  }

  test("staged GBT apply (q292) ≡ refit apply (q267)") {
    assert(rows("q292_gbt_staged_apply") === rows("q267_gbt_depth2_score"))
  }

  test("staged forest apply (q293) ≡ regrow apply (q282)") {
    assert(rows("q293_forest_staged_apply") === rows("q282_forest_apply"))
  }
}
