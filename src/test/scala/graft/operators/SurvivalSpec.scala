package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable q238 case: four customers in one segment —
  * durations 10 (churn), 10 (censored), 20 (churn), 30 (censored,
  * also the corpus's latest activity, so it sets the horizon).
  * By hand: S(10) = 1·(1 − 1/4) = 0.75; the censored-at-10 customer
  * leaves the risk set WITHOUT an event, so S(20) = 0.75·(1 − 1/2) =
  * 0.375 — the distinction a naive churn rate gets wrong.
  */
class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q238: censoring leaves the risk set without an event") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_km_").toString
    val day0 = java.time.LocalDate.parse("2025-01-01")
    def ts(day: Int) = java.sql.Timestamp.valueOf(day0.plusDays(day).atStartOfDay)
    // (cust, firstDay, lastDay): last ≤ 240 ⇒ churn; horizon = 300 − 60
    val spans = Seq(
      (1L, 0, 10),    // churn at duration 10
      (2L, 280, 290), // censored at duration 10 (active past the cutoff)
      (3L, 0, 20),    // churn at duration 20
      (4L, 270, 300)  // censored at duration 30; sets max(l) = 300
    )
    spans.zipWithIndex.flatMap { case ((cu, f, l), k) =>
      Seq((k.toLong * 2, cu, ts(f)), (k.toLong * 2 + 1, cu, ts(l)))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    spans.map { case (cu, _, _) => (cu, "S") }
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")

    val got = graft.SparkEntry.queries("q238_kaplan_meier")(spark, d)
      .collect()
      .map(r => r.getAs[Int]("dur") ->
        ((r.getAs[Long]("n_at_risk"), r.getAs[Long]("churned"),
          r.getAs[Double]("survival"))))
      .toMap
    assert(got === Map(
      10 -> ((4L, 1L, 0.75)),
      20 -> ((2L, 1L, 0.375))))
  }
}
