package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable survival-analysis cases.
  *
  * q238 fixture: four customers in one segment — durations 10
  * (churn), 10 (censored), 20 (churn), 30 (censored, also the
  * corpus's latest activity, so it sets the horizon). By hand:
  * S(10) = 1·(1 − 1/4) = 0.75; the censored-at-10 customer leaves the
  * risk set WITHOUT an event, so S(20) = 0.75·(1 − 1/2) = 0.375 — the
  * distinction a naive churn rate gets wrong.
  */
class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(
      spans: Seq[(Long, String, Int, Int)],  // (cust, seg, firstDay, lastDay)
      prices: Map[Long, (Double, Double)] = Map.empty): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_km_").toString
    val day0 = java.time.LocalDate.parse("2025-01-01")
    def ts(day: Int) = java.sql.Timestamp.valueOf(day0.plusDays(day).atStartOfDay)
    spans.zipWithIndex.flatMap { case ((cu, _, f, l), k) =>
      val (p1, p2) = prices.getOrElse(cu, (100.0, 100.0))
      Seq((k.toLong * 2, cu, ts(f), p1), (k.toLong * 2 + 1, cu, ts(l), p2))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    spans.map { case (cu, seg, _, _) => (cu, seg) }.distinct
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    d
  }

  test("q238: censoring leaves the risk set without an event") {
    // last ≤ 240 ⇒ churn; horizon = 300 − 60
    val d = writeFixture(Seq(
      (1L, "S", 0, 10),    // churn at duration 10
      (2L, "S", 280, 290), // censored at duration 10 (active past the cutoff)
      (3L, "S", 0, 20),    // churn at duration 20
      (4L, "S", 270, 300)  // censored at duration 30; sets max(l) = 300
    ))
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

  test("q252: Greenwood band matches the hand-threaded variance") {
    // q238 fixture: step 10 has d=1, n=4 → g = 1/12; step 20 adds
    // d=1, n=2 → g = 1/12 + 1/2. Band = S ± 1.96·sqrt(S²·g).
    val d = writeFixture(Seq(
      (1L, "S", 0, 10),
      (2L, "S", 280, 290),
      (3L, "S", 0, 20),
      (4L, "S", 270, 300)
    ))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.SparkEntry.queries("q252_km_greenwood")(spark, d)
      .collect()
      .map(r => r.getAs[Int]("dur") ->
        ((r.getAs[Double]("survival"), r.getAs[Double]("lo95"), r.getAs[Double]("hi95"))))
      .toMap
    val g10 = 0.0 + 1.0 / (4.0 * 3.0)
    val g20 = g10 + 1.0 / (2.0 * 1.0)
    assert(got(10) === ((0.75,
      r6(0.75 - 1.96 * math.sqrt(0.75 * 0.75 * g10)),
      r6(0.75 + 1.96 * math.sqrt(0.75 * 0.75 * g10)))))
    assert(got(20) === ((0.375,
      r6(0.375 - 1.96 * math.sqrt(0.375 * 0.375 * g20)),
      r6(0.375 + 1.96 * math.sqrt(0.375 * 0.375 * g20)))))
  }

  test("q254: quartile lifetimes read off the q238 curve") {
    // S: 1 → 0.75 (dur 10) → 0.375 (dur 20), never ≤ 0.25.
    // q1 crossing at 10 (s = 0.75 ≤ 0.75), median at 20, q3 NULL.
    val d = writeFixture(Seq(
      (1L, "S", 0, 10),
      (2L, "S", 280, 290),
      (3L, "S", 0, 20),
      (4L, "S", 270, 300)
    ))
    val rows = graft.SparkEntry.queries("q254_km_quartiles")(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Integer]("q1_days") === 10)
    assert(r.getAs[Integer]("median_days") === 20)
    assert(r.isNullAt(r.fieldIndex("q3_days")))
  }

  test("q250: RMST is the hand-summed area under the q238 curve") {
    // same fixture as q238: steps (10: S 1→0.75), (20: 0.75→0.375),
    // (30: censor-only, S stays 0.375). Area to τ=365:
    // 1·10 + 0.75·10 + 0.375·10 + 0.375·(365−30) = 146.875.
    val d = writeFixture(Seq(
      (1L, "S", 0, 10),
      (2L, "S", 280, 290),
      (3L, "S", 0, 20),
      (4L, "S", 270, 300)
    ))
    val rows = graft.SparkEntry.queries("q250_rmst")(spark, d).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("rmst_days") === 146.875)
  }

  test("q239: log-rank O/E/V match the hand-computed hypergeometrics") {
    // A churns at 10 and 15; B is censored at durations 20 and 35
    // (active past cutoff = 300 − 60). Combined event times:
    //  t=10: n1=2, n2=2, D=1 → E += 1·2/4 = 0.5, V += (2/4)(2/4)(3/3) = 0.25
    //  t=15: n1=1, n2=2, D=1 → E += 1·1/3,     V += (1/3)(2/3)(2/2) = 2/9
    // O1 = 2, E1 = 0.5 + 1/3, V = 0.25 + 2/9, χ² = (2−E1)²/V = 49/17
    val d = writeFixture(Seq(
      (1L, "A", 0, 10),
      (2L, "A", 0, 15),
      (3L, "B", 270, 290),
      (4L, "B", 265, 300)
    ))
    val rows = graft.SparkEntry.queries("q239_logrank")(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("seg_a") === "A")
    assert(r.getAs[String]("seg_b") === "B")
    assert(r.getAs[Long]("events_a") === 2L)
    val e1 = BigDecimal(0.5 + 1.0 * 1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("expected_a") === e1)
    assert(r.getAs[Double]("chi2") === BigDecimal(49.0 / 17.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q240: maintained span state reproduces the one-shot curve") {
    val d = writeFixture(Seq(
      (1L, "S", 0, 10),
      (2L, "S", 280, 290),
      (3L, "S", 0, 20),
      (4L, "S", 270, 300),
      (5L, "T", 5, 80),
      (6L, "T", 250, 295)
    ))
    def rows(q: String) =
      graft.SparkEntry.queries(q)(spark, d).collect()
        .map(r => (r.getAs[String]("seg"), r.getAs[Int]("dur"),
          r.getAs[Long]("n_at_risk"), r.getAs[Long]("churned"),
          r.getAs[Double]("survival"))).sorted.toSeq
    assert(rows("q240_km_maintained") === rows("q238_kaplan_meier"))
    assert(rows("q242_stream_km_maintenance") === rows("q238_kaplan_meier"))
  }

  test("q245: PAVA pools the adjacent violator pair") {
    // retention by ascending spend: [1, 0, 1] — the classic violation.
    // PAVA pools the first two into 0.5; fit = [0.5, 0.5, 1.0].
    val d = writeFixture(
      Seq(
        (1L, "S", 280, 290), // retained, spend 10
        (2L, "S", 0, 10),    // churned,  spend 20
        (3L, "S", 270, 300)  // retained, spend 30
      ),
      prices = Map(
        1L -> ((5.0, 5.0)),
        2L -> ((10.0, 10.0)),
        3L -> ((15.0, 15.0))))
    val got = graft.SparkEntry.queries("q245_isotonic_calibration")(spark, d)
      .collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Double]("rate_raw"), r.getAs[Double]("rate_iso"))))
      .toMap
    assert(got === Map(
      1 -> ((1.0, 0.5)),
      2 -> ((0.0, 0.5)),
      3 -> ((1.0, 1.0))))
  }

  test("q253: cohort LTV accumulates spend by month-age per cohort") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ltv_").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // both customers acquired in 2025-Q1; ages 0/1 for cust1, 0 for
    // cust2 → cum rev 50, 70; per-customer LTV 25 then 35
    Seq(
      (1L, 1L, ts("2025-01-15"), 10.0),
      (2L, 1L, ts("2025-02-20"), 20.0),
      (3L, 2L, ts("2025-02-01"), 40.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((1L, "S"), (2L, "S")).toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val got = graft.SparkEntry.queries("q253_cohort_ltv")(spark, d)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_q").toString,
        r.getAs[Int]("age_months")) ->
        ((r.getAs[Long]("n_cust"), r.getAs[Double]("ltv_per_cust"))))
      .toMap
    assert(got === Map(
      ("2025-01-01", 0) -> ((2L, 25.0)),
      ("2025-01-01", 1) -> ((2L, 35.0))))
  }

  test("q241: midrank AUC handles ties as half-wins") {
    // Retained (event=0): spends 60, 80; churned: 20, 60.
    // Pairwise: 60>20 win, 60=60 half, 80>20 win, 80>60 win → 3.5/4.
    val d = writeFixture(
      Seq(
        (1L, "S", 0, 10),    // churned, spend 20
        (2L, "S", 0, 20),    // churned, spend 60
        (3L, "S", 280, 290), // retained, spend 60
        (4L, "S", 270, 300)  // retained, spend 80
      ),
      prices = Map(
        1L -> ((10.0, 10.0)),
        2L -> ((30.0, 30.0)),
        3L -> ((30.0, 30.0)),
        4L -> ((40.0, 40.0))))
    val rows = graft.SparkEntry.queries("q241_retention_auc")(spark, d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_retained") === 2L)
    assert(r.getAs[Long]("n_churned") === 2L)
    assert(r.getAs[Double]("auc") === 0.875)
  }
}
