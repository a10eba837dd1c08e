package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cox proportional hazards (q278): the distributed Newton fit must
  * reproduce an INDEPENDENT driver-side reference implementation (plain
  * Scala loops over the risk sets — no Spark ops shared with the query)
  * on a constructed corpus, and behave sanely on the real one.
  */
class CoxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference Breslow-ties Newton fit over (dur, event, x) rows:
    * 3 steps from β = 0, risk set = {i : dur_i ≥ t}. Straight loops.
    */
  private def referenceCox(rows: Seq[(Int, Int, Double)], steps: Int): (Double, Double) = {
    var beta = 0.0
    var lastI = 0.0
    val eventDurs = rows.filter(_._2 == 1).map(_._1).distinct.sorted
    for (_ <- 1 to steps) {
      var u = 0.0
      var inf = 0.0
      for (t <- eventDurs) {
        val risk = rows.filter(_._1 >= t)
        val s0 = risk.map(r => math.exp(beta * r._3)).sum
        val s1 = risk.map(r => math.exp(beta * r._3) * r._3).sum
        val s2 = risk.map(r => math.exp(beta * r._3) * r._3 * r._3).sum
        val ev = rows.filter(r => r._1 == t && r._2 == 1)
        val d = ev.size
        u += ev.map(_._3).sum - d * (s1 / s0)
        inf += d * (s2 / s0 - (s1 / s0) * (s1 / s0))
      }
      beta += u / inf
      lastI = inf
    }
    (beta, lastI)
  }

  /** Orders/customer pair whose spans and order counts are fully known.
    * Heavy orderers (x high) survive (censored); light orderers churn
    * early — a strong negative β the reference must agree on exactly.
    */
  private def tinyCorpus(): (String, Seq[(Int, Int, Double)]) = {
    val dir = java.nio.file.Files.createTempDirectory("coxspec").toString
    import spark.implicits._
    // (custkey, order dates): latest activity is 2024-12-31 → cutoff
    // 2024-11-01; customers whose last order ≤ cutoff are events.
    val orders = Seq(
      (1L, Seq("2024-01-01", "2024-03-01")),                               // dur 60, event, x 0.2
      (2L, Seq("2024-01-01", "2024-02-01", "2024-05-01")),                 // dur 121, event, x 0.3
      (3L, Seq("2024-01-01", "2024-06-01")),                               // dur 152, event, x 0.2
      (4L, Seq("2024-01-01", "2024-04-01", "2024-08-01", "2024-12-31")),   // dur 365, censored, x 0.4
      (5L, (1 to 12).map(m => f"2024-$m%02d-15")),                         // dur ~11mo, censored, x 1.0+ (12 orders → capped 10)
      (6L, Seq("2024-02-01", "2024-12-20"))                                // dur 323, censored, x 0.2
    ).flatMap { case (k, ds) => ds.map(dt => (k, dt)) }
    orders.toDF("o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1L to 6L).map(k => (k, s"seg$k")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    // expected spans, computed by hand from the dates above
    def dd(a: String, b: String): Int =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(a), java.time.LocalDate.parse(b)).toInt
    val cutoff = java.time.LocalDate.parse("2024-12-31").minusDays(60)
    def ev(last: String): Int =
      if (!java.time.LocalDate.parse(last).isAfter(cutoff)) 1 else 0
    val rows = Seq(
      (dd("2024-01-01", "2024-03-01"), ev("2024-03-01"), 0.2),
      (dd("2024-01-01", "2024-05-01"), ev("2024-05-01"), 0.3),
      (dd("2024-01-01", "2024-06-01"), ev("2024-06-01"), 0.2),
      (dd("2024-01-01", "2024-12-31"), ev("2024-12-31"), 0.4),
      (dd("2024-01-15", "2024-12-15"), ev("2024-12-15"), 1.0),
      (dd("2024-02-01", "2024-12-20"), ev("2024-12-20"), 0.2))
    (dir, rows)
  }

  test("q278 agrees with an independent reference fit on a constructed corpus") {
    val (dir, rows) = tinyCorpus()
    val r = graft.SparkEntry.queries("q278_cox_ph")(spark, dir).head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_events") === rows.count(_._2 == 1).toLong)
    val (expBeta, expI) = referenceCox(rows, 3)
    assert(math.abs(r.getAs[Double]("beta") - expBeta) < 2e-6,
      s"beta = ${r.getAs[Double]("beta")}, reference = $expBeta")
    assert(math.abs(r.getAs[Double]("hazard_ratio") - math.exp(expBeta)) < 1e-5)
    assert(math.abs(r.getAs[Double]("se") - 1.0 / math.sqrt(expI)) < 1e-5)
  }

  test("q283 grouped fit covers every segment with distinct, sane models") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val rows = graft.SparkEntry.queries("q283_cox_ph_by_segment")(spark, d).collect()
    assert(rows.map(_.getAs[String]("seg")).sorted.toSeq ===
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
    val global = graft.SparkEntry.queries("q278_cox_ph")(spark, d).head()
    assert(rows.map(_.getAs[Long]("n")).sum === global.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("n_events")).sum === global.getAs[Long]("n_events"))
    rows.foreach { r =>
      val (b, se) = (r.getAs[Double]("beta"), r.getAs[Double]("se"))
      assert(b < 0.0 && !b.isNaN, s"${r.get(0)}: beta = $b")
      assert(se > 0.0 && !se.isInfinite)
      assert(math.abs(r.getAs[Double]("hazard_ratio") - math.exp(b)) < 1e-4)
    }
    // grouped models must be genuinely per-segment, not a global copy
    assert(rows.map(_.getAs[Double]("beta")).distinct.length === rows.length)
  }

  test("q278 on the real corpus: frequent orderers have lower churn hazard") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val r = graft.SparkEntry.queries("q278_cox_ph")(spark, d).head()
    assert(r.getAs[Long]("n") > 0 && r.getAs[Long]("n_events") > 0)
    val beta = r.getAs[Double]("beta")
    val hr = r.getAs[Double]("hazard_ratio")
    val se = r.getAs[Double]("se")
    assert(beta < 0.0, s"order frequency should reduce the hazard, beta = $beta")
    assert(hr > 0.0 && hr < 1.0 && math.abs(hr - math.exp(beta)) < 1e-4)
    assert(se > 0.0 && !se.isInfinite)
    // the effect should be decisive, not noise: |β| > 2·se
    assert(math.abs(beta) > 2 * se, s"beta = $beta, se = $se")
  }
}
