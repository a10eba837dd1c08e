package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable cases for the round-8 statistics/linkage operators:
  * q190's Welch t against an independently-accumulated double
  * computation, and q191's fuzzy pairs against enumerated expectations.
  */
class ExperimentStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q190: Welch t on a hand corpus matches the plain-double computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_welch_").toString
    // one segment, variant = custkey % 2: even customers (variant 0)
    // bought {10, 20, 30}; odd (variant 1) bought {40, 50, 60, 70}
    val v0 = Seq(10.0, 20.0, 30.0)
    val v1 = Seq(40.0, 50.0, 60.0, 70.0)
    val orders = (v0.zipWithIndex.map { case (p, i) => (i * 10L + 1, 2L, p) } ++
      v1.zipWithIndex.map { case (p, i) => (i * 10L + 2, 3L, p) })
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit("2025-01-01").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    orders.coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((2L, "BUILDING"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .withColumn("c_name", lit("x"))
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_acctbal", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")

    val r = graft.SparkEntry.queries("q190_ab_welch_t")(spark, dir).head()
    // independent accumulation: plain running doubles, no decimals
    def stats(xs: Seq[Double]) = {
      val n = xs.size.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n0, m0, var0) = stats(v0)
    val (n1, m1, var1) = stats(v1)
    val t = (m0 - m1) / math.sqrt(var0 / n0 + var1 / n1)
    assert(r.getAs[Long]("n0") === v0.size.toLong)
    assert(r.getAs[Long]("n1") === v1.size.toLong)
    assert(math.abs(r.getAs[Double]("mean0") - m0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean1") - m1) < 1e-6)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6, s"got ${r.getAs[Double]("t_stat")} want $t")
  }

  test("q219: exact KS on a hand corpus — interleaved samples give D = 1/2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ks_").toString
    // variant 0 (even custkey) bought {1, 3}; variant 1 bought {2, 4}:
    // pooled sweep |F0 - F1| peaks at 1/2 after y=1 and y=3
    val orders = Seq(
      (1L, 2L, 1.0), (2L, 2L, 3.0), (3L, 3L, 2.0), (4L, 3L, 4.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderdate", lit("2025-01-01").cast("timestamp"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    orders.coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((2L, "BUILDING"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .withColumn("c_name", lit("x"))
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_acctbal", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val r = graft.SparkEntry.queries("q219_ks_drift")(spark, dir).head()
    assert(r.getAs[Long]("n0") === 2L)
    assert(r.getAs[Long]("n1") === 2L)
    assert(r.getAs[Long]("d_num") === 2L) // |1*2 - 0*2| after y = 1
    assert(r.getAs[Double]("ks") === 0.5)
    // crit = 1.36*sqrt(4/4) = 1.36 > 0.5 — tiny samples, not significant
    assert(!r.getAs[Boolean]("significant"))
  }

  test("q221: Spearman midranks on a hand corpus match the plain computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spear_").toString
    // 4 days: order counts x = [1,2,2,3] (a tie), revenue y = [10,20,30,5]
    val rows = Seq(
      (1L, "2025-01-01", 10.0),
      (2L, "2025-01-02", 8.0), (3L, "2025-01-02", 12.0),
      (4L, "2025-01-03", 14.0), (5L, "2025-01-03", 16.0),
      (6L, "2025-01-04", 1.0), (7L, "2025-01-04", 2.0), (8L, "2025-01-04", 2.0))
    rows.toDF("o_orderkey", "d", "o_totalprice")
      .withColumn("o_custkey", lit(2L))
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((2L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .withColumn("c_name", lit("x"))
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_acctbal", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val r = graft.SparkEntry.queries("q221_spearman_corr")(spark, dir).head()
    // doubled midranks 2·rank + ties − 1:
    //   x = [1,2,2,3] -> [2, 5, 5, 8] (midranks 1, 2.5, 2.5, 4)
    //   y = [10,20,30,5] -> [4, 6, 8, 2]
    val rx = Seq(2.0, 5.0, 5.0, 8.0); val ry = Seq(4.0, 6.0, 8.0, 2.0)
    val n = 4.0
    def s(v: Seq[Double]) = v.sum
    def sq(v: Seq[Double]) = v.map(a => a * a).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val rho = (n * sxy - s(rx) * s(ry)) /
      math.sqrt((n * sq(rx) - s(rx) * s(rx)) * (n * sq(ry) - s(ry) * s(ry)))
    assert(r.getAs[Long]("n_days") === 4L)
    assert(math.abs(r.getAs[Double]("rho") - rho) < 1e-6,
      s"rho ${r.getAs[Double]("rho")} vs $rho")
  }

  test("q191: blocked edit-distance pairs on hand titles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy_").toString
    Seq(
      (1L, "the quick brown fox jumps over"),   // block "the quic"
      (2L, "the quick brown fix jumps over"),   // 1 edit from doc 1
      (3L, "the quick green fox sits calmly"),  // 6+ edits in first 24 chars
      (4L, "a completely different title"),     // own block
      (5L, "the quirk brown fox jumps over")    // different block ("the quir") — missed by design
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("q191_fuzzy_edit_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // only (1,2) survives: same block AND distance 1 on the 24-char title.
    // (1,3)/(2,3) share the block but exceed the threshold; 5's edit sits
    // inside the blocking prefix — the documented recall trade.
    assert(got === Set((1L, 2L, 1)))
  }
}
