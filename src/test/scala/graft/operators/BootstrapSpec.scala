package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q174 Poisson bootstrap: threshold audit against an independent CDF
  * derivation, the degenerate single-row group, and corpus invariants.
  */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("production thresholds equal floor(PoissonCDF(1)(k) * 2^32), k = 0..4") {
    val e1 = math.exp(-1.0)
    var (cum, fact) = (0.0, 1.0)
    val derived = (0 to 4).map { k =>
      if (k > 0) fact *= k
      cum += e1 / fact
      math.floor(cum * 4294967296.0).toLong
    }
    // assert against the constant q174 actually renders into BOTH
    // engines — a spec-local copy would miss a typo in it entirely
    assert(derived === AnalyticsQueries.BootThresholds)
  }

  test("single-value group: every surviving replicate mean is the value — degenerate CI") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boot_").toString
    Seq((1L, 10L, 500.25), (2L, 20L, 500.25))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((10L, "SOLO"), (20L, "SOLO"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val got = graft.SparkEntry.queries("q174_bootstrap_ci")(spark, dir).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("mean") === 500.25)
    // whatever multiplicities the replicates draw, every weighted mean
    // of a constant is that constant
    assert(r.getAs[Double]("ci_lo") === 500.25)
    assert(r.getAs[Double]("ci_hi") === 500.25)
  }

  test("corpus invariants: CI brackets the mean and has positive width (sf0.001)") {
    val out = graft.SparkEntry.queries("q174_bootstrap_ci")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("seg"), r.getAs[Long]("n"), r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))
    assert(out.nonEmpty)
    out.foreach { case (seg, n, mean, lo, hi) =>
      assert(lo <= mean && mean <= hi, s"$seg: CI [$lo, $hi] misses mean $mean")
      assert(hi > lo, s"$seg: zero-width CI on an $n-row group")
      // a 32-replicate CI of a mean over hundreds of rows is narrow:
      // the width should be a small fraction of the mean's scale
      assert((hi - lo) / mean < 0.5, s"$seg: implausibly wide CI")
    }
  }
}
