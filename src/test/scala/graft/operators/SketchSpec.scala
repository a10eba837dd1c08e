package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production-recommended approximate aggregates (SketchQueries
  * scaladoc points HLL++ / quantile-sketch users here): assert the
  * estimates actually land within their documented error bounds against
  * exact computations on the real test corpus. These are spec-only
  * checks — the sketches' register layouts are engine-internal, so they
  * cannot be DuckDB-oracled the way the KMV query is.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) is within its documented rsd of exact") {
    val rsd = 0.05
    val rows = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd).as("est")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est   = r.getLong(2).toDouble
      // rsd is one standard deviation of relative error; 4 sigma is a
      // deterministic-test-safe bound (the estimate is deterministic
      // for fixed input, so this either always passes or always fails)
      assert(math.abs(est - exact) / exact <= 4 * rsd,
        s"flag=${r.getString(0)} exact=$exact est=$est")
    }
  }

  test("approx_percentile rank error is bounded by n/accuracy") {
    val li  = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").cast("double").as("price"))
      .persist()
    val n   = li.count()
    val acc = 1000
    Seq(0.1, 0.5, 0.99).foreach { q =>
      val est = li
        .select(percentile_approx(col("price"), lit(q), lit(acc)))
        .head().getDouble(0)
      val rank = li.where(col("price") <= est).count()
      // GK-sketch guarantee: the returned value's rank is within
      // n/accuracy of the target rank q*n
      assert(math.abs(rank - q * n) <= n.toDouble / acc + 1,
        s"q=$q est=$est rank=$rank target=${q * n}")
    }
    li.unpersist()
  }
}
