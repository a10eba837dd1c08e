package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q117: the runtime bloom-filter join must actually inject the filter
  * (a conf-dependent optimizer rule — easy to lose silently to a conf
  * rename or default change) and must return EXACTLY the plain join's
  * rows: bloom false positives may only relax pruning, never change
  * the output.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q117 optimized plan contains the injected bloom filter") {
    val df = graft.SparkEntry.queries("q117_bloom_filter_join")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(
      plan.contains("might_contain"),
      s"runtime bloom filter not injected; optimized plan:\n$plan")
  }

  test("q117 equals the unfiltered-plan join (false positives only relax pruning)") {
    val got = graft.SparkEntry.queries("q117_bloom_filter_join")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
    val want = Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
          .cast("double").as("revenue"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === want)
  }
}
