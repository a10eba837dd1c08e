package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** selectWeightedRank: hand-traceable weighted medians, tie blocks,
  * all-equal groups, and kernel ≡ weight-expansion on the corpus join.
  */
class WeightedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def wmedian(rows: Seq[(String, Double, Long)]) = {
    import spark.implicits._
    RankSelect
      .selectWeightedRank(
        rows.toDF("g", "v", "w"), "g", "v", "w", "(wtot + 1) div 2", buckets = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
  }

  test("hand cases: crossing mid-bucket, tie block, all-equal group") {
    val got = wmedian(Seq(
      // A: W=4, k=2; cum 1->1, 2->3 => median 2
      ("A", 1.0, 1L), ("A", 2.0, 2L), ("A", 3.0, 1L),
      // B: tie block at the crossing — W=10, k=5; cum(1)=5 >= 5 => 1
      ("B", 1.0, 2L), ("B", 1.0, 3L), ("B", 2.0, 5L),
      // C: all-equal answers directly (no window at all)
      ("C", 7.0, 3L), ("C", 7.0, 9L)))
    assert(got === Map("A" -> ((2.0, 4L)), "B" -> ((1.0, 10L)), "C" -> ((7.0, 12L))))
  }

  test("heavy weight on the last value pulls the median to it") {
    val got = wmedian(Seq(("D", 1.0, 1L), ("D", 2.0, 1L), ("D", 100.0, 10L)))
    // W=12, k=6; cum: 1->1, 2->2, 100->12 => median 100
    assert(got("D") === ((100.0, 12L)))
  }

  test("kernel equals explicit weight expansion on the corpus join (sf0.001)") {
    val d   = "/root/testdata/sf0.001"
    val wts = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("wt"))
    val j = graft.Tables.orders(spark, d)
      .join(graft.Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(wts, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"), col("wt"))
    // expansion: repeat each row wt times, then the plain (n+1)/2 rank
    val expanded = j.select(col("seg"), col("v"),
      explode(expr("sequence(1, wt)")).as("i")).drop("i")
    val exact = expanded
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("seg")).orderBy(col("v").asc)))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))))
      .where(col("rn") === expr("(n + 1) div 2"))
      .select(col("seg"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = RankSelect.selectWeightedRank(j, "seg", "v", "wt", "(wtot + 1) div 2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === exact)
  }
}
