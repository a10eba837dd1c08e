package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q176 incremental MV: groups arriving in different batches merge into
  * the same state a single pass computes, including the new-group
  * insertion path and the no-change retention path.
  */
class MvIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q176: late-arriving group inserts; early group's state survives empty batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_").toString
    // keys 4,8 land in batch 0 (B twice); key 1 lands in batch 1 (A —
    // a group the MV has never seen); batches 2 and 3 are empty
    Seq((4L, 20L, 50.0), (8L, 20L, 70.0), (1L, 10L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((10L, "A"), (20L, "B")).toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val got = graft.SparkEntry.queries("q176_mv_incremental")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_orders"), r.getAs[Double]("avg_price"))))
      .toMap
    assert(got === Map("A" -> ((1L, 100.0)), "B" -> ((2L, 60.0))))
  }

  test("q176: four refreshes equal the single-pass rollup on the corpus") {
    val d   = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q176_mv_incremental")(spark, d)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_orders"))).toMap
    val want = graft.Tables.orders(spark, d)
      .join(graft.Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }
}
