package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q177 sketch-state MV: batch-merged signatures equal the one-shot
  * signature, and the under-K path degenerates to the exact count.
  */
class SketchMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q177: under-K corpus — merged estimate IS the exact distinct count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvmv_").toString
    // 12 distinct keys spread over all 4 batches (k % 4 covers 0..3),
    // well under K=64: n_min = distinct count, estimate exact
    (1L to 12L).map(k => (k, "N"))
      .toDF("l_orderkey", "l_returnflag")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q177_mv_sketch_merge")(spark, dir).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_min") === 12L)
    assert(got.head.getAs[Double]("kmv_estimate") === 12.0)
  }

  test("q177: merged-across-batches equals the one-shot signature (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val oneShot = {
      val kmvSig = org.apache.spark.sql.functions.udaf(
        KmvAggregator.bottomKSignature(64),
        org.apache.spark.sql.Encoders.STRING)
      graft.Tables.lineitem(spark, d)
        .select(col("l_returnflag"),
          md5(col("l_orderkey").cast("string").cast("binary")).as("h"))
        .groupBy(col("l_returnflag"))
        .agg(kmvSig(col("h")).as("sig"))
        .select(col("l_returnflag"), array_max(col("sig")).as("hk"), size(col("sig")).as("n"))
        .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    }
    val merged = graft.SparkEntry.queries("q177_mv_sketch_merge")(spark, d)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_min"), r.getAs[Double]("kmv_estimate")))
    assert(merged.nonEmpty)
    merged.foreach { case (flag, nMin, est) =>
      val (hk, n) = oneShot(flag)
      assert(nMin === n.toLong, s"$flag: merged signature size differs from one-shot")
      if (n == 64) {
        val u = java.lang.Long.parseLong(hk.take(8), 16).toDouble / 4294967296.0
        assert(math.abs(est - 63.0 / u) < 1e-9, s"$flag: estimate diverged from one-shot hk")
      }
    }
  }
}
