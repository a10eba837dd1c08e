package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the bottom-K-by-hash quantile sketch (q301-q303) on
  * GENERATED data — the invariants the corpus gates rely on, asserted
  * where they can be checked against a transparent local computation.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (seg, key, v): two groups, ids interleaved, values a shuffled
    * permutation so value order ≠ key order.
    */
  private def gen(n: Long) = spark.range(n).select(
    when(col("id") % 2 === 0, "A").otherwise("B").as("seg"),
    col("id").as("key"),
    ((col("id") * 7919L) % n).cast("double").as("v"))

  private def stateKeys(df: org.apache.spark.sql.DataFrame) =
    df.select(col("seg"), col("h"), col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("merge of per-batch sketches ≡ one-shot sketch (associativity)") {
    val all = gen(6000)
    val oneShot = QuantileSketchQueries.sketchRows(all)
    // 3 batches, each sketched alone, merged by re-ranking the union
    val union = (0 until 3)
      .map(b => QuantileSketchQueries.sketchRows(all.where(col("key") % 3 === b))
        .select(col("seg"), col("h"), col("key"), col("v")))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg")).orderBy(col("h").asc, col("key").asc)
    val merged = union.withColumn("rk", row_number().over(w))
      .where(col("rk") <= QuantileSketchQueries.K)
    assert(stateKeys(merged) === stateKeys(oneShot))
  }

  test("a group smaller than K is retained whole — the sketch-exact regime") {
    val small = gen(300) // 150 rows per group < K = 256
    val sk = QuantileSketchQueries.sketchRows(small)
    assert(sk.groupBy(col("seg")).count().collect()
      .map(_.getLong(1)).toSet === Set(150L))
    // with every row present, the rank-ceil(p·m) selection IS the exact
    // type-1 quantile: check p50 against a local sort
    val sample = sk.where(col("seg") === "A")
      .select(col("v"), col("key")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity)
    val est = sample((150 * 1 + 1) / 2 - 1)._1
    val exact = small.where(col("seg") === "A").select(col("v")).collect()
      .map(_.getDouble(0)).sorted.apply((150 + 1) / 2 - 1)
    assert(est === exact)
  }

  test("sampled-regime rank error stays inside the q303 contract tolerance") {
    val n = 20000L
    val all = gen(n)
    val perSeg = n / 2
    val sk = QuantileSketchQueries.sketchRows(all)
    for (seg <- Seq("A", "B"); (p, num, den) <- Seq((0.5, 1, 2), (0.9, 9, 10))) {
      val sample = sk.where(col("seg") === seg)
        .select(col("v"), col("key")).collect()
        .map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity)
      val m = sample.length
      assert(m === QuantileSketchQueries.K)
      val est = sample((m * num + den - 1) / den - 1)._1
      val trueRank = all.where(col("seg") === seg && col("v") <= est).count()
      val tol = 3.0 * perSeg / math.sqrt(QuantileSketchQueries.K) + 1
      assert(math.abs(trueRank - p * perSeg) <= tol,
        s"$seg p$p: true rank $trueRank vs target ${p * perSeg} (tol $tol)")
    }
  }
}
