package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stage-boundary invariants of the end-to-end corpus build (q140) —
  * the oracle hashes the final selection; these pin the properties a
  * hash mismatch would not localize.
  */
class CorpusBuildSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry.queries("q140_corpus_build")(spark, dir).cache()

  test("every selected doc clears the quality floor") {
    graft.plans.VectorFunctions.register(spark)
    val below = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      .join(out.select("doc_id"), "doc_id")
      .where(col("q") < 55)
    assert(below.count() === 0L)
  }

  test("no held-out eval doc (doc_id % 97 == 0) survives") {
    assert(out.where(col("doc_id") % 97 === 0).count() === 0L)
  }

  test("per-source cumulative tokens respect the budget and are dense") {
    assert(out.where(col("cum_tokens") > 20000L).count() === 0L)
    // cum_tokens is a within-source running sum of the selected docs:
    // re-deriving it from the selection's own (n_tokens, mix order)
    // must reproduce it exactly — a dropped or reordered doc breaks it
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val bad = out
      .withColumn("recum", sum(col("n_tokens").cast("long")).over(w))
      .where(col("recum") =!= col("cum_tokens"))
    assert(bad.count() === 0L)
  }

  test("split labels follow the salted-hash bucket deterministically") {
    val bad = out.where(
      (col("bucket") < 8 && col("split") =!= "train") ||
        (col("bucket") === 8 && col("split") =!= "val") ||
        (col("bucket") === 9 && col("split") =!= "test"))
    assert(bad.count() === 0L)
    assert(out.where(col("bucket") < 0 || col("bucket") > 9).count() === 0L)
  }

  test("q142 packing invariants hold on generated data, not just the corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1 to 400).map { i =>
      (s"src${i % 5}", i.toLong, (rnd.nextInt(300) + (if (i % 7 == 0) 0 else 1)).toLong)
    }.toDF("source", "doc_id", "n_tokens")
    val L = 128L
    val packed = CorpusBuildQueries.packSequences(docs, L).cache()

    // token conservation: every positive token lands in exactly one seq
    val totalIn  = docs.where(col("n_tokens") > 0)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    val totalOut = packed.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(totalOut === totalIn)

    // exact fill: every sequence holds exactly L tokens except each
    // source's last (= max seq id), which holds 1..L
    import org.apache.spark.sql.expressions.Window
    val flagged = packed.withColumn("is_tail",
      col("seq") === max(col("seq")).over(Window.partitionBy(col("source"))))
    assert(flagged.where(!col("is_tail") && col("n_tokens") =!= L).count() === 0L)
    assert(flagged.where(col("is_tail") &&
      (col("n_tokens") < 1 || col("n_tokens") > L)).count() === 0L)

    // contiguity: per source, seq ids are exactly 0..max with no holes
    val bad = packed.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), min(col("seq")).as("lo"), max(col("seq")).as("hi"))
      .where(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(bad.count() === 0L)
    packed.unpersist()
  }

  test("q141 approx-quantile contract holds on the orders fact") {
    val r = graft.SparkEntry.queries("q141_quantile_approx")(spark, dir)
    val rows = r.collect()
    assert(rows.length === 5)
    rows.foreach { row =>
      Seq("p25_ok", "p50_ok", "p75_ok", "p90_ok").foreach { c =>
        assert(row.getAs[Boolean](c), s"$c failed for seg ${row.get(0)}")
      }
    }
  }
}
