package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q160 epoch-shuffle manifest and q161 score-drift monitor: exact
  * hand-derivable cases plus corpus invariants.
  */
class PipelineMonitorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q160: shards partition each epoch; epochs genuinely reshuffle") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q160_epoch_shuffle")(spark, dir).cache()
    val nDocs = graft.Tables.documents(spark, dir).count()
    // every doc lands in exactly one shard per epoch
    val perEpoch = out.groupBy(col("epoch")).agg(sum(col("n_docs")).as("n")).collect()
    assert(perEpoch.length === 2)
    assert(perEpoch.forall(_.getLong(1) === nDocs))
    assert(out.where(col("shard") < 0 || col("shard") > 7).count() === 0L)
    // the reshuffle is real: some shard's seek position moves between
    // epochs (salted hashes make a full coincidence astronomically
    // unlikely; this also catches a forgotten epoch in the salt)
    val firsts = out.groupBy(col("shard"))
      .agg(countDistinct(col("first_doc")).as("k"))
    assert(firsts.where(col("k") > 1).count() > 0L)
    out.unpersist()
  }

  test("q161: identical distributions score exactly 0; vanished support scores new_tot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_").toString
    // sSame: one text for every doc -> single bucket, proportional by
    // construction -> every term is exactly 0.
    // sDrift: ref docs are high-quality (bucket 5), new docs (id%3==0)
    // are junk (bucket 2, absent from ref => excluded by contract);
    // the ref bucket then expects all 3 new docs and observes 0:
    // chi2 = (0-3)^2/3 = 3 exactly.
    val good = ("the they and with that this from have " * 30).trim // len ~1000, stopword-rich
    val junk = "zz"
    val rows =
      (1L to 8L).map(i => (i * 10 + 1, good, "en", "sSame")) ++ // ids 11,21,..81: mix of %3 classes
        Seq(1L, 2L, 4L, 5L).map(i => (i, good, "en", "sDrift")) ++
        Seq(3L, 6L, 9L).map(i => (i, junk, "en", "sDrift"))
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q161_score_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("sSame") === ((0.0, 1L)))
    assert(got("sDrift") === ((3.0, 1L)))
  }

  test("q164: sqrt-flattened shares; largest-remainder quotas sum to the budget") {
    import spark.implicits._
    def stage(rows: Seq[(Long, String, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_lang_").toString
      rows.map { case (id, text, lang) => (id, text, lang, "s1", text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    def run(dir: String) = graft.SparkEntry.queries("q164_language_sampling")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

    // 9-vs-1 tokens: sqrt ratio 3:1 -> exact 75000/25000, no remainder
    val q1 = run(stage(Seq(
      (1L, ("tok " * 9).trim, "aa"),
      (2L, "tok", "bb"))))
    assert(q1 === Map("aa" -> 75000L, "bb" -> 25000L))

    // three equal languages: 100000/3 floors to 33333 each, and the
    // single leftover token goes to the lang-asc first among equal fracs
    val q2 = run(stage(Seq(
      (1L, "tok", "aa"), (2L, "tok", "bb"), (3L, "tok", "cc"))))
    assert(q2 === Map("aa" -> 33334L, "bb" -> 33333L, "cc" -> 33333L))
    assert(q2.values.sum === 100000L)

    // corpus invariant: quotas always exhaust the budget exactly
    val corpus = graft.SparkEntry.queries("q164_language_sampling")(
      spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(3))
    assert(corpus.sum === 100000L)
  }
}
