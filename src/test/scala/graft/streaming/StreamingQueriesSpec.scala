package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q37 staging dir must track the corpus CONTENT at a path, not just
  * the path string: swapping a different events file in at the same
  * location has to flow through to the stream (regression: the staging
  * symlink used to be created only if absent, so a replaced corpus kept
  * streaming the old bytes).
  */
class StreamingQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q37 re-links its staging dir when the corpus at a path is swapped") {
    val corpus = Files.createTempDirectory("graft_corpus_")

    def install(sf: String): Unit = {
      val target = corpus.resolve("events.parquet")
      Files.deleteIfExists(target)
      Files.copy(Paths.get(s"/root/testdata/$sf/events.parquet"), target)
    }

    val q37 = StreamingQueries.queries("q37_stream_window_agg").fn

    install("sf0.001")
    val streamed1 = q37(spark, corpus.toString).agg(sum(col("n"))).head.getLong(0)
    assert(streamed1 == Tables.events(spark, corpus.toString).count())

    install("sf0.01") // same path, different corpus
    val streamed2 = q37(spark, corpus.toString).agg(sum(col("n"))).head.getLong(0)
    assert(streamed2 == Tables.events(spark, corpus.toString).count())
    assert(streamed2 != streamed1, "swapped corpus must stream different data")
  }

  /** The derived fixtures (q91's sentinel parquet, q80's 4-way split)
    * are built once per staging dir — so the dir itself must be keyed
    * by corpus CONTENT, or an in-place regeneration keeps serving the
    * old fixture forever (round 6: the driver re-stamped the corpus and
    * the path-keyed sentinel/split replayed stale bytes with a stale
    * physical schema).
    */
  test("sentinel and split fixtures re-stage when the corpus is swapped in place") {
    val corpus = Files.createTempDirectory("graft_corpus2_")

    def install(sf: String): Unit = {
      val target = corpus.resolve("events.parquet")
      Files.deleteIfExists(target)
      Files.copy(Paths.get(s"/root/testdata/$sf/events.parquet"), target)
    }

    val q91 = StreamingQueries.queries("q91_stream_window_append").fn
    val q80 = StreamingQueries.queries("q80_stream_merge_upsert").fn

    def expectCurrent(): Unit = {
      val ev = Tables.events(spark, corpus.toString)
      assert(q91(spark, corpus.toString).agg(sum(col("n"))).head.getLong(0)
        == ev.count(), "sentinel-staged stream must cover the current corpus")
      assert(q80(spark, corpus.toString).count()
        == ev.select("user_id", "event_type").distinct.count(),
        "split-staged stream must cover the current corpus")
    }

    install("sf0.001")
    expectCurrent()
    install("sf0.01") // same path, different corpus and physical layout
    expectCurrent()
  }
}
