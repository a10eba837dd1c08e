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
}
