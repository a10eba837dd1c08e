package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derivable cases for the post-gate trailing operators: EWMA
  * (q158), sliding-window streaming agg (q156), CDC chunking (q157).
  */
class TrailingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q158: truncated-decay EWMA matches hand arithmetic") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ewma_").toString
    val t0  = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      (1L, ts(0), 7L, "view", 1.0, "{}"),
      (2L, ts(1), 7L, "view", 2.0, "{}"),
      (3L, ts(2), 7L, "view", 4.0, "{}"),
      (4L, ts(0), 8L, "view", 10.0, "{}") // second user: independent series
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q158_ewma")(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got(1L) === 1.0)                    // 512*1/512
    assert(got(2L) === 1280.0 / 768.0)         // (512*2+256*1)/(512+256)
    assert(got(3L) === 3.0)                    // (512*4+256*2+128*1)/896
    assert(got(4L) === 10.0)                   // fresh series
  }

  test("q156: every event lands in exactly two sliding windows") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q156_stream_sliding_window")(spark, dir).cache()
    val nEvents = graft.Tables.events(spark, dir).count()
    assert(out.agg(sum(col("n"))).head.getLong(0) === 2 * nEvents)
    // per event_type too: the window expansion must not mix groups
    val byType = out.groupBy(col("event_type")).agg(sum(col("n")).as("sn"))
    val batch  = graft.Tables.events(spark, dir)
      .groupBy(col("event_type")).agg((count(lit(1)) * 2).as("bn"))
    assert(byType.join(batch, "event_type").where(col("sn") =!= col("bn")).count() === 0L)
    out.unpersist()
  }

  test("q165: overlap counts by hand; cross-bucket pairs counted once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_iv_").toString
    val t0  = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    Seq(
      // user 1: session [0, 10]
      (1L, ts(0), 1L, "view", 0.0, "{}"), (2L, ts(10), 1L, "view", 0.0, "{}"),
      // user 2: instant session [5, 5] — inside user 1's
      (3L, ts(5), 2L, "view", 0.0, "{}"),
      // user 3: far away, overlaps nothing
      (4L, ts(120), 3L, "view", 0.0, "{}"),
      // user 4: [8, 20] — overlaps user 1 ([8,20]∩[0,10]≠∅) but NOT
      // user 2 (starts at 8 > 5)
      (5L, ts(8), 4L, "view", 0.0, "{}"), (6L, ts(20), 4L, "view", 0.0, "{}"),
      // users 5 and 6: [50, 90] and [55, 80] — both span the hour
      // boundary at minute 60, so the pair appears in BOTH hour
      // buckets; the max(start)-bucket rule must count it once
      (7L, ts(50), 5L, "view", 0.0, "{}"), (8L, ts(70), 5L, "view", 0.0, "{}"),
      (9L, ts(90), 5L, "view", 0.0, "{}"),
      (10L, ts(55), 6L, "view", 0.0, "{}"), (11L, ts(80), 6L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q165_interval_overlap")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("q157: identical docs duplicate every chunk; singletons none") {
    import spark.implicits._
    val dir  = java.nio.file.Files.createTempDirectory("graft_cdc_").toString
    val body = (1 to 40).map(i => s"w${i * 7 % 13}x$i").mkString(" ")
    Seq(
      (1L, body, "en", "s1"),
      (2L, body, "en", "s1"),            // exact copy: all chunks shared
      (3L, "solo unique words only", "en", "s1")
    ).map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q157_cdc_chunking")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 === got(2L)._1)            // same chunking
    assert(got(1L)._2 === got(1L)._1)            // every chunk duplicated
    assert(got(2L)._2 === got(2L)._1)
    assert(got(3L) === ((1L, 0L)))               // one chunk, unshared
  }
}
