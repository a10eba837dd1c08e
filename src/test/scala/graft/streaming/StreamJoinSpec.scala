package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// top-level so Spark can build encoders without an outer-instance scope
final case class Click(click_id: Long, user: Long, click_ts: java.sql.Timestamp)
final case class Buy(buy_id: Long, buyer: Long, buy_ts: java.sql.Timestamp)

/** Streaming semantics beyond the reference's surface: watermarked
  * stream-stream inner join and streaming deduplication — both stateful,
  * both with state bounded by the watermark.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2025-06-01 10:$minute%02d:00")

  test("watermarked stream-stream join pairs clicks with purchases in the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys   = MemoryStream[Buy]

    val joined = clicks.toDS()
      .withWatermark("click_ts", "30 minutes")
      .join(
        buys.toDS().withWatermark("buy_ts", "30 minutes"),
        expr("""
          user = buyer AND
          buy_ts >= click_ts AND
          buy_ts <= click_ts + INTERVAL 15 MINUTES""")
      )
      .select(col("click_id"), col("buy_id"), col("user"))

    val q = joined.writeStream
      .format("memory").queryName("stream_join_out").outputMode("append").start()
    try {
      clicks.addData(Click(1, 100, ts(0)), Click(2, 200, ts(5)))
      buys.addData(Buy(10, 100, ts(10)), Buy(20, 200, ts(45))) // 20 outside window
      q.processAllAvailable()
      val rows = spark.table("stream_join_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 10L, 100L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dropDuplicates suppresses repeated event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val deduped = input.toDS()
      .withWatermark("click_ts", "1 hour")
      .dropDuplicates("click_id")
      .select(col("click_id"), col("user"))
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup_out").outputMode("append").start()
    try {
      input.addData(Click(1, 100, ts(0)), Click(1, 100, ts(0)), Click(2, 200, ts(1)))
      q.processAllAvailable()
      input.addData(Click(2, 200, ts(1)), Click(3, 300, ts(2))) // 2 is a cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("stream_dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys   = MemoryStream[Buy]

    val joined = clicks.toDS()
      .withWatermark("click_ts", "10 minutes")
      .join(
        buys.toDS().withWatermark("buy_ts", "10 minutes"),
        expr("""
          user = buyer AND
          buy_ts >= click_ts AND
          buy_ts <= click_ts + INTERVAL 15 MINUTES"""),
        "left_outer")
      .select(col("click_id"), col("buy_id"))

    val q = joined.writeStream
      .format("memory").queryName("stream_louter_out").outputMode("append").start()
    try {
      clicks.addData(Click(1, 100, ts(0)), Click(2, 200, ts(5)))
      buys.addData(Buy(20, 200, ts(10))) // matches click 2; click 1 never buys
      q.processAllAvailable()
      // advance both watermarks far past click 1's join window, then let
      // the next micro-batch evict and emit the unmatched row
      clicks.addData(Click(99, 900, java.sql.Timestamp.valueOf("2025-06-01 12:00:00")))
      buys.addData(Buy(98, 901, java.sql.Timestamp.valueOf("2025-06-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("stream_louter_out").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(rows.get(2).contains(Some(20L)), s"matched pair missing: $rows")
      assert(rows.get(1).contains(None), s"unmatched click not emitted: $rows")
      assert(!rows.contains(99L), s"in-window click emitted early: $rows")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with a dim, unmatched kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((100L, "gold"), (200L, "silver")).toDF("user", "tier")
    val input = MemoryStream[Click]
    val enriched = input.toDS()
      .join(broadcast(dim), Seq("user"), "left")
      .select(col("click_id"), col("user"), col("tier"))
    val q = enriched.writeStream
      .format("memory").queryName("stream_static_out").outputMode("append").start()
    try {
      input.addData(Click(1, 100, ts(0)), Click(2, 300, ts(1))) // 300 not in dim
      q.processAllAvailable()
      val rows = spark.table("stream_static_out").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> None), rows.toString)
    } finally q.stop()
  }

  test("q173: full outer equals the batch full join — both unmatched sides null-extend") {
    import spark.implicits._
    val d   = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q173_stream_full_outer_join")(spark, d)
      .collect()
      .map(r => (Option(r.get(1)).map(_.toString.toLong),
        Option(r.get(2)).map(_.toString.toLong))).toSet
    val e = graft.Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val a = e.where(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val b = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val want = a.join(b,
        col("cu") === col("pu") && col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("interval 10 minutes"),
        "full_outer")
      .collect()
      .map(r => (Option(r.getAs[Any]("cid")).map(_.toString.toLong),
        Option(r.getAs[Any]("pid")).map(_.toString.toLong))).toSet
    assert(got === want)
    // the matrix really is a superset of the one-sided modes
    assert(got.exists(p => p._1.isDefined && p._2.isEmpty))   // unmatched click
    assert(got.exists(p => p._1.isEmpty && p._2.isDefined))   // unmatched purchase
  }
}
