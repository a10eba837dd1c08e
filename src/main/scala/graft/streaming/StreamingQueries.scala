package graft.streaming

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Verifiable streaming query: the events table replayed through a real
  * Structured-Streaming file source into a tumbling-window aggregation.
  * `processAllAvailable` drains the stream synchronously, so the result
  * is deterministic and comparable to a batch oracle — the point being
  * that the *same* windowed plan runs incrementally per micro-batch in
  * production.
  */
object StreamingQueries extends QueryModule {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** The file source requires a *directory*; stage a symlink dir
    * pointing at the corpus events file (read-only testdata stays
    * untouched). Keyed by an md5 of the normalized corpus path —
    * hashCode could collide two corpora into one staging dir — and
    * re-linked unconditionally so a corpus swapped in at the same path
    * is never read through a stale link.
    */
  private def stageEventsDir(d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = Paths.get(
      "/tmp/graft_stream_events_" + graft.Digest.md5Hex(src.toString))
    Files.createDirectories(stageDir)
    // re-link via ATOMIC_MOVE so concurrent runs on the same corpus
    // never observe a missing or half-created link
    val link = stageDir.resolve("events.parquet")
    val tmp  = stageDir.resolve(s"events.parquet.${ProcessHandle.current().pid()}")
    Files.deleteIfExists(tmp)
    Files.createSymbolicLink(tmp, src)
    Files.move(tmp, link, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    stageDir.toString
  }

  /** Events replayed through the streaming file source, ns→µs converted
    * the same way DuckDB truncates.
    */
  private def eventStream(s: SparkSession, d: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream
      .schema(eventsSchema)
      .parquet(stageEventsDir(d))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Body of the stream-stream interval join (see the QueryDef below). */
  private def q73(s: SparkSession, d: String) = {
    val clicks = eventStream(s, d)
      .where(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        col("ts").as("click_ts")
      )
      .withWatermark("click_ts", "48 hours")
    val purchases = eventStream(s, d)
      .where(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts")
      )
      .withWatermark("purchase_ts", "48 hours")
    val joined = clicks
      .join(
        purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("interval 10 minutes")
      )
      .select(
        col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us")
      )
    val q = joined.writeStream
      .format("memory")
      .queryName("q73_out")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table("q73_out")
  }

  override def queries: Map[String, QueryDef] = Map(
    // Tumbling 1-day window over the event stream, complete mode into a
    // memory sink. Epoch-aligned windows == DuckDB date_trunc('day').
    "q37_stream_window_agg" -> QueryDef(
      fn = (s, d) => {
        val agg = eventStream(s, d)
          .withWatermark("ts", "48 hours")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(28, 2))).cast("double").as("total")
          )
          .select(
            col("window.start").as("day_start"),
            col("event_type"), col("n"), col("total")
          )
        val q = agg.writeStream
          .format("memory")
          .queryName("q37_out")
          .outputMode("complete")
          .start()
        try q.processAllAvailable()
        finally q.stop()
        s.table("q37_out")
      },
      oracle = Some("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // Stream-stream interval join through the REAL streaming machinery:
    // clicks joined to purchases by the same user within 10 event-time
    // minutes, both sides watermarked (that bounds the join state the
    // engine must hold — the property that keeps this runnable forever
    // at production rates). Inner joins emit on match, so draining the
    // bounded replay yields the complete, deterministic pair set and
    // the batch oracle is the plain theta join.
    "q73_stream_stream_join" -> QueryDef(
      fn = (s, d) => {
        // a stream-stream join allocates one state store per shuffle
        // partition per side; at replay scale the state is tiny, so 32
        // partitions would spend multiples of the query's runtime on
        // store setup. Production sizing: partitions ~ state volume /
        // executor memory, not a fixed 32.
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          q73(s, d)
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
        FROM events a
        JOIN events b ON a.user_id = b.user_id
                     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'""")
    ),

    // ----------------------------------------------------------------
    // Streaming deduplication through the real engine: watermarked
    // dropDuplicates holds one state row per key and emits each key's
    // FIRST arrival. Projecting just the keys makes the drained result
    // deterministic (which physical row carried the key is racy; the
    // key set is not), so the batch oracle is a plain DISTINCT.
    "q75_stream_dedup" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val deduped = eventStream(s, d)
            .withWatermark("ts", "48 hours")
            .dropDuplicates("user_id", "event_type")
            .select(col("user_id"), col("event_type"))
          val q = deduped.writeStream
            .format("memory")
            .queryName("q75_out")
            .outputMode("append")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q75_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("SELECT DISTINCT user_id, event_type FROM events")
    ),

    // ----------------------------------------------------------------
    // Batch sessionization (the lag + running-flag-sum formulation) —
    // same session semantics as the stateful streaming operator
    // [[Sessionize]], expressed relationally so it oracle-checks: a new
    // session starts after > 30 event-time minutes of per-user silence.
    "q40_sessionize_batch" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        graft.Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn(
            "new_session",
            when(
              col("prev_ts").isNull ||
                (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000,
              1
            ).otherwise(0)
          )
          .withColumn(
            "session_seq",
            sum(col("new_session")).over(
              byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          )
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(28, 2))).cast("double").as("total_value")
          )
      },
      oracle = Some("""
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
        FROM (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
          FROM (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN prev_ts IS NULL
                          OR DATE_DIFF('microsecond', prev_ts, ts) > 30 * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM (
              SELECT user_id, event_id, ts, value,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
              FROM events
            )
          )
        ) GROUP BY user_id, session_seq""")
    )
  )
}
