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

  /** Unique-per-caller temp-name suffix: pid alone is not enough (two
    * threads in one JVM staging the same corpus would race on the same
    * temp path); the thread id disambiguates, and the ATOMIC_MOVE onto
    * the final name keeps the visible link safe either way.
    */
  private def nonce: String =
    s"${ProcessHandle.current().pid()}.${Thread.currentThread().getId}"

  /** The file source requires a *directory*; stage a symlink dir
    * pointing at the corpus events file (read-only testdata stays
    * untouched). [[graft.Staging.dirFor]] keys the dir by
    * (path, size, mtime), so a corpus regenerated in place — even with
    * a different physical ts type — gets a fresh dir; the link is also
    * re-created via ATOMIC_MOVE on every call so concurrent runs on the
    * same corpus never observe a missing or half-created link.
    */
  private def stageEventsDir(d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = graft.Staging.dirFor("graft_stream_events", src)
    val link = stageDir.resolve("events.parquet")
    val tmp  = stageDir.resolve(s"events.parquet.$nonce")
    Files.deleteIfExists(tmp)
    Files.createSymbolicLink(tmp, src)
    Files.move(tmp, link, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    stageDir.toString
  }

  /** Streaming file source over a staged dir. The read schema is peeked
    * from the staged files' actual footers (a one-file batch scan at
    * planning time, no data read), NOT hard-coded: events.ts has shipped
    * both as legacy TIMESTAMP(NANOS)-as-int64 and as plain
    * timestamp[us], and forcing the wrong schema onto parquet's int64
    * "succeeds" with 1000×-compressed timestamps — wrong answers, not
    * errors. [[graft.Tables.normalizeEventsTs]] then applies the same
    * footer-driven ts rule the batch loader uses.
    */
  private def streamFromDir(
      s: SparkSession,
      stageDir: String,
      options: Map[String, String] = Map.empty) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = s.read.parquet(stageDir).schema
    graft.Tables.normalizeEventsTs(
      s.readStream.options(options).schema(onDisk).parquet(stageDir))
  }

  /** Events replayed through the streaming file source. */
  private def eventStream(s: SparkSession, d: String) =
    streamFromDir(s, stageEventsDir(d))

  /** JSON timestamp round-trip options shared by the Kafka wire
    * fixture's to_json and the q315 decode: the default format carries
    * MILLIseconds only, and the events corpus has real microsecond
    * components — the 6-digit format makes the decoded ts byte-equal
    * to the corpus ts, which the q315 gate then asserts via min/max.
    */
  private val jsonTsOpts = Map(
    "timestampFormat"    -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** Stage the events table as real Kafka record-batch v2 log segments
    * (one `.log` per topic partition, partitioned by event_id % 3,
    * values = the same JSON payloads a producer would publish, one
    * header per record, 256 records per batch). Content-keyed and
    * marker-guarded like every fixture stager. The driver-side write is
    * harness-only — production segments come from brokers; what ships
    * is [[graft.sources.KafkaLog]]'s parse side, which q315 gates.
    */
  /** One v2 segment's bytes per topic partition (event_id % 3), records
    * ordered by event_id within the partition — the shared fixture
    * builder behind the intact (q315) and damaged (q317) stagers.
    */
  private def kafkaSegmentBytes(s: SparkSession, d: String): Map[Int, Array[Byte]] = {
    val ev = graft.Tables.events(s, d)
    // bounded fixture collect: the gated corpora are the test scale
    val rows = ev
      .select(
        pmod(col("event_id"), lit(3)).cast("int").as("p"),
        col("event_id").as("eid"),
        col("event_id").cast("string").as("k"),
        to_json(struct(ev.columns.map(col).toSeq: _*), jsonTsOpts).as("v"))
      .orderBy(col("p"), col("eid"))
      .collect()
    rows.groupBy(_.getInt(0)).map { case (p, rs) =>
      val recs = rs.toSeq.map { r =>
        (r.getLong(1), // record timestamp: the event id (opaque to the gate)
          r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8),
          r.getString(3).getBytes(java.nio.charset.StandardCharsets.UTF_8),
          Seq("src" -> "events".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      p -> graft.sources.KafkaLog.writeSegment(recs, baseOffset = 0L)
    }
  }

  private def stageSegmentFiles(
      s: SparkSession, d: String, prefix: String,
      mutate: (Int, Array[Byte]) => Array[Byte]): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = graft.Staging.dirFor(prefix, src)
    val marker = stageDir.resolve("_SEGMENTS_READY")
    if (!Files.exists(marker)) {
      kafkaSegmentBytes(s, d).foreach { case (p, bytes) =>
        val tmp = stageDir.resolve(s"p$p.log.$nonce")
        Files.write(tmp, mutate(p, bytes))
        Files.move(tmp, stageDir.resolve(s"p$p.log"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
      graft.Staging.touchMarker(marker)
    }
    stageDir.toString
  }

  private def stageKafkaSegments(s: SparkSession, d: String): String =
    stageSegmentFiles(s, d, "graft_kafka_seg", (_, b) => b)

  /** q317's fixture: p0 intact; p1's SECOND batch CRC-corrupted (one
    * payload byte flipped past its 61-byte header — framing intact, so
    * the parser skips exactly that batch and resumes); p2 torn 17 bytes
    * into its second batch (a crashed producer's partial write — the
    * walk stops, batch 0 survives). Batches are 256 records in
    * event_id order, so the lost record sets are exact rank windows
    * the oracle replays.
    */
  private def stageKafkaDamagedSegments(s: SparkSession, d: String): String =
    stageSegmentFiles(s, d, "graft_kafka_dmg", { (p, bytes) =>
      val b0len = 12 + java.nio.ByteBuffer.wrap(bytes, 8, 4).getInt
      p match {
        case 1 =>
          require(bytes.length > b0len + 70, "fixture too small for the CRC flip")
          val c = bytes.clone()
          c(b0len + 70) = (c(b0len + 70) ^ 0x1).toByte
          c
        case 2 =>
          require(bytes.length > b0len + 17, "fixture too small to tear")
          java.util.Arrays.copyOf(bytes, b0len + 17)
        case _ => bytes
      }
    })

  /** Parsed segment values → decode → the q37-shaped windowed aggregate
    * with per-group min/max ts — shared by q315 (intact) and q317
    * (recovery), so the two gates differ ONLY in which records survive
    * the wire.
    */
  private def kafkaDecodeAgg(
      values: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    graft.streaming.StreamingIngest.decode(values, schema, jsonTsOpts)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 2))).cast("double").as("total"),
        min(col("ts")).as("ts_min"),
        max(col("ts")).as("ts_max"))
      .select(
        col("window.start").as("day_start"),
        col("event_type"), col("n"), col("total"),
        col("ts_min"), col("ts_max"))

  /** Staging dir for the left-outer interval join (q79): the corpus
    * symlink PLUS a far-future sentinel click + purchase whose event
    * time drives the joint watermark past every real event, so the
    * drained replay resolves ALL real clicks — matches emit on match,
    * unmatched clicks emit null-extended at state eviction. The
    * sentinel rows themselves never reach the output: the watermark
    * never passes their own event time, so they are still held in
    * state when the drain stops (and their user_ids are negative, which
    * no generated event uses, so they match nothing). Built once per
    * corpus, keyed by the corpus path hash; the parquet sentinel is
    * staged under a pid+thread temp name and ATOMIC_MOVEd into place so
    * concurrent runs never observe a partial file.
    */
  private def stageEventsWithSentinel(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = graft.Staging.dirFor("graft_stream_events_sent", src)
    val link = stageDir.resolve("events.parquet")
    val tmp  = stageDir.resolve(s"events.parquet.$nonce")
    Files.deleteIfExists(tmp)
    Files.createSymbolicLink(tmp, src)
    Files.move(tmp, link, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    val sentinel = stageDir.resolve("sentinel.parquet")
    if (!Files.exists(sentinel)) {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import s.implicits._
      // 1-row scalar gate: the corpus max event time anchors the
      // sentinel. The sentinel rows must be written in the SAME
      // physical ts type as the corpus (the stream reads both files
      // under one footer-derived schema): legacy corpus → int64 nanos;
      // modern corpus → TIMESTAMP_NTZ, which parquet stores as the
      // identical unadjusted timestamp[us].
      val maxTs = s.read.parquet(src.toString).agg(max(col("ts"))).head().get(0)
      val far = maxTs match {
        case ns: java.lang.Long =>
          Seq(
            (-1L, ns + 100L * 24 * 3600 * 1000000000L, -1L, "click", 0.0, "{}"),
            (-2L, ns + 100L * 24 * 3600 * 1000000000L, -2L, "purchase", 0.0, "{}")
          ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        case ldt: java.time.LocalDateTime =>
          Seq(
            (-1L, ldt.plusDays(100), -1L, "click", 0.0, "{}"),
            (-2L, ldt.plusDays(100), -2L, "purchase", 0.0, "{}")
          ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        case other =>
          sys.error(s"unexpected events.ts runtime type: ${other.getClass}")
      }
      val build = stageDir.resolve(s"_sentinel_build_$nonce")
      far.coalesce(1).write.mode("overwrite").parquet(build.toString)
      val part = Files.list(build).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, sentinel, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      // best-effort cleanup of the build dir's remaining marker files
      Files.walk(build).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    stageDir.toString
  }

  /** Staging dir for the streaming MERGE upsert (q80): the corpus split
    * into 4 parquet files by event_id so `maxFilesPerTrigger=1` replays
    * it as 4 real micro-batches — the cross-batch newer-wins semantics
    * are what the query gates. Built once per corpus behind a marker
    * file; split parts are staged under temp names and moved in before
    * the marker lands.
    */
  private def stageEventsSplit(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = graft.Staging.dirFor("graft_stream_events_split", src)
    val marker = stageDir.resolve("_SPLIT_READY")
    if (!Files.exists(marker)) {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // re-written through the batch reader, so the split files carry
      // whatever ts type the corpus has (int64 for legacy nanos, NTZ
      // µs for the modern corpus) and the footer peek stays truthful
      val ev = s.read.parquet(src.toString)
      (0 until 4).foreach { i =>
        val build = stageDir.resolve(s"_split_build_$nonce")
        ev.where(col("event_id") % 4 === i)
          .coalesce(1).write.mode("overwrite").parquet(build.toString)
        val part = Files.list(build).filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        Files.move(part, stageDir.resolve(s"split_$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        Files.walk(build).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      val markerTmp = stageDir.resolve(s"_SPLIT_READY.$nonce")
      Files.write(markerTmp, Array.emptyByteArray)
      Files.move(markerTmp, marker, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    stageDir.toString
  }

  /** Click/purchase interval-join legs shared by q73 (inner) and q79
    * (left-outer).
    */
  private def intervalJoin(
      s: SparkSession,
      stageDir: String,
      joinType: String
  ) = {
    def side = streamFromDir(s, stageDir)
    val clicks = side
      .where(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        col("ts").as("click_ts")
      )
      .withWatermark("click_ts", "48 hours")
    val purchases = side
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
          col("purchase_ts") <= col("click_ts") + expr("interval 10 minutes"),
        joinType
      )
      .select(
        // coalesce is a no-op for inner/left (a matched or left row
        // always carries user_id) and REQUIRED for full outer, where a
        // right-unmatched purchase has only p_user_id
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us")
      )
    val sink = s"q_join_${joinType}_out"
    val q = joined.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink)
  }

  override def queries: Map[String, QueryDef] = Map(
    // Tumbling 1-day window over the event stream, complete mode into a
    // memory sink. Epoch-aligned windows == DuckDB date_trunc('day').
    // NOTE: complete mode re-emits every window each batch and its state
    // never evicts (the watermark cannot drop windows in complete mode),
    // so this shape is only valid for BOUNDED replays like this gate.
    // The run-forever production shape is q91: append mode, where the
    // watermark finalizes and evicts each window exactly once.
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
    // KAFKA WIRE-FORMAT INGEST (S1 made testable offline, the round-12
    // verdict's #5): the events table replayed as REAL Kafka
    // record-batch v2 log segments — one .log per topic partition,
    // CRC32C-verified batches, zigzag varints, a header per record,
    // JSON payloads — parsed back by graft.sources.KafkaLog and fed to
    // the SAME from_json decode every SourceProvider feeds
    // (StreamingIngest.decode's plan with the microsecond ts format).
    // The gate extends q37's windowed aggregate with per-group min/max
    // ts against the ORIGINAL parquet corpus: a single truncated
    // microsecond, flipped payload byte, or lost record anywhere in
    // the wire round-trip hash-mismatches. Plan shape at scale: one
    // task per segment file (binaryFile's split unit — a broker
    // partition's segment), the batch walk confined to the pure parser
    // at the flatMap boundary (the JpegCodec discipline), then the
    // ordinary decode + windowed aggregate. Torn/corrupt batch
    // semantics are spec-covered in KafkaLogSpec.
    "q315_kafka_wire_ingest" -> QueryDef(
      fn = (s, d) => {
        val ev     = graft.Tables.events(s, d)
        val schema = ev.schema
        val segDir = stageKafkaSegments(s, d)
        import s.implicits._
        val values = s.read.format("binaryFile")
          .load(s"$segDir/*.log")
          .select(col("content"))
          .as[Array[Byte]]
          .flatMap { bytes =>
            val parsed = graft.sources.KafkaLog.parseSegment(bytes)
            require(parsed.corruptSkipped == 0 && parsed.tornTailBytes == 0,
              s"corrupt fixture segment: batches=${parsed.batches} " +
                s"corrupt=${parsed.corruptSkipped} torn=${parsed.tornTailBytes}")
            parsed.records.map(r =>
              new String(r.value, java.nio.charset.StandardCharsets.UTF_8))
          }
          .toDF("value")
        kafkaDecodeAgg(values, schema)
      },
      oracle = Some("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total,
               MIN(ts) AS ts_min, MAX(ts) AS ts_max
        FROM events GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // KAFKA LOG RECOVERY (broker-crash semantics as a VALUE-LEVEL gate):
    // q315's corpus with partition 1's second batch CRC-corrupted and
    // partition 2 torn mid-way through its second batch. The parser
    // must skip EXACTLY the corrupt batch and resume (p1 loses ranks
    // 257..512 of its event order, later batches survive) and stop at
    // the torn tail (p2 keeps only ranks 1..256) — the oracle replays
    // those precise rank windows over the original corpus, so a parser
    // that resumed at the wrong offset, dropped a trailing batch, or
    // mis-framed the corrupt one hash-mismatches at record grain.
    // This is the recovery behavior a 100 TB ingest needs when a
    // broker segment arrives damaged: quarantine the BATCH, not the
    // partition, and never trust bytes past a torn frame.
    "q317_kafka_wire_recovery" -> QueryDef(
      fn = (s, d) => {
        val ev     = graft.Tables.events(s, d)
        val schema = ev.schema
        val segDir = stageKafkaDamagedSegments(s, d)
        import s.implicits._
        val values = s.read.format("binaryFile")
          .load(s"$segDir/*.log")
          .select(col("content"))
          .as[Array[Byte]]
          .flatMap { bytes =>
            graft.sources.KafkaLog.parseSegment(bytes).records.map(r =>
              new String(r.value, java.nio.charset.StandardCharsets.UTF_8))
          }
          .toDF("value")
        kafkaDecodeAgg(values, schema)
      },
      oracle = Some("""
        WITH ranked AS (
          SELECT *, event_id % 3 AS p,
                 ROW_NUMBER() OVER (PARTITION BY event_id % 3
                   ORDER BY event_id) AS rk
          FROM events),
        surv AS (
          SELECT * FROM ranked
          WHERE (p = 0)
             OR (p = 1 AND (rk <= 256 OR rk > 512))
             OR (p = 2 AND rk <= 256))
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total,
               MIN(ts) AS ts_min, MAX(ts) AS ts_max
        FROM surv GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // KAFKA SEGMENTS THROUGH A REAL MICRO-BATCH STREAM — what S1 looks
    // like in production: a file-source stream over the broker's
    // segment directory (binaryFile is a FileFormat, so readStream
    // tails it like any file source), the batch walk confined to the
    // pure parser at each micro-batch's flatMap boundary, feeding the
    // q37-shape windowed aggregate. maxFilesPerTrigger=1 makes each
    // broker segment its OWN planned micro-batch — and the fixture is
    // q317's DAMAGED corpus, so recovery happens MID-STREAM: the
    // micro-batch holding partition 1 quarantines its CRC-corrupt
    // batch and the STREAM CONTINUES into partition 2's torn segment
    // (require(batches >= 3) proves the per-segment batching was
    // real). Gated against q317's oracle verbatim — the streaming
    // plan's final complete-mode table must equal the batch twin's
    // aggregate over the surviving rank windows, the q315-style
    // equivalence but through writeStream. At 100 TB this is the
    // landing-zone ingest shape: segments arrive continuously, each
    // is one task's sequential parse, state is the windowed aggregate
    // only.
    "q325_kafka_stream_segments" -> QueryDef(
      fn = (s, d) => {
        val ev     = graft.Tables.events(s, d)
        val schema = ev.schema
        val segDir = stageKafkaDamagedSegments(s, d)
        import s.implicits._
        val binarySchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
        val values = s.readStream.format("binaryFile")
          .schema(binarySchema)
          .option("maxFilesPerTrigger", 1)
          .load(s"$segDir/*.log")
          .select(col("content"))
          .as[Array[Byte]]
          .flatMap { bytes =>
            graft.sources.KafkaLog.parseSegment(bytes).records.map(r =>
              new String(r.value, java.nio.charset.StandardCharsets.UTF_8))
          }
          .toDF("value")
        val agg  = kafkaDecodeAgg(values, schema)
        val sink = "q325_out"
        val q = agg.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("complete")
          .start()
        try {
          q.processAllAvailable()
          val fed = q.recentProgress.count(_.numInputRows > 0)
          require(fed >= 3,
            s"expected >= 3 per-segment micro-batches, saw $fed — " +
              "maxFilesPerTrigger did not split the segment directory")
        } finally q.stop()
        s.table(sink)
      },
      oracle = Some("""
        WITH ranked AS (
          SELECT *, event_id % 3 AS p,
                 ROW_NUMBER() OVER (PARTITION BY event_id % 3
                   ORDER BY event_id) AS rk
          FROM events),
        surv AS (
          SELECT * FROM ranked
          WHERE (p = 0)
             OR (p = 1 AND (rk <= 256 OR rk > 512))
             OR (p = 2 AND rk <= 256))
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total,
               MIN(ts) AS ts_min, MAX(ts) AS ts_max
        FROM surv GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // Trigger.AvailableNow — the PRODUCTION drain trigger: process all
    // data available at start (honoring source rate limits —
    // maxFilesPerTrigger=1 over the 4-way split makes this 4 real
    // planned micro-batches), then stop on its own. This is how a
    // scheduled backfill/catch-up job runs at scale: bounded work, no
    // always-on cluster, exactly the same incremental plan — where
    // processAllAvailable (the other gates) is a test-harness drain of
    // an already-running query. awaitTermination returns when the
    // trigger exhausts the source; the final complete-mode table must
    // equal the batch aggregation.
    "q148_stream_available_now" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val agg = streamFromDir(
            s, stageEventsSplit(s, d), Map("maxFilesPerTrigger" -> "1"))
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
            .queryName("q148_out")
            .outputMode("complete")
            .trigger(Trigger.AvailableNow())
            .start()
          try q.awaitTermination() // AvailableNow terminates itself
          finally q.stop()
          s.table("q148_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // APPEND-MODE windowed aggregation — the production counterpart of
    // q37: a window row is emitted exactly ONCE, when the watermark
    // passes window.end + delay, and its state is evicted — so state and
    // output stay bounded no matter how long the stream runs (q37's
    // complete mode cannot evict). Determinism for the gate comes from
    // the far-future sentinel staged beside the corpus: it drives the
    // final watermark past every real window's finalization point, so
    // the drained replay emits every real day exactly once, while the
    // sentinel's own far-future window never finalizes and never
    // appears. Same batch oracle as q37 — finalized-append over a
    // bounded replay must equal the batch aggregation.
    "q91_stream_window_append" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val agg = streamFromDir(s, stageEventsWithSentinel(s, d))
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
            .queryName("q91_out")
            .outputMode("append")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q91_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // Sessionization through Spark's NATIVE session_window aggregation
    // (the built-in counterpart to q88's hand-rolled
    // flatMapGroupsWithState sessionizer): dynamic-gap session windows
    // merge inside the streaming aggregation operator, append mode
    // emits each session exactly once when the watermark passes
    // session_end + gap, and the far-future sentinel (q91's trick)
    // drives the final watermark past every real session so the
    // drained replay is complete. The sentinel's own session never
    // finalizes and never appears. Oracle = the same batch gap-rule
    // sessionization q40 gates (session_window's [start, last+gap)
    // merge rule equals the lag()>30min rule except for gaps of
    // EXACTLY 30:00.000000, which the generated corpus does not
    // contain). Session state is watermark-bounded — this is the
    // run-forever production shape for session analytics at 100 TB.
    "q107_session_window_native" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          val agg = streamFromDir(s, stageEventsWithSentinel(s, d))
            .withWatermark("ts", "48 hours")
            .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
            .agg(
              min(col("ts")).as("session_start"),
              max(col("ts")).as("session_end"),
              count(lit(1)).as("n_events"),
              sum(col("value").cast(DecimalType(28, 2))).cast("double").as("total_value"))
            .select(
              col("user_id"), col("session_start"), col("session_end"),
              col("n_events"), col("total_value"))
          val q = agg.writeStream
            .format("memory")
            .queryName("q107_out")
            .outputMode("append")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q107_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT user_id,
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
              FROM events)
          )
        ) GROUP BY user_id, session_seq""")
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
        // a stream-stream join allocates 4 state stores per shuffle
        // partition (2 per side); at replay scale the state is tiny, so
        // store setup/commit dominates. Measured sweep at sf0.1 (round
        // 5): 2 partitions 30+ s (per-partition state doubles and the
        // HDFS-backed store's version-map copying is superlinear in
        // per-store state), 4 partitions ~2.9 s, 8 partitions ~5.5 s
        // (store-count overhead) — 4 is the knee. Production sizing:
        // partitions ~ state volume / executor memory, not a fixed 32.
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        try {
          intervalJoin(s, stageEventsDir(d), "inner")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      // the CTE truncates to microseconds BEFORE joining: the Spark side
      // joins on ns->us truncated timestamps, so an oracle joining at ns
      // precision would silently diverge on sub-microsecond boundary
      // pairs if the generator ever emitted them
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events)
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
        FROM e a
        JOIN e b ON a.user_id = b.user_id
                AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'""")
    ),

    // ----------------------------------------------------------------
    // LEFT-OUTER stream-stream interval join — the semantics most likely
    // to silently diverge: a click with no purchase in its window may
    // only emit (null-extended) once the watermark proves no match can
    // still arrive, i.e. rows are born at state EVICTION, not at data
    // arrival. A far-future sentinel click+purchase staged beside the
    // corpus drives the final watermark past every real event, so the
    // drained replay resolves every real click and the batch oracle is
    // the plain left-outer theta join. The sentinels stay in state
    // (watermark never passes their own time) and match nothing, so
    // they never appear in the output.
    "q79_stream_left_outer_join" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          intervalJoin(s, stageEventsWithSentinel(s, d), "left_outer")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events)
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
        FROM (SELECT * FROM e WHERE event_type = 'click') a
        LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE""")
    ),

    // ----------------------------------------------------------------
    // Stream-stream FULL OUTER interval join — completes the streaming
    // join-mode matrix (q73 inner, q79 left): matched pairs emit on
    // match, unmatched CLICKS null-extend at left-state eviction, and
    // unmatched PURCHASES null-extend at right-state eviction. Both
    // evictions need the interval condition to bound EACH side's event
    // time relative to the other — the same two-sided (>, <=) bound
    // the inner join declares — and the far-future sentinel drives the
    // joint watermark past every real event so the drained replay
    // resolves all of them. The state-size story is unchanged from
    // q73/q79: O(events within the 10-minute interval + watermark lag),
    // evicted as the watermark advances.
    "q173_stream_full_outer_join" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          intervalJoin(s, stageEventsWithSentinel(s, d), "full_outer")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events)
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               a.event_id AS click_id, b.event_id AS purchase_id,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
        FROM (SELECT * FROM e WHERE event_type = 'click') a
        FULL JOIN (SELECT * FROM e WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE""")
    ),

    // ----------------------------------------------------------------
    // Streaming MERGE upsert (CDC into a warehouse table): the corpus
    // replayed as 4 real micro-batches (maxFilesPerTrigger=1 over the
    // 4-way split staging dir), each foreachBatch-merged into a parquet
    // warehouse table with newer-wins semantics — the reference's T5
    // late-data path under streaming. The gated result is the FINAL
    // table state: one row per (user_id, event_type) carrying the
    // newest event time. Only key + version are projected because the
    // MERGE tie-break (target wins equal versions) makes non-version
    // columns depend on batch arrival order; key + max-version is
    // order-independent and exactly what a batch GROUP BY computes.
    "q80_stream_merge_upsert" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files
            .createTempDirectory("graft_q80_wh_").toString
          try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          val stream = streamFromDir(
            s, stageEventsSplit(s, d), Map("maxFilesPerTrigger" -> "1"))
            .select(col("user_id"), col("event_type"), col("ts"))
          val q = StreamingUpsert.start(
            stream, wh, "silver", "event_latest",
            keys = Seq("user_id", "event_type"), versionCol = "ts")
          try q.processAllAvailable()
          finally q.stop()
          // pin the small final state so the temp warehouse can go away;
          // the finally drops the /tmp tree even when a batch fails
          // (q176/q177 pattern)
          wh.load("silver", "event_latest")
            .select(col("user_id"), col("event_type"), col("ts").as("last_ts"))
            .localCheckpoint(true)
          } finally graft.Staging.deleteRecursively(
            java.nio.file.Paths.get(whRoot))
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT user_id, event_type,
               MAX(CAST(ts AS TIMESTAMP)) AS last_ts
        FROM events GROUP BY user_id, event_type""")
    ),

    // ----------------------------------------------------------------
    // Spark 4 `transformWithState` (the flatMapGroupsWithState
    // successor): per-user running count in a typed ValueState over the
    // mandatory RocksDB state backend — the production state-store
    // configuration for unbounded keyspaces (spillable, changelog-
    // checkpointed, off-heap). The processor emits the cumulative count
    // on every invocation; the commutative state update makes the
    // per-key MAX of the update stream equal the exact batch count
    // whatever the batch split, so the oracle is a plain GROUP BY.
    "q170_stream_transform_state" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        import TransformWithStateOps._
        withRocksDBStateStore(s) {
          implicit val inEnc  = org.apache.spark.sql.Encoders.product[In]
          implicit val outEnc = org.apache.spark.sql.Encoders.product[CumCount]
          implicit val kEnc   = org.apache.spark.sql.Encoders.scalaLong
          val updates = eventStream(s, d)
            .select(col("user_id"), col("event_id")).as[In](inEnc)
            .groupByKey(_.user_id)(kEnc)
            .transformWithState(
              new RunningCountProcessor, TimeMode.None(), OutputMode.Update(), outEnc)
          val q = updates.writeStream
            .format("memory")
            .queryName("q170_out")
            .outputMode("update")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q170_out")
            .groupBy(col("user_id"))
            .agg(max(col("n_seen")).as("n_events"))
        }
      },
      oracle = Some("SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id")
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
    // Stream-static enrichment oracle-gated: the stateless shape every
    // production stream runs first — events joined against broadcast
    // dimension tables (customer segment, then nation) while still a
    // stream. No watermark or state: the static sides are plain batch
    // relations snapshotted per micro-batch, the join is a broadcast
    // hash join inside the streaming plan, and append mode emits each
    // enriched row exactly once, so the drained replay equals the batch
    // join. Left joins keep events whose user has no dim row.
    "q89_stream_static_enrich" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val cust = graft.Tables.customer(s, d)
            .select(
              col("c_custkey").as("user_id"),
              col("c_mktsegment").as("segment"),
              col("c_nationkey"))
          val nat = graft.Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("nation_name"))
          val dim = cust
            .join(broadcast(nat), Seq("c_nationkey"), "left")
            .select(col("user_id"), col("segment"), col("nation_name"))
          val enriched = streamFromDir(s, stageEventsDir(d))
            .select(col("event_id"), col("user_id"), col("event_type"))
            .join(broadcast(dim), Seq("user_id"), "left")
          val q = enriched.writeStream
            .format("memory")
            .queryName("q89_out")
            .outputMode("append")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q89_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        SELECT e.user_id, e.event_id, e.event_type,
               c.c_mktsegment AS segment, n.n_name AS nation_name
        FROM events e
        LEFT JOIN customer c ON c.c_custkey = e.user_id
        LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey""")
    ),

    // ----------------------------------------------------------------
    // STATEFUL sessionization oracle-gated end-to-end: the same
    // flatMapGroupsWithState operator the specs drive, run against the
    // replayed corpus and compared to a batch oracle. Sessions close at
    // event-time TIMEOUT (state eviction), so the far-future sentinel
    // drives the final watermark past every real user's last+gap and
    // the drained output is every real session; the sentinels' own
    // state never times out and never emits. Timestamps flow through
    // java.sql.Timestamp inside the operator, i.e. MILLISECOND
    // precision — the oracle replays the same ms truncation (epoch_ms),
    // the same (ms, event_id) processing order, and the same sequential
    // double fold for the session total (list_sum over an ordered
    // list), so the result is bit-exact.
    "q88_sessionize_stateful" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val ev = streamFromDir(s, stageEventsWithSentinel(s, d))
            .select(col("user_id"), col("ts"), col("value"), col("event_id"))
            .as[Sessionize.Event]
          val q = Sessionize.sessions(ev, gapMinutes = 30).toDF()
            .writeStream
            .format("memory")
            .queryName("q88_out")
            .outputMode("append")
            .start()
          try q.processAllAvailable()
          finally q.stop()
          s.table("q88_out")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_id, user_id, value,
                 epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
          FROM events),
        x AS (
          SELECT user_id, event_id, ms, value,
                 LAG(ms) OVER (PARTITION BY user_id ORDER BY ms ASC, event_id ASC) AS prev_ms
          FROM e),
        y AS (
          SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
                         THEN 1 ELSE 0 END AS new_session
          FROM x),
        z AS (
          SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                      ORDER BY ms ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
          FROM y)
        SELECT user_id,
               make_timestamp(MIN(ms) * 1000) AS session_start,
               make_timestamp(MAX(ms) * 1000) AS session_end,
               COUNT(*) AS n_events,
               list_sum(list(value ORDER BY ms ASC, event_id ASC)) AS total_value
        FROM z GROUP BY user_id, seq""")
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
    ),

    // ----------------------------------------------------------------
    // SLIDING-WINDOW streaming aggregation — the third and last window
    // family next to tumbling (q37/q91) and session (q107): 2-day
    // windows advancing every 1 day, so every event lands in exactly
    // TWO overlapping windows (the trailing-metrics shape: "events in
    // the last 2 days, refreshed daily"). Spark plans this as a
    // 2-row-per-event expand feeding the same windowed state as
    // tumbling; in APPEND mode (the q91 production shape) the
    // watermark finalizes-and-evicts each window once, so live state
    // is 2 windows per group regardless of rate. This gate runs
    // COMPLETE mode like q37 — valid only for a bounded replay,
    // because complete-mode state never evicts (q37's caveat applies
    // verbatim); what it proves is the 2-window expansion semantics
    // against the oracle's explicit two-window UNNEST.
    "q156_stream_sliding_window" -> QueryDef(
      fn = (s, d) => {
        val agg = eventStream(s, d)
          .withWatermark("ts", "48 hours")
          .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(28, 2))).cast("double").as("total")
          )
          .select(
            col("window.start").as("win_start"),
            col("event_type"), col("n"), col("total")
          )
        val q = agg.writeStream
          .format("memory")
          .queryName("q156_out")
          .outputMode("complete")
          .start()
        try q.processAllAvailable()
        finally q.stop()
        s.table("q156_out")
      },
      oracle = Some("""
        SELECT ws AS win_start, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM (
          SELECT event_type, value,
                 UNNEST([CAST(date_trunc('day', ts) AS TIMESTAMP),
                         CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS TIMESTAMP)]) AS ws
          FROM events)
        GROUP BY 1, 2""")
    )
  )
}
