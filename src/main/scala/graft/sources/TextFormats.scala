package graft.sources

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL and ORC source coverage for the document pipeline (round 5).
  *
  * Training corpora overwhelmingly arrive as JSON-lines (one document
  * per line, a fraction of them malformed) and leave as columnar files.
  * These queries gate BOTH directions against the parquet ground truth:
  * the staged inputs are derived deterministically from
  * `documents.parquet`, so the DuckDB oracle is simply the original
  * table — any loss, corruption, mis-escaping, or schema drift in the
  * Spark source/sink round trip breaks the hash match.
  *
  * Staging uses the corpus-hash + atomic-move pattern the streaming
  * queries established (StreamingQueries.stageEventsWithSentinel): built
  * once per corpus, safe under concurrent runs.
  */
object TextFormats extends QueryModule {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def nonce: String =
    ProcessHandle.current().pid().toString + "_" + Thread.currentThread().getId

  /** Staging directory for the JSONL fixture of a given corpus — shared
    * with TextFormatsSpec so the path scheme lives in exactly one place.
    * Content-keyed ([[graft.Staging.dirFor]]): a corpus regenerated in
    * place gets a fresh fixture instead of the stale one.
    */
  private[sources] def jsonlStageDir(d: String): java.nio.file.Path = {
    val src = java.nio.file.Paths.get(d, "documents.parquet")
      .toAbsolutePath.normalize
    graft.Staging.dirFor("graft_jsonl", src)
  }

  /** The q192 STREAMING DEDUP-AT-INGEST GATE, unstarted — the
    * maintained-index family's streaming corner: arriving crawl
    * documents are banded INSIDE the streaming plan
    * (DedupQueries.mhBandsRowwise — minhash over the in-row shingle
    * array, NO aggregation, so the plan stays append-mode stateless)
    * and stream-static-joined against the corpus band index (q182's
    * table contents). The emitted (doc_id, band, band_key) rows are
    * the candidate hits an ingestion tier routes to quarantine /
    * rescore — each arriving doc's duplicate signal available at
    * ingest latency, no nightly batch wait.
    *
    * Exposed unstarted so the query fn and the broadcast-fallback
    * gates (BroadcastFallbackSpec, PlanAudit) can each attach their
    * own sink: the gates run it under autoBroadcastJoinThreshold=-1
    * with a foreachBatch sink and assert the micro-batch plan keeps a
    * keyed SortMergeJoin (never BNLJ) with identical rows — at 100 TB
    * the band index outgrows broadcast and this degradation path is
    * the one that actually runs.
    */
  private[graft] def streamDedupGateDf(s: SparkSession, d: String): DataFrame = {
    import graft.functions.DedupQueries
    graft.plans.VectorFunctions.register(s)
    // static side: the corpus band-key index, pinned once so the
    // per-microbatch re-evaluation reads materialized blocks
    val corpusKeys = DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
      .where(col("doc_id") % 5 =!= 0)
      .select(col("band"), col("band_key")).distinct()
      .localCheckpoint(true)
    val readSchema = docSchema.add("_corrupt_record", StringType)
    s.readStream
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(stageJsonl(s, d))
      .where(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .where(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        explode(DedupQueries.mhBandsRowwise(col("text"))).as("bb"))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.band_key").as("band_key"))
      .join(corpusKeys, Seq("band", "band_key"))
  }

  /** documents.parquet serialized to JSONL with 5 malformed lines mixed
    * in — the ingestion fixture. JSON escaping round-trips newlines and
    * unicode, which is exactly what the oracle compare proves.
    *
    * _READY is created only after BOTH files are in place (the pattern
    * stageOrc/stageEvolved use), so a crash mid-staging can never leave
    * a permanently half-built fixture that later runs treat as done.
    */
  private[sources] def stageJsonl(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "documents.parquet").toAbsolutePath.normalize
    val dir = jsonlStageDir(d)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      // malformed lines a real crawl drop ships: truncated JSON, bare
      // text, wrong bracket — PERMISSIVE mode must quarantine, not fail.
      // Staged FIRST so the clean file can never exist without it. The
      // temp name is '_'-prefixed: Spark's listing skips hidden files,
      // so a crash-orphaned temp (or a laggard concurrent stager) can
      // never be ingested as extra corrupt lines.
      val corrupt = dir.resolve(s"_corrupt_$nonce")
      Files.write(corrupt, java.util.Arrays.asList(
        """{"doc_id": 900001, "text": "truncated""",
        """not json at all""",
        """[1, 2, 3]""",
        """{"doc_id": "NaN-ish" """,
        """{}garbage-suffix"""))
      Files.move(corrupt, dir.resolve("corrupt.jsonl"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      val build = dir.resolve(s"_build_$nonce")
      s.read.parquet(src.toString)
        .select(to_json(struct(
          col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")))
          .as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(build.toString)
      val part = Files.list(build)
        .filter(_.getFileName.toString.endsWith(".txt"))
        .findFirst().orElseThrow()
      Files.move(part, dir.resolve("docs.jsonl"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      Files.walk(build).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      graft.Staging.touchMarker(marker)
    }
    dir.toString
  }

  /** documents.parquet rewritten as ORC — the columnar round trip. */
  private def stageOrc(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(d, "documents.parquet").toAbsolutePath.normalize
    val dir = graft.Staging.dirFor("graft_orc", src, create = false)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      val build = dir.resolveSibling(dir.getFileName.toString + s"_build_$nonce")
      s.read.parquet(src.toString)
        .write.mode("overwrite").orc(build.toString)
      try Files.move(build, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException => // lost the race: use theirs
          Files.walk(build).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
      }
      graft.Staging.touchMarker(marker)
    }
    dir.toString
  }

  /** Two parquet files with EVOLVED schemas in one directory: batch 1
    * is the v1 layout (doc_id, source, n_chars); batch 2 is the v2
    * layout that dropped n_chars and added (lang, quality). The files
    * are moved in flat (no key=value dirs) so partition discovery does
    * not invent a column.
    */
  private def stageEvolved(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d, "documents.parquet").toAbsolutePath.normalize
    val dir = graft.Staging.dirFor("graft_evo", src)
    val marker = dir.resolve("_READY")
    if (!Files.exists(marker)) {
      def stageOne(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val build = dir.resolve(s"_build_${name}_$nonce")
        df.coalesce(1).write.mode("overwrite").parquet(build.toString)
        val part = Files.list(build)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        Files.move(part, dir.resolve(name),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        Files.walk(build).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      val docs = s.read.parquet(src.toString)
      stageOne("v1.parquet", docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars")))
      stageOne("v2.parquet", docs.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("lang"),
          (col("n_chars") * 2).as("quality")))
      graft.Staging.touchMarker(marker)
    }
    dir.toString
  }

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // SCHEMA EVOLUTION — reading a table whose files span two schema
    // versions, the normal state of any long-lived 100 TB dataset.
    // mergeSchema=true unions the footers (per-FILE schemas merged at
    // planning, not a data rewrite); columns absent from a file read
    // as NULL. The oracle reconstructs the identical union from the
    // base table, so a dropped column, a mis-merged type, or a
    // partition-discovery ghost column all break the hash.
    "q138_schema_evolution" -> QueryDef(
      fn = (s, d) =>
        s.read.option("mergeSchema", "true").parquet(stageEvolved(s, d))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("lang"), col("quality")),
      oracle = Some("""
        SELECT doc_id, source, n_chars,
               CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS quality
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars,
               lang, n_chars * 2 AS quality
        FROM documents WHERE doc_id % 2 = 1"""),
    ),
    // ----------------------------------------------------------------
    // JSONL ingestion with corrupt-record quarantine: PERMISSIVE mode
    // routes unparseable lines into _corrupt_record instead of failing
    // the job — the only policy that survives a 100 TB crawl drop,
    // where some malformed lines are a certainty. The query emits the
    // clean rows; the quarantined lines are asserted in
    // TextFormatsSpec (they cannot appear in a documents-table oracle).
    // Schema is EXPLICIT: schema inference would re-scan the corpus
    // and silently widen types on dirty data.
    "q108_jsonl_ingest" -> QueryDef(
      fn = (s, d) => {
        val readSchema = docSchema.add("_corrupt_record", StringType)
        s.read
          .schema(readSchema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(stageJsonl(s, d))
          // parse success alone is NOT validity: Jackson accepts a
          // valid first token and ignores trailing garbage ("{}junk"
          // parses as an all-null row with NO corrupt record), so
          // quarantine = unparseable OR missing the required key — the
          // validation rule a real ingest runs
          .where(col("_corrupt_record").isNull && col("doc_id").isNotNull)
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      },
      oracle = Some(
        "SELECT doc_id, text, lang, source, n_chars FROM documents"),
    ),

    // ----------------------------------------------------------------
    // STREAMING CORPUS INGEST — the document-side streaming path (the
    // other gates stream events): crawl drops land as JSONL and are
    // scored AS THEY ARRIVE — the same PERMISSIVE parse + quarantine
    // rule as q108, plus quality and token scoring, through the real
    // streaming file source into an append sink. Stateless (no
    // watermark, no aggregation), so each clean document is emitted
    // exactly once and the drained replay equals the batch score pass
    // — the shape a continuous ingestion tier runs at 100 TB, with the
    // scoring projection fully codegen'd inside the streaming plan.
    "q149_stream_corpus_ingest" -> QueryDef(
      fn = (s, d) => {
        import graft.functions.{TextFunctions, TextQueries}
        graft.plans.VectorFunctions.register(s)
        val readSchema = docSchema.add("_corrupt_record", StringType)
        val stream = s.readStream
          .schema(readSchema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(stageJsonl(s, d))
          .where(col("_corrupt_record").isNull && col("doc_id").isNotNull)
          .select(
            col("doc_id"), col("source"), col("lang"),
            TextFunctions.qualityScore(col("text")).as("q"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val q = stream.writeStream
          .format("memory")
          .queryName("q149_out")
          .outputMode("append")
          .start()
        try q.processAllAvailable()
        finally q.stop()
        s.table("q149_out")
      },
      oracle = Some(s"""
        SELECT doc_id, source, lang,
               CAST(${graft.functions.TextQueries.qualitySql} AS INTEGER) AS q,
               ${graft.functions.TextQueries.tokenCountSql} AS n_tokens
        FROM (${graft.functions.TextQueries.normSql})"""),
    ),

    // ----------------------------------------------------------------
    // STREAMING DEDUP-AT-INGEST GATE — the unstarted stream lives in
    // [[streamDedupGateDf]] (shared with BroadcastFallbackSpec /
    // PlanAudit, which attach a foreachBatch sink to inspect the real
    // micro-batch plan). Oracle = the batch semi-join at the same
    // grain, so a drift between the row-wise and aggregated banding
    // (or a stream/batch text round-trip difference) breaks the hash
    // match.
    "q192_stream_dedup_gate" -> QueryDef(
      fn = (s, d) => {
        val stream = streamDedupGateDf(s, d)
        val q = stream.writeStream
          .format("memory")
          .queryName("q192_out")
          .outputMode("append")
          .start()
        try q.processAllAvailable()
        finally q.stop()
        s.table("q192_out").select(col("doc_id"), col("band"), col("band_key"))
      },
      oracle = Some(s"""
        WITH ${graft.functions.DedupQueries.mhBandsCtesSql},
        bb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
        ek AS (SELECT DISTINCT band, band_key FROM bands WHERE doc_id % 5 <> 0)
        SELECT b.doc_id, b.band, b.band_key
        FROM bb b JOIN ek e ON e.band = b.band AND e.band_key = b.band_key"""),
    ),

    // ----------------------------------------------------------------
    // ORC round trip with predicate + projection pushdown: the filter
    // must reach the ORC reader (plan-asserted in PlanAudit) just as it
    // does for parquet — format choice must not cost the optimizer
    // anything. Oracle = the same filter on the parquet ground truth.
    "q109_orc_scan" -> QueryDef(
      fn = (s, d) =>
        s.read.orc(stageOrc(s, d))
          .where(col("n_chars") >= 200 && col("lang") === "en")
          .select(col("doc_id"), col("source"), col("n_chars")),
      oracle = Some("""
        SELECT doc_id, source, n_chars FROM documents
        WHERE n_chars >= 200 AND lang = 'en'"""),
    )
  )
}
