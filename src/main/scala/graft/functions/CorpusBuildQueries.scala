package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** The END-TO-END training-corpus build: the composition a data pipeline
  * actually ships, chaining the individually-gated stages in their
  * production order over `documents`:
  *
  *   quality floor (q30's scorer) → near-dup dedup survivors (q92's
  *   MinHash-LSH + connected components + best-quality keeper) →
  *   decontamination against the pinned eval holdout (q110's shingle
  *   semi-join) → per-source token-budget mix (q90's salted-hash
  *   cumulative window) → deterministic train/val/test split (q113's
  *   salted-hash bucket).
  *
  * The single gate matters because stage-BOUNDARY bugs live exactly
  * here: dedup must run on the quality-filtered corpus (a low-quality
  * near-dup must not outrank a clean keeper), decontamination must
  * remove near-dups of held-out docs AFTER dedup picked keepers, and
  * the budget mix must see post-decontamination token counts. The
  * oracle hashes the final selection — a deterministic final-corpus
  * fingerprint: any drift at any boundary breaks the hash match.
  *
  * Scale: every stage is the gated stage's own plan — keyed/broadcast
  * joins, aggregation-shaped keep-first, one cumulative window per
  * source — composed by doc-grain semi/anti joins. Nothing quadratic,
  * nothing single-task; the reference's closest analog is its staged
  * batch DAG (orchestration/dags/bakery_batch_etl.py:21-28), which
  * sequences jobs without any cross-stage verification.
  */
object CorpusBuildQueries extends QueryModule {

  import Tables._

  /** Stage knobs, mirrored verbatim into the oracle SQL. */
  private val QualityFloor = 55
  private val TokenBudget  = 20000L

  /** q142: fixed sequence length for the packing operator. */
  private val SeqLen = 512L

  /** The q142 packing kernel over an arbitrary
    * (source, doc_id, n_tokens) relation: documents concatenated in
    * deterministic salted-hash order per source and cut into
    * fixed-`seqLen` sequences; a straddling doc contributes to every
    * sequence it spans. Returns the (source, seq) manifest:
    * (n_docs, n_tokens, first_doc). Exposed for property testing —
    * the invariants (total-token conservation, exact fill except each
    * source's tail, contiguous doc spans) are asserted in
    * `CorpusBuildSpec` over generated data, not just the corpus.
    */
  private[graft] def packSequences(
      docs: org.apache.spark.sql.DataFrame,
      seqLen: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("source"))
      .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
    val toks = docs
      .where(col("n_tokens") > 0)
      .withColumn("cum",
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("off", col("cum") - col("n_tokens"))
    val spans = toks
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum"), col("off"),
        explode(expr(s"sequence(off div $seqLen, (cum - 1) div $seqLen)")).as("seq"))
      .withColumn("tok_in_seq",
        least(col("cum"), (col("seq") + 1) * seqLen) -
          greatest(col("off"), col("seq") * seqLen))
    spans
      .groupBy(col("source"), col("seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok_in_seq")).as("n_tokens"),
        min(struct(col("off"), col("doc_id"))).getField("doc_id").as("first_doc"))
  }

  /** The q182 classify kernel: batch docs labelled against a maintained
    * band-index relation (any (band, band_key[, doc_id]) source — a
    * bucketed warehouse table in production). Deliberately hint-free:
    * the batch side is the small one and auto-broadcasts, so the only
    * exchange is at the tiny batch doc_id grain; with broadcast
    * disabled the planner degrades to an SMJ that reuses the index
    * table's bucket layout (no exchange on the corpus-scale side) —
    * never a BNLJ. Both shapes are asserted in
    * IncrementalBandIndexSpec.
    */
  /** Batch docs sharing any LSH band key with the maintained index:
    * the corpus-scale side is STREAMED (its doc_id never read — only
    * keys), the batch side joined on (band, band_key) = the index
    * table's bucket keys, and the result collapses to the tiny batch
    * doc_id grain. The plan shapes (BHJ batch-build / bucket-layout
    * SMJ fallback) are asserted in IncrementalBandIndexSpec.
    */
  private[graft] def corpusDupDocs(
      index: org.apache.spark.sql.DataFrame,
      bBands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    index
      .select(col("band"), col("band_key"))
      .join(bBands.select(col("band"), col("band_key"), col("doc_id")),
        Seq("band", "band_key"))
      .select(col("doc_id")).distinct()

  private[graft] def classifyAgainstIndex(
      index: org.apache.spark.sql.DataFrame,
      bBands: org.apache.spark.sql.DataFrame,
      batchDocs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val crossDup = corpusDupDocs(index, bBands)
    val inBatchDup = bBands.as("a")
      .join(
        bBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("b.doc_id") < col("a.doc_id"),
        "left_semi")
      .select(col("doc_id")).distinct()
    batchDocs
      .join(crossDup.withColumn("x", lit(1)), Seq("doc_id"), "left")
      .join(inBatchDup.withColumn("w", lit(1)), Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("source"),
        when(col("x").isNotNull, "dup_of_corpus")
          .when(col("w").isNotNull, "dup_in_batch")
          .otherwise("new").as("status"))
  }

  /** Stage the arriving-batch documents (doc_id % 5 == 0) as 3
    * mtime-ordered parquet slices (by pmod(doc_id, 3)) — the arrival
    * order q202's oracle replays. See [[graft.sources.SliceStager]].
    */
  private def stageBatchDocSlices(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.sources.SliceStager.stage(
      "graft_stream_doc_slices",
      java.nio.file.Paths.get(d, "documents.parquet"),
      slices = 3,
      g => documents(s, d)
        .where(col("doc_id") % 5 === 0 && pmod(col("doc_id"), lit(3)) === g))

  /** q202's oracle: replay the 3 ordered admit rounds as chained
    * MATERIALIZED CTEs (idx0 = corpus; round g classifies slice g
    * against idx_g — dup-of-index on any shared band key, dup-in-batch
    * on a shared key with a smaller doc_id in the SAME slice — and
    * idx_{g+1} adds the admitted docs' bands), then roll the final
    * state up at band grain. MATERIALIZED is load-bearing: DuckDB
    * inlines plain CTEs at every reference and the chain is
    * self-referential 3 deep.
    */
  private lazy val streamCycleOracleSql: String = {
    val rounds = (0 until 3).map { g =>
      s"""b$g AS MATERIALIZED (
          SELECT doc_id, band, band_key FROM bands
          WHERE doc_id % 5 = 0 AND doc_id % 3 = $g),
        dup${g}c AS (
          SELECT DISTINCT b.doc_id FROM b$g b
          JOIN idx$g e ON e.band = b.band AND e.band_key = b.band_key),
        dup${g}b AS (
          SELECT DISTINCT a.doc_id FROM b$g a
          JOIN b$g c ON a.band = c.band AND a.band_key = c.band_key
                    AND c.doc_id < a.doc_id),
        adm$g AS (
          SELECT DISTINCT doc_id FROM b$g
          WHERE doc_id NOT IN (SELECT doc_id FROM dup${g}c)
            AND doc_id NOT IN (SELECT doc_id FROM dup${g}b)),
        idx${g + 1} AS MATERIALIZED (
          SELECT * FROM idx$g
          UNION ALL
          SELECT b.doc_id, b.band, b.band_key FROM b$g b
          JOIN adm$g a ON a.doc_id = b.doc_id)"""
    }.mkString(",\n        ")
    s"""
        WITH ${DedupQueries.mhBandsCtesSql},
        idx0 AS MATERIALIZED (
          SELECT doc_id, band, band_key FROM bands WHERE doc_id % 5 <> 0),
        $rounds
        SELECT band, COUNT(*) AS n_rows,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(DISTINCT band_key) AS n_keys
        FROM idx3 GROUP BY band"""
  }

  /** q290's stages over a classifier-scored doc frame (doc_id, source,
    * lang, eta): the per-source top-quintile cut through the RankSelect
    * kernel, then q140's dedup (keeper ranks on η), decontamination,
    * token-budget mix and split — shared verbatim by q290 (inline fit)
    * and q309 (staged model), so the two differ ONLY in where β comes
    * from.
    */
  /** CHUNK-GRAIN EXACT-DEDUP GATE over a (doc_id, text) relation: the
    * doc_ids whose q320-grain 32-token windows are MAJORITY duplicates
    * of windows seen in earlier documents (dup_chunks·2 > n_chunks —
    * integer compare, exact on both engines; keeper per fingerprint =
    * lowest packed (doc_id, chunk_id) BIGINT). Two documents sharing
    * half their text pass the whole-doc hash AND can slip the minhash
    * bands (a long original plus a short excerpt has low Jaccard over
    * shingles), but their shared windows fingerprint identically —
    * this is the exact-substring pass every production corpus build
    * runs between doc-grain dedup and decontamination. Cost is one
    * fingerprint aggregate: the md5 windows shuffle, text never moves.
    */
  private[graft] def chunkDupDrops(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val W = 32
    val S = 24
    val chunkKeyed = docs
      .select(col("doc_id"),
        split(TextFunctions.normalizeText(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n"), col("w"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(greatest(0, ceil((greatest(CAST(n AS DOUBLE), $W.0) - $W.0) / $S.0)) AS INT)),
             |  i -> md5(concat_ws(' ', slice(w, i * $S + 1, $W))))"""
            .stripMargin)).as(Seq("chunk_id", "chunk_md5")))
      .withColumn("ck", col("doc_id") * lit(1048576L) + col("chunk_id"))
    // keeper resolution as a window-min over the fingerprint groups
    // (round 14, guide §2.4): the original groupBy(chunk_md5) + join
    // back shuffled the SAME fingerprint frame twice AND re-computed
    // the normalize+split+md5 generator for each side (the subtree is
    // too hot to materialize for a one-shot pass). One partition-only
    // window needs ONE exchange and one compute; the dropped doc set
    // is identical — keeper = min packed (doc_id, chunk_id) per
    // fingerprint either way.
    val wMin = Window.partitionBy(col("chunk_md5"))
    chunkKeyed
      .withColumn("keep_ck", min(col("ck")).over(wMin))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("ck") =!= col("keep_ck"), 1L).otherwise(0L))
          .as("dup_chunks"))
      .where(col("dup_chunks") * 2 > col("n_chunks"))
      .select(col("doc_id"))
  }

  private def classifiedBuild(
      s: org.apache.spark.sql.SparkSession, d: String,
      eta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.VectorFunctions.register(s)
    val toks = documents(s, d).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val scored = eta.join(toks, Seq("doc_id"))
    // same fan-out cut as `deduped` below: shQ, losers and deduped all
    // re-ran the score+rank-select subtree before round 14 (n/5 narrow
    // rows, KB-scale)
    val qualityPass = graft.operators.RankSelect
      .withGroupRanks(scored, "source", "eta", tieBreak = Seq("doc_id"))
      .where(expr("__rk_rn > (4 * __rk_n) div 5"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("eta"), col("n_tokens"))
      .localCheckpoint(true)

    // stages 2-5 — q140's chain over the classifier-selected set;
    // the dedup keeper ranks on η (the model's quality) instead of
    // the rule score
    val sh  = DedupQueries.shingleDf(s, d).localCheckpoint(true)
    val shQ = sh.join(qualityPass.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val clusters = DedupQueries.connectedComponents(
      DedupQueries.minhashCandidatePairsOf(shQ)
        .select(col("ida"), col("idb")).distinct())
    val losers = clusters
      .join(qualityPass.select(col("doc_id"), col("eta")), col("id") === col("doc_id"))
      .withColumn("r",
        row_number().over(
          Window.partitionBy(col("label")).orderBy(col("eta").desc, col("doc_id").asc)))
      .where(col("r") > 1)
      .select(col("doc_id"))
    // materialize the doc-grain survivor set ONCE before it fans out
    // (round 14, guide §2.4/§3.3): the chunk gate, the anti-join and
    // the mix stage all consume `deduped`, and without the cut the
    // classifier-score + rank-select + minhash-dedup subtree re-ran
    // per consumer (the committed before-plan repeats it under 604
    // Exchanges — plans/r14/q309_corpus_build_staged_before.txt). The
    // frame is ~n/5 narrow rows (ids + scalars, never text), so the
    // checkpoint is KB-scale at any corpus size.
    val deduped = qualityPass.join(losers, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // CHUNK-GRAIN EXACT-DEDUP GATE (round 14) — q322's report consumed
    // as a drop stage between doc-grain dedup and decontamination: see
    // [[chunkDupDrops]].
    val chunkDropped = chunkDupDrops(
      documents(s, d)
        .join(deduped.select(col("doc_id")), Seq("doc_id"), "left_semi"))
    val chunkDeduped = deduped.join(chunkDropped, Seq("doc_id"), "left_anti")

    val holdoutShingles = sh
      .where(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val contaminated = shQ
      .where(col("doc_id") % 97 =!= 0)
      .join(holdoutShingles, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val clean = chunkDeduped
      .where(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")

    val w = Window
      .partitionBy(col("source"))
      .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
    val mixed = clean
      .withColumn("cum_tokens",
        sum(col("n_tokens").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("cum_tokens") <= TokenBudget)

    mixed
      .withColumn(
        "bucket",
        (conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 10).cast("int"))
      .select(
        col("doc_id"), col("source"), col("lang"),
        col("n_tokens"), col("cum_tokens"), col("bucket"),
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test").as("split"))
  }

  /** The composed-chain oracle — shared by q290 and its staged twin
    * q309 (staged-build ≡ inline-fit-build, hash-proven).
    */
  private lazy val classifiedBuildOracle: String = s"""
        WITH RECURSIVE
        ${graft.operators.ClassifierQueries.trainedEtaSql},
        ntk AS MATERIALIZED (
          SELECT doc_id, ${TextQueries.tokenCountSql} AS n_tokens
          FROM (${TextQueries.normSql})),
        csc AS MATERIALIZED (
          SELECT c.doc_id, c.source, c.lang, c.eta, n.n_tokens
          FROM ceta c JOIN ntk n ON n.doc_id = c.doc_id),
        crk AS MATERIALIZED (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY eta ASC, doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM csc),
        qpass AS MATERIALIZED (
          SELECT doc_id, source, lang, eta, n_tokens
          FROM crk WHERE rn > (4 * n) // 5),
        sh0 AS (${DedupQueries.shingleSql}),
        ${DedupQueries.mhBandsCtesSqlFrom(
          "SELECT s.doc_id, s.shingle FROM sh0 s JOIN qpass p ON p.doc_id = s.doc_id")},
        edges AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION ALL
          SELECT idb AS a, ida AS b FROM edges),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        labels AS (
          SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
        losers AS (
          SELECT doc_id FROM (
            SELECT p.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY l.label
                     ORDER BY p.eta DESC, p.doc_id ASC) AS r
            FROM labels l JOIN qpass p ON p.doc_id = l.id
          ) WHERE r > 1),
        deduped AS (
          SELECT * FROM qpass
          WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        cdocs AS MATERIALIZED (
          SELECT n.doc_id, string_split(n.t, ' ') AS w
          FROM (${TextQueries.normSql}) n
          JOIN deduped dd ON dd.doc_id = n.doc_id),
        csized AS (SELECT doc_id, w, len(w) AS n FROM cdocs),
        cchunks AS (
          SELECT doc_id,
                 unnest(range(0,
                   CAST(CEIL((GREATEST(CAST(n AS DOUBLE), 32.0) - 32.0) / 24.0) AS BIGINT) + 1)) AS chunk_id,
                 w
          FROM csized),
        chashed AS MATERIALIZED (
          SELECT doc_id, doc_id * 1048576 + chunk_id AS ck,
                 md5(list_aggregate(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32),
                   'string_agg', ' ')) AS chunk_md5
          FROM cchunks),
        ckeep AS (
          SELECT chunk_md5, MIN(ck) AS keep_ck FROM chashed GROUP BY chunk_md5),
        cdrop AS (
          SELECT doc_id FROM (
            SELECT h.doc_id, COUNT(*) AS n_chunks,
                   SUM(CASE WHEN h.ck <> k.keep_ck THEN 1 ELSE 0 END) AS dup_chunks
            FROM chashed h JOIN ckeep k ON k.chunk_md5 = h.chunk_md5
            GROUP BY h.doc_id)
          WHERE dup_chunks * 2 > n_chunks),
        cdeduped AS (
          SELECT * FROM deduped
          WHERE doc_id NOT IN (SELECT doc_id FROM cdrop)),
        holdout_sh AS (
          SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 97 = 0),
        contaminated AS (
          SELECT DISTINCT doc_id FROM sh
          WHERE doc_id % 97 <> 0
            AND shingle IN (SELECT shingle FROM holdout_sh)),
        clean AS (
          SELECT * FROM cdeduped
          WHERE doc_id % 97 <> 0
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        mixed AS (
          SELECT doc_id, source, lang, n_tokens,
                 CAST(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
                   ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM clean),
        sel AS (SELECT * FROM mixed WHERE cum_tokens <= $TokenBudget)
        SELECT doc_id, source, lang, n_tokens, cum_tokens, bucket,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT *,
                 CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 AS INTEGER) AS bucket
          FROM sel)"""

  /** The DedupQueries helpers these queries call register their
    * persisted intermediates with [[graft.CacheLeases]]; draining at
    * every entry keeps repeated invocations bounded.
    */
  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private def rawQueries: Map[String, QueryDef] = Map(
    "q140_corpus_build" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.VectorFunctions.register(s)

        // stage 1 — QUALITY: score once, carry (q, n_tokens) through the
        // whole pipeline so later stages never re-read `text`
        val scored = documents(s, d).select(
          col("doc_id"), col("source"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("q"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val qualityPass = scored.where(col("q") >= QualityFloor)

        // stage 2 — DEDUP among quality survivors: candidate pairs from
        // the banded minhash of the FILTERED shingle set, components,
        // keep the best (q DESC, doc_id ASC) per cluster. The shingle
        // explode feeds three consumers (minhash bands, the holdout
        // set, the contamination check) — checkpoint it ONCE so the
        // normalize+shingle pass over the corpus runs once, not three
        // times (a real pipeline stages shingles to a table for the
        // same reason; blocks are context-cleaned when the plan drops)
        val sh  = DedupQueries.shingleDf(s, d).localCheckpoint(true)
        val shQ = sh.join(qualityPass.select(col("doc_id")), Seq("doc_id"), "left_semi")
        val clusters = DedupQueries.connectedComponents(
          DedupQueries.minhashCandidatePairsOf(shQ)
            .select(col("ida"), col("idb")).distinct())
        val losers = clusters
          .join(qualityPass.select(col("doc_id"), col("q")), col("id") === col("doc_id"))
          .withColumn("r",
            row_number().over(
              Window.partitionBy(col("label")).orderBy(col("q").desc, col("doc_id").asc)))
          .where(col("r") > 1)
          .select(col("doc_id"))
        val deduped = qualityPass.join(losers, Seq("doc_id"), "left_anti")

        // stage 3 — DECONTAMINATE: the eval holdout (doc_id % 97 == 0,
        // pinned on the FULL corpus, not the filtered one) leaves the
        // training set, along with every surviving doc that shares any
        // shingle with it — near-dups of eval data are the leak
        val holdoutShingles = sh
          .where(col("doc_id") % 97 === 0)
          .select(col("shingle")).distinct()
        val contaminated = shQ
          .where(col("doc_id") % 97 =!= 0)
          .join(holdoutShingles, Seq("shingle"), "left_semi")
          .select(col("doc_id")).distinct()
        val clean = deduped
          .where(col("doc_id") % 97 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")

        // stage 4 — TOKEN-BUDGET MIX: deterministic salted-hash order,
        // cumulative tokens per source up to the budget
        val w = Window
          .partitionBy(col("source"))
          .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
        val mixed = clean
          .withColumn("cum_tokens",
            sum(col("n_tokens").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .where(col("cum_tokens") <= TokenBudget)

        // stage 5 — SPLIT: stable salted-hash bucket, 80/10/10
        mixed
          .withColumn(
            "bucket",
            (conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
              .cast("long") % 10).cast("int"))
          .select(
            col("doc_id"), col("source"), col("lang"),
            col("n_tokens"), col("cum_tokens"), col("bucket"),
            when(col("bucket") < 8, "train")
              .when(col("bucket") === 8, "val")
              .otherwise("test").as("split"))
      },
      oracle = Some(s"""
        WITH RECURSIVE
        norm AS (${TextQueries.normSql}),
        scored AS (
          SELECT doc_id, source, lang,
                 CAST(${TextQueries.qualitySql} AS INTEGER) AS q,
                 ${TextQueries.tokenCountSql} AS n_tokens
          FROM norm),
        qpass AS (SELECT * FROM scored WHERE q >= $QualityFloor),
        sh0 AS (${DedupQueries.shingleSql}),
        ${DedupQueries.mhBandsCtesSqlFrom(
          "SELECT s.doc_id, s.shingle FROM sh0 s JOIN qpass p ON p.doc_id = s.doc_id")},
        edges AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION ALL
          SELECT idb AS a, ida AS b FROM edges),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        labels AS (
          SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
        losers AS (
          SELECT doc_id FROM (
            SELECT p.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY l.label
                     ORDER BY p.q DESC, p.doc_id ASC) AS r
            FROM labels l JOIN qpass p ON p.doc_id = l.id
          ) WHERE r > 1),
        deduped AS (
          SELECT * FROM qpass
          WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        holdout_sh AS (
          SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 97 = 0),
        contaminated AS (
          SELECT DISTINCT doc_id FROM sh
          WHERE doc_id % 97 <> 0
            AND shingle IN (SELECT shingle FROM holdout_sh)),
        clean AS (
          SELECT * FROM deduped
          WHERE doc_id % 97 <> 0
            AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
        mixed AS (
          SELECT doc_id, source, lang, n_tokens,
                 CAST(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
                   ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM clean),
        sel AS (SELECT * FROM mixed WHERE cum_tokens <= $TokenBudget)
        SELECT doc_id, source, lang, n_tokens, cum_tokens, bucket,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT *,
                 CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 AS INTEGER) AS bucket
          FROM sel)""")
    ),

    // ----------------------------------------------------------------
    // THE CLASSIFIER-DRIVEN CORPUS BUILD — q140's end-to-end chain with
    // its rule-based quality stage replaced by the TRAINED model, the
    // production curation shape (train on a labeled slice → score the
    // corpus map-only → curate): the q263 IRLS fit on the labeled folds
    // (0-3), the corpus scored with the GATE-ROUNDED β (one projection —
    // at 100 TB the scoring pass costs a scan), and the keep set chosen
    // by the q262 per-source percentile cut (top quintile by η) instead
    // of a global score floor — per-source selection is what survives a
    // crawl whose sources drift at different rates. Downstream stages
    // are q140's verbatim: dedup among survivors (keeper = best η),
    // decontamination against the pinned holdout, token-budget mix,
    // split. The oracle replays the WHOLE composition — IRLS chain,
    // rounded-β scoring, rank cut, dedup fixpoint, budget window — so
    // any drift at any stage boundary breaks the final-corpus hash.
    // Scale: the q140 chain's shapes + 3 KB-shuffle IRLS aggregates;
    // the rank cut rides the RankSelect kernel (never a per-source
    // single-task sort).
    "q290_corpus_build_classified" -> QueryDef(
      fn = (s, d) => classifiedBuild(s, d,
        graft.operators.ClassifierQueries.trainedEta(s, d)),
      oracle = Some(classifiedBuildOracle)
    ),

    // ----------------------------------------------------------------
    // THE STAGED NIGHTLY BUILD — q290's production deployment shape:
    // the classifier is trained ONCE and staged as a warehouse model
    // table (the q291 pattern); the nightly corpus build READS the
    // staged β and runs score→cut→dedup→decontaminate→mix→split with
    // zero fit jobs in the build itself. Gated against q290's oracle
    // verbatim — staged-build ≡ inline-fit-build, hash-proven, the
    // same staging proof the apply twins carry, now for the whole
    // composed chain.
    "q309_corpus_build_staged" -> QueryDef(
      fn = (s, d) => {
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q309_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          // train once → stage the gate-rounded β
          val b = graft.operators.ClassifierQueries.trainQualityBeta(s, d)
          import s.implicits._
          wh.overwrite(
            Seq((b(0), b(1), b(2), b(3), b(4)))
              .toDF("b0", "b1", "b2", "b3", "b4"),
            "gold", "model_corpus_quality")
          // nightly build: the staged table is the ONLY model input
          val m = wh.load("gold", "model_corpus_quality").head()
          val staged = Array.tabulate(5)(i => m.getAs[Double](s"b$i"))
          classifiedBuild(s, d,
            graft.operators.ClassifierQueries.scoreEta(s, d, staged))
        } finally graft.Staging.deleteRecursively(
          java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(classifiedBuildOracle)
    ),


    // ----------------------------------------------------------------
    // SEQUENCE PACKING — the tokenizer-side operator every pretraining
    // run ends with: documents are concatenated in a deterministic
    // salted-hash order per source and cut into fixed-length training
    // sequences (L = 512 tokens); a document whose tokens straddle a
    // cut contributes to BOTH sequences. All integer arithmetic over
    // one per-source cumulative window (the q90 shape) + an
    // O(spanned-seqs) explode — a doc spans ceil(n_tokens/L)+1
    // sequences at most, so the explode is ~n_tokens/L per doc, linear
    // overall. Output is the packing manifest at (source, seq) grain:
    // how many docs feed each sequence, its token fill (exactly L
    // except each source's tail), and the first document, which is
    // what a loader needs to materialize sequence k without scanning
    // the corpus. The naive formulation is a global concat (one task);
    // this one never leaves per-source keyed windows.
    "q142_sequence_packing" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        packSequences(
          documents(s, d)
            .select(col("source"), col("doc_id"),
              TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
          SeqLen)
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT source, doc_id, CAST(${TextQueries.tokenCountSql} AS BIGINT) AS n_tokens
          FROM (${TextQueries.normSql})),
        cums AS (
          SELECT source, doc_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM toks WHERE n_tokens > 0),
        spans AS (
          SELECT source, doc_id, n_tokens, cum, cum - n_tokens AS off,
                 UNNEST(range((cum - n_tokens) // $SeqLen, (cum - 1) // $SeqLen + 1)) AS seq
          FROM cums)
        SELECT source, seq, COUNT(*) AS n_docs,
               CAST(SUM(LEAST(cum, (seq + 1) * $SeqLen) - GREATEST(off, seq * $SeqLen)) AS BIGINT) AS n_tokens,
               ARG_MIN(doc_id, off) AS first_doc
        FROM spans GROUP BY source, seq"""),
    ),

    // ----------------------------------------------------------------
    // CONTAMINATION SEVERITY REPORT — the inverse view of q110's
    // decontamination: for each held-out eval document, HOW exposed is
    // it (how many training docs share any shingle, over how many
    // distinct shingles)? q110 answers "drop these training docs";
    // this answers "can this eval doc still be trusted" — the report
    // an eval-integrity review reads. Shape: one shingle-keyed join of
    // the (small) holdout shingle set against training shingles —
    // Catalyst broadcasts the holdout side exactly as in q110 — then a
    // holdout-doc-grain aggregate; zero-leak docs are kept via a
    // left join so the report is complete.
    "q143_contamination_report" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val sh = DedupQueries.shingleDf(s, d)
        val hold  = sh.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("eval_doc"), col("shingle"))
        val train = sh.where(col("doc_id") % 97 =!= 0)
        val leaks = hold
          .join(train, Seq("shingle"))
          .groupBy(col("eval_doc"))
          .agg(
            countDistinct(col("doc_id")).as("n_leaky_train_docs"),
            countDistinct(col("shingle")).as("n_shared_shingles"))
        documents(s, d)
          .where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("eval_doc"), col("source"))
          .join(leaks, Seq("eval_doc"), "left")
          .select(
            col("eval_doc"), col("source"),
            coalesce(col("n_leaky_train_docs"), lit(0L)).as("n_leaky_train_docs"),
            coalesce(col("n_shared_shingles"), lit(0L)).as("n_shared_shingles"))
      },
      oracle = Some(s"""
        WITH sh AS (${DedupQueries.shingleSql}),
        leaks AS (
          SELECT h.doc_id AS eval_doc,
                 COUNT(DISTINCT t.doc_id) AS n_leaky_train_docs,
                 COUNT(DISTINCT h.shingle) AS n_shared_shingles
          FROM (SELECT * FROM sh WHERE doc_id % 97 = 0) h
          JOIN (SELECT * FROM sh WHERE doc_id % 97 <> 0) t ON t.shingle = h.shingle
          GROUP BY h.doc_id)
        SELECT d.doc_id AS eval_doc, d.source,
               COALESCE(l.n_leaky_train_docs, 0) AS n_leaky_train_docs,
               COALESCE(l.n_shared_shingles, 0) AS n_shared_shingles
        FROM documents d
        LEFT JOIN leaks l ON l.eval_doc = d.doc_id
        WHERE d.doc_id % 97 = 0"""),
    ),

    // ----------------------------------------------------------------
    // INCREMENTAL DEDUP — the operator a GROWING corpus actually runs:
    // a new crawl batch (doc_id % 5 == 0 here) is near-dup-checked
    // against the EXISTING corpus without re-deduping the corpus
    // itself. Asymmetric by construction: the existing side only
    // contributes its banded-minhash KEYS (at 100 TB that band table
    // is a maintained index, appended batch-over-batch — never the
    // pair graph, never a corpus rescan), and the batch joins it
    // band-keyed. Classification per batch doc:
    //   dup_of_corpus — shares any LSH band key with an existing doc;
    //   dup_in_batch  — else shares a band key with a LOWER-id batch
    //                   doc (the deterministic first-wins rule at
    //                   batch grain — no fixpoint needed, unlike the
    //                   full-corpus q92 clustering);
    //   new           — neither.
    // Both checks are semi-join-shaped on (band, band_key): linear,
    // keyed, and the batch side is the small one — the join every
    // incremental ingest can afford nightly.
    "q144_incremental_dedup" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val bands = DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
        val isBatch = col("doc_id") % 5 === 0
        val bBands = bands.where(isBatch)
        val eKeys = bands.where(!isBatch)
          .select(col("band"), col("band_key")).distinct()
        val crossDup = bBands
          .join(eKeys, Seq("band", "band_key"), "left_semi")
          .select(col("doc_id")).distinct()
        val inBatchDup = bBands.as("a")
          .join(
            bBands.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_key") === col("b.band_key") &&
              col("b.doc_id") < col("a.doc_id"),
            "left_semi")
          .select(col("doc_id")).distinct()
        documents(s, d)
          .where(isBatch)
          .select(col("doc_id"), col("source"))
          .join(crossDup.withColumn("x", lit(1)), Seq("doc_id"), "left")
          .join(inBatchDup.withColumn("w", lit(1)), Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("source"),
            when(col("x").isNotNull, "dup_of_corpus")
              .when(col("w").isNotNull, "dup_in_batch")
              .otherwise("new").as("status"))
      },
      oracle = Some(s"""
        WITH ${DedupQueries.mhBandsCtesSql},
        bb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
        cross_dup AS (
          SELECT DISTINCT b.doc_id FROM bb b
          JOIN (SELECT DISTINCT band, band_key FROM bands WHERE doc_id % 5 <> 0) e
            ON e.band = b.band AND e.band_key = b.band_key),
        in_batch AS (
          SELECT DISTINCT a.doc_id FROM bb a
          JOIN bb b ON a.band = b.band AND a.band_key = b.band_key
                   AND b.doc_id < a.doc_id)
        SELECT d.doc_id, d.source,
               CASE WHEN c.doc_id IS NOT NULL THEN 'dup_of_corpus'
                    WHEN i.doc_id IS NOT NULL THEN 'dup_in_batch'
                    ELSE 'new' END AS status
        FROM documents d
        LEFT JOIN cross_dup c ON c.doc_id = d.doc_id
        LEFT JOIN in_batch i ON i.doc_id = d.doc_id
        WHERE d.doc_id % 5 = 0"""),
    ),

    // ----------------------------------------------------------------
    // MAINTAINED BAND INDEX — q144's production form. q144 argues the
    // 100 TB story ("the band table is a maintained index, appended
    // batch-over-batch") but recomputes the corpus band set every run;
    // here the index IS a warehouse table: three simulated historical
    // ingests are APPENDED to a bucketed parquet table (hash-bucketed
    // on the join keys (band, band_key) — history is never rewritten,
    // each append is O(ingest)), and the new batch is classified by
    // joining THAT table. Classification semantics are q144's exactly,
    // so the gate is the same oracle — result drift between the
    // recompute path and the index path breaks the hash match. The
    // classify join streams the big index and broadcasts the small
    // batch (the only exchange is at the tiny batch doc_id grain); if
    // the batch ever outgrows broadcast, the bucketed table's layout
    // makes the fallback an SMJ with NO exchange on the index side —
    // both shapes are plan-asserted in IncrementalBandIndexSpec.
    "q182_band_index_incremental" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q182_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          val bands = DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
          val isBatch = col("doc_id") % 5 === 0
          // 3 historical ingests build the index incrementally; only
          // the first write creates the table, the rest append
          for (g <- 0 until 3) {
            val ingest = bands.where(!isBatch && pmod(col("doc_id"), lit(3)) === g)
            if (wh.exists("silver", "band_index"))
              wh.appendBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
            else
              wh.overwriteBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
          }
          val index = wh.load("silver", "band_index")
          val bBands = bands.where(isBatch)
          classifyAgainstIndex(
            index, bBands,
            documents(s, d).where(isBatch).select(col("doc_id"), col("source")))
            .localCheckpoint(true)
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      // q144's oracle verbatim: the maintained-index path must land on
      // exactly the recompute path's answer
      oracle = Some(s"""
        WITH ${DedupQueries.mhBandsCtesSql},
        bb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
        cross_dup AS (
          SELECT DISTINCT b.doc_id FROM bb b
          JOIN (SELECT DISTINCT band, band_key FROM bands WHERE doc_id % 5 <> 0) e
            ON e.band = b.band AND e.band_key = b.band_key),
        in_batch AS (
          SELECT DISTINCT a.doc_id FROM bb a
          JOIN bb b ON a.band = b.band AND a.band_key = b.band_key
                   AND b.doc_id < a.doc_id)
        SELECT d.doc_id, d.source,
               CASE WHEN c.doc_id IS NOT NULL THEN 'dup_of_corpus'
                    WHEN i.doc_id IS NOT NULL THEN 'dup_in_batch'
                    ELSE 'new' END AS status
        FROM documents d
        LEFT JOIN cross_dup c ON c.doc_id = d.doc_id
        LEFT JOIN in_batch i ON i.doc_id = d.doc_id
        WHERE d.doc_id % 5 = 0"""),
    ),

    // ----------------------------------------------------------------
    // THE COMPLETE NIGHTLY INDEX CYCLE — q182 plus the write-back step
    // a real ingest finishes with: classify the batch against the
    // maintained band index, then APPEND the keeper docs' (status
    // 'new') bands into the same bucketed table, so tomorrow's batch
    // dedups against today's accepted docs without any rebuild.
    // Dup docs' bands deliberately never enter the index (they'd only
    // duplicate existing keys and grow it with rejected content). The
    // gate is the UPDATED index state at band grain — rows, distinct
    // docs, distinct keys — recomputed by the oracle from corpus ∪
    // new-keepers, so an append that drops, duplicates, or misroutes
    // rows breaks the hash match.
    "q189_band_index_update" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q189_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          val bands = DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
          val isBatch = col("doc_id") % 5 === 0
          for (g <- 0 until 3) {
            val ingest = bands.where(!isBatch && pmod(col("doc_id"), lit(3)) === g)
            if (wh.exists("silver", "band_index"))
              wh.appendBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
            else
              wh.overwriteBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
          }
          // batch bands are read twice (classify + write-back): pin once
          val bBands = bands.where(isBatch).localCheckpoint(true)
          val classified = classifyAgainstIndex(
            wh.load("silver", "band_index"), bBands,
            documents(s, d).where(isBatch).select(col("doc_id"), col("source")))
          // keepers' plan reads band_index (classify <- wh.load), the very
          // table the next statement appends to; pin it eagerly so the
          // append never executes a read of its own target mid-write.
          val keepers = classified.where(col("status") === "new")
            .select(col("doc_id")).localCheckpoint(true)
          wh.appendBucketed(
            bBands.join(broadcast(keepers), "doc_id")
              .select(col("doc_id"), col("band"), col("band_key")),
            "silver", "band_index", Seq("band", "band_key"))
          wh.load("silver", "band_index")
            .groupBy(col("band"))
            .agg(
              count(lit(1)).as("n_rows"),
              countDistinct(col("doc_id")).as("n_docs"),
              countDistinct(col("band_key")).as("n_keys"))
            .localCheckpoint(true)
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      oracle = Some(s"""
        WITH ${DedupQueries.mhBandsCtesSql},
        bb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
        corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
        cross_dup AS (
          SELECT DISTINCT b.doc_id FROM bb b
          JOIN (SELECT DISTINCT band, band_key FROM corpus) e
            ON e.band = b.band AND e.band_key = b.band_key),
        in_batch AS (
          SELECT DISTINCT a.doc_id FROM bb a
          JOIN bb b ON a.band = b.band AND a.band_key = b.band_key
                   AND b.doc_id < a.doc_id),
        new_docs AS (
          SELECT d.doc_id FROM documents d
          LEFT JOIN cross_dup c ON c.doc_id = d.doc_id
          LEFT JOIN in_batch i ON i.doc_id = d.doc_id
          WHERE d.doc_id % 5 = 0 AND c.doc_id IS NULL AND i.doc_id IS NULL),
        final AS (
          SELECT doc_id, band, band_key FROM corpus
          UNION ALL
          SELECT b.doc_id, b.band, b.band_key FROM bb b
          JOIN new_docs n ON n.doc_id = b.doc_id)
        SELECT band, COUNT(*) AS n_rows,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(DISTINCT band_key) AS n_keys
        FROM final GROUP BY band"""),
    ),

    // ----------------------------------------------------------------
    // INDEX UNLEARNING — the GDPR-erasure story (q132 tables, q217
    // model state) applied to the MAINTAINED BAND INDEX: when docs
    // must be forgotten, their band rows leave the bucketed index and
    // every later classify behaves as if the docs never existed. The
    // honest cost accounting: bucketing is by (band, band_key), so an
    // erased doc's rows scatter across every bucket and deletion pays
    // ONE O(index) bucketed rewrite — the same cost class as
    // compaction, amortized in production by tombstoning erased ids in
    // the classify's anti-join until the next scheduled rewrite. The
    // gate proves rewrite ≡ rebuild-from-survivors at band grain,
    // which is the compliance claim (no residual of the erased docs in
    // any band).
    "q220_index_unlearning" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q220_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          wh.overwriteBucketed(
            DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
              .select(col("doc_id"), col("band"), col("band_key")),
            "silver", "band_index_ul", Seq("band", "band_key"))
          // pin survivors BEFORE overwriting the table they read from
          // (the q189 lesson)
          val survivors = wh.load("silver", "band_index_ul")
            .where(pmod(col("doc_id"), lit(31)) =!= 0)
            .localCheckpoint(true)
          wh.overwriteBucketed(survivors, "silver", "band_index_ul",
            Seq("band", "band_key"))
          wh.load("silver", "band_index_ul")
            .groupBy(col("band"))
            .agg(
              count(lit(1)).as("n_rows"),
              countDistinct(col("doc_id")).as("n_docs"),
              countDistinct(col("band_key")).as("n_keys"))
            .localCheckpoint(true)
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      oracle = Some(s"""
        WITH ${DedupQueries.mhBandsCtesSql}
        SELECT band, COUNT(*) AS n_rows,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(DISTINCT band_key) AS n_keys
        FROM bands WHERE doc_id % 31 <> 0 GROUP BY band"""),
    ),

    // ----------------------------------------------------------------
    // STREAMING INDEX MAINTENANCE — q189's nightly cycle made
    // CONTINUOUS: arriving documents stream in as real micro-batches
    // (a file source over 3 mtime-ordered slice files,
    // maxFilesPerTrigger=1), and each micro-batch runs the full
    // maintenance cycle inside foreachBatch — band the batch, classify
    // it against the CURRENT index state, append only the keepers'
    // ('new') bands back into the bucketed table. Batch 1 therefore
    // dedups against batch 0's admissions with no nightly wait — the
    // cross-batch semantics q189 can only deliver next day. Arrival
    // order is pinned (slice mtimes strictly increase, oldest-first
    // replay), so the oracle can replay the same 3 admit rounds as
    // chained MATERIALIZED CTEs; the gate is the FINAL index state at
    // band grain, which breaks if any round admits a doc the
    // sequential semantics reject (or vice versa). Scale: per batch,
    // one banded pass over the BATCH + the keyed classify join + an
    // O(admitted) bucketed append — the index is never rebuilt, never
    // rescanned corpus-side, and history files are never rewritten.
    "q202_stream_index_maintenance" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files.createTempDirectory("graft_q202_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            // day-0 corpus index (its incremental build is q182's gate)
            wh.overwriteBucketed(
              DedupQueries.mhBandsOf(DedupQueries.shingleDf(s, d))
                .where(col("doc_id") % 5 =!= 0)
                .select(col("doc_id"), col("band"), col("band_key")),
              "silver", "band_index", Seq("band", "band_key"))
            val docSchema = documents(s, d).schema
            val stream = s.readStream
              .schema(docSchema)
              .option("maxFilesPerTrigger", "1")
              .parquet(stageBatchDocSlices(s, d))
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                  // bands read 3x (classify x2 + write-back) AND the
                  // append targets the table classify reads — pin both
                  // eagerly (the q189 lesson)
                  val bBands = DedupQueries
                    .mhBandsOf(DedupQueries.shingleDfOf(batch.toDF()))
                    .localCheckpoint(true)
                  val keepers = classifyAgainstIndex(
                    wh.load("silver", "band_index"), bBands,
                    batch.toDF().select(col("doc_id"), col("source")))
                    .where(col("status") === "new")
                    .select(col("doc_id")).localCheckpoint(true)
                  wh.appendBucketed(
                    bBands.join(broadcast(keepers), Seq("doc_id"))
                      .select(col("doc_id"), col("band"), col("band_key")),
                    "silver", "band_index", Seq("band", "band_key"))
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            wh.load("silver", "band_index")
              .groupBy(col("band"))
              .agg(
                count(lit(1)).as("n_rows"),
                countDistinct(col("doc_id")).as("n_docs"),
                countDistinct(col("band_key")).as("n_keys"))
              .localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some(streamCycleOracleSql),
    ),

    // ----------------------------------------------------------------
    // CURRICULUM PHASES — curriculum-learning's data-side operator:
    // rank each source's documents by quality (best first, doc_id
    // tiebreak) and cut into 4 equal phases with NTILE; training
    // consumes phase 1 first. The ranking window partitions by source
    // — per-source sequential by the operator's own semantics (a
    // curriculum IS a per-source ordering), parallel across sources,
    // the accepted q90 shape. Output is the per-(source, phase)
    // manifest a scheduler reads: doc/token volume and the phase's
    // quality band.
    "q150_curriculum_phases" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.VectorFunctions.register(s)
        val w = Window.partitionBy(col("source"))
          .orderBy(col("q").desc, col("doc_id").asc)
        documents(s, d)
          .select(col("source"), col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("q"),
            TextFunctions.tokenCount(col("text")).as("n_tokens"))
          .withColumn("phase", ntile(4).over(w))
          .groupBy(col("source"), col("phase"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            min(col("q")).as("min_q"),
            max(col("q")).as("max_q"))
      },
      oracle = Some(s"""
        SELECT source, phase, COUNT(*) AS n_docs,
               CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
               CAST(MIN(q) AS INTEGER) AS min_q,
               CAST(MAX(q) AS INTEGER) AS max_q
        FROM (
          SELECT source, doc_id, q, n_tokens,
                 CAST(NTILE(4) OVER (PARTITION BY source
                   ORDER BY q DESC, doc_id ASC) AS INTEGER) AS phase
          FROM (
            SELECT source, doc_id,
                   CAST(${TextQueries.qualitySql} AS INTEGER) AS q,
                   ${TextQueries.tokenCountSql} AS n_tokens
            FROM (${TextQueries.normSql})))
        GROUP BY source, phase"""),
    ),

    // ----------------------------------------------------------------
    // VOCABULARY COVERAGE CURVE — the tokenizer-design question "how
    // much of the corpus do the top-k tokens cover?": global token
    // counts (one doc-grain-combined hash aggregate), top-100 by
    // frequency through a TakeOrderedAndProject heap (q137's shape —
    // never a global sort of the vocab), then the cumulative coverage
    // share against the broadcast 1-row corpus total. The only
    // unpartitioned window runs over the ALREADY-SELECTED 100 rows —
    // bounded by construction, like q106's ≤24-row day reconciliation.
    "q151_vocab_coverage" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.VectorFunctions.register(s)
        val tokens = documents(s, d)
          .select(explode(split(TextFunctions.normalizeText(col("text")), " ")).as("token"))
          .where(col("token") =!= "")
          .groupBy(col("token"))
          .agg(count(lit(1)).as("cnt"))
        val total = tokens.agg(sum(col("cnt")).as("total_cnt"))
        val top = tokens
          .orderBy(col("cnt").desc, col("token").asc)
          .limit(100)
        top
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
          .withColumn("cum_cnt",
            sum(col("cnt")).over(Window.orderBy(col("cnt").desc, col("token").asc)
              .rowsBetween(Window.unboundedPreceding, 0)))
          .crossJoin(broadcast(total))
          .select(
            col("rank"), col("token"), col("cnt"),
            (col("cum_cnt").cast("double") / col("total_cnt").cast("double"))
              .as("cum_share"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT UNNEST(string_split(t, ' ')) AS token FROM (${TextQueries.normSql})),
        counts AS (
          SELECT token, COUNT(*) AS cnt FROM toks WHERE token <> '' GROUP BY token),
        total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_cnt FROM counts),
        top AS (
          SELECT token, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank,
                 CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
          FROM counts ORDER BY cnt DESC, token ASC LIMIT 100)
        SELECT rank, token, CAST(cnt AS BIGINT) AS cnt,
               CAST(cum_cnt AS DOUBLE) / CAST(total_cnt AS DOUBLE) AS cum_share
        FROM top, total"""),
    ),

    // ----------------------------------------------------------------
    // EPOCH-SHUFFLE SHARD MANIFEST — the data-loader's reshuffle: each
    // training epoch must visit the corpus in a fresh pseudo-random
    // order, sharded across workers, and REPRODUCIBLY (resume from a
    // checkpoint = same order). Deterministic salted hashing gives all
    // three: shard = md5(epoch, doc) mod N_SHARDS, within-shard
    // position = the same hash — no RNG state, no global sort, and a
    // doc's epoch-k placement never changes as the corpus grows around
    // it (the q113 stability argument). Output is the (epoch, shard)
    // manifest a loader coordinator reads: volume per shard plus the
    // first doc (min (hash, doc_id) — doc_id breaks 48-bit-hash
    // collisions identically on both engines) so any worker can seek
    // its shard start.
    // Shape: a 2-row epoch explode, a pure projection for the hash,
    // one keyed aggregate — shuffle O(epochs x shards), map-side
    // combined; the corpus is never sorted.
    "q160_epoch_shuffle" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val nShards = 8
        documents(s, d)
          .select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
          .select(col("doc_id"), col("n_tokens"), explode(array(lit(0), lit(1))).as("epoch"))
          .withColumn("h",
            conv(substring(md5(concat(lit("epoch:"), col("epoch").cast("string"),
              lit(":"), col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long"))
          .withColumn("shard", (col("h") % nShards).cast("int"))
          .groupBy(col("epoch"), col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            min(struct(col("h"), col("doc_id"))).getField("doc_id").as("first_doc"))
      },
      oracle = Some(s"""
        WITH docs AS (
          SELECT doc_id, CAST(${TextQueries.tokenCountSql} AS BIGINT) AS n_tokens
          FROM (${TextQueries.normSql})),
        exploded AS (
          SELECT doc_id, n_tokens, epoch,
                 CAST('0x' || substr(md5('epoch:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
          FROM docs, UNNEST([0, 1]) AS u(epoch))
        SELECT CAST(epoch AS INTEGER) AS epoch, CAST(h % 8 AS INTEGER) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               (MIN({'h': h, 'd': doc_id})).d AS first_doc
        FROM exploded GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // SCORE-DISTRIBUTION DRIFT — the monitoring gate between two corpus
    // snapshots: has the quality-score distribution of the incoming
    // slice (doc_id % 3 = 0 here) drifted from the established corpus?
    // Chi-square over the 6 fixed quality buckets floor(q/20) ∈ 0..5
    // (q caps at exactly 100), per source — chosen over
    // PSI/KL deliberately: PSI needs log(), which is 1-ulp across
    // libms, while the chi-square statistic is pure rational arithmetic
    // and stays bit-identical cross-engine (the q85 BM25 discipline).
    // Expected counts scale the reference distribution to the observed
    // slice's size. Output: per-source statistic + the bucket count it
    // summed over — a scheduler alerts on chi2 > threshold.
    // Shape: two bucket-grain aggregates + a bucket-keyed join (both
    // sides O(sources x 5 buckets)) — the corpus collapses in the
    // first map-side-combined pass; nothing downstream is corpus-sized.
    "q161_score_drift" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        // integer floor-division for the bucket on BOTH engines: a
        // double division + int cast would round in DuckDB (half-away)
        // but truncate in Spark — q = 50 would land in different buckets
        val scored = documents(s, d)
          .select(col("doc_id"), col("source"),
            floor(TextFunctions.qualityScore(col("text")) / 20).cast("int").as("bucket"),
            (col("doc_id") % 3 === 0).as("is_new"))
        val ref = scored.where(!col("is_new"))
          .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("ref_n"))
        val neu = scored.where(col("is_new"))
          .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("new_n"))
        val refTot = ref.groupBy(col("source")).agg(sum(col("ref_n")).as("ref_tot"))
        val newTot = neu.groupBy(col("source")).agg(sum(col("new_n")).as("new_tot"))
        // full bucket grid per source (ref-present buckets), expected
        // count scaled to the observed slice; buckets absent from the
        // reference are excluded by contract (expected = 0 undefined)
        ref
          .join(neu, Seq("source", "bucket"), "left")
          .join(refTot, Seq("source"))
          .join(newTot, Seq("source"))
          .withColumn("expected",
            col("ref_n").cast("double") * col("new_tot").cast("double") / col("ref_tot").cast("double"))
          .withColumn("term", {
            val diff = coalesce(col("new_n"), lit(0L)).cast("double") - col("expected")
            diff * diff / col("expected")
          })
          // bucket-ORDERED sequential fold, not sum(): a hash
          // aggregate's partial-merge order is partition-dependent and
          // double addition is not associative — the ulp drift would
          // break the cross-engine hash (the vec_dot discipline)
          .groupBy(col("source"))
          .agg(
            sort_array(collect_list(struct(col("bucket"), col("term")))).as("ts"),
            count(lit(1)).as("n_buckets"))
          .select(col("source"),
            expr("aggregate(ts, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)").as("chi2"),
            col("n_buckets"))
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT doc_id, source,
                 CAST(CAST(${TextQueries.qualitySql} AS INTEGER) // 20 AS INTEGER) AS bucket,
                 doc_id % 3 = 0 AS is_new
          FROM (${TextQueries.normSql})),
        ref AS (
          SELECT source, bucket, COUNT(*) AS ref_n FROM scored WHERE NOT is_new
          GROUP BY source, bucket),
        neu AS (
          SELECT source, bucket, COUNT(*) AS new_n FROM scored WHERE is_new
          GROUP BY source, bucket),
        rt AS (SELECT source, SUM(ref_n) AS ref_tot FROM ref GROUP BY source),
        nt AS (SELECT source, SUM(new_n) AS new_tot FROM neu GROUP BY source),
        terms AS (
          SELECT r.source, r.bucket,
                 (CAST(COALESCE(n.new_n, 0) AS DOUBLE) - CAST(r.ref_n AS DOUBLE) * CAST(nt.new_tot AS DOUBLE) / CAST(rt.ref_tot AS DOUBLE))
                   * (CAST(COALESCE(n.new_n, 0) AS DOUBLE) - CAST(r.ref_n AS DOUBLE) * CAST(nt.new_tot AS DOUBLE) / CAST(rt.ref_tot AS DOUBLE))
                   / (CAST(r.ref_n AS DOUBLE) * CAST(nt.new_tot AS DOUBLE) / CAST(rt.ref_tot AS DOUBLE)) AS term
          FROM ref r
          LEFT JOIN neu n ON n.source = r.source AND n.bucket = r.bucket
          JOIN rt ON rt.source = r.source
          JOIN nt ON nt.source = r.source)
        SELECT source,
               list_sum(list_transform(list(term ORDER BY bucket), x -> x)) AS chi2,
               COUNT(*) AS n_buckets
        FROM terms GROUP BY source""")
    ),

    // ----------------------------------------------------------------
    // TEMPERATURE-SAMPLED LANGUAGE QUOTAS — the multilingual balancing
    // step (mC4 / XLM-R style α-sampling, Conneau et al. 2020): raw
    // language shares p_l are flattened to p_l^α / Σ p_l^α with
    // α = 0.5 so low-resource languages are upsampled, then a fixed
    // token budget is allocated by LARGEST-REMAINDER rounding so the
    // integer quotas sum to the budget EXACTLY (floor everything,
    // hand the leftover tokens to the largest fractional parts,
    // lang-asc tiebreak). α = 0.5 keeps the whole computation
    // IEEE-exact cross-engine: p^0.5 is sqrt (correctly rounded by
    // IEEE-754, unlike pow/log), and both the p_l fold and the
    // Σ sqrt fold run in explicit lang order so double summation
    // order cannot drift (the q161 discipline).
    //
    // Shape: the corpus collapses in one lang-grain aggregate; all
    // arithmetic after is over #langs rows with two bounded windows.
    "q164_language_sampling" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.VectorFunctions.register(s)
        val Budget = 100000L
        val byLang = documents(s, d)
          .select(col("lang"), TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
          .groupBy(col("lang")).agg(sum(col("nt")).as("n_tokens"))
        val totals = byLang
          .agg(
            sum(col("n_tokens")).as("total_tokens"), // integer sum: order-free
            expr("aggregate(sort_array(collect_list(struct(lang, n_tokens))), CAST(0 AS DOUBLE)," +
              " (acc, x) -> acc + sqrt(CAST(x.n_tokens AS DOUBLE)))").as("sum_w"))
        // w_l = sqrt(n_l); share = w_l / Σ w — dividing sqrt(n_l) by
        // Σ sqrt(n) is algebraically p^α/Σp^α with the total factored
        // out: sqrt(n/T)/Σsqrt(n_i/T) = sqrt(n)/Σsqrt(n_i), and the
        // factored form skips a division that would cost extra ulps
        val quoted = byLang
          .crossJoin(broadcast(totals))
          .withColumn("share", sqrt(col("n_tokens").cast("double")) / col("sum_w"))
          .withColumn("quota", col("share") * lit(Budget.toDouble))
          .withColumn("base", floor(col("quota")).cast("long"))
          .withColumn("frac", col("quota") - col("base").cast("double"))
        val wSum  = Window.partitionBy(lit(1))
        val wRank = Window.orderBy(col("frac").desc, col("lang").asc)
        quoted
          .withColumn("leftover", lit(Budget) - sum(col("base")).over(wSum))
          .withColumn("r", row_number().over(wRank))
          .select(
            col("lang"), col("n_tokens"), col("share"),
            (col("base") + when(col("r") <= col("leftover"), 1L).otherwise(0L))
              .as("quota_tokens"))
      },
      oracle = Some(s"""
        WITH bylang AS (
          SELECT lang, CAST(SUM(CAST(${TextQueries.tokenCountSql} AS BIGINT)) AS BIGINT) AS n_tokens
          FROM (${TextQueries.normSql}) GROUP BY lang),
        totals AS (
          SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 list_sum(list_transform(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang), x -> x)) AS sum_w
          FROM bylang),
        quoted AS (
          SELECT lang, n_tokens,
                 sqrt(CAST(n_tokens AS DOUBLE)) / sum_w AS share,
                 sqrt(CAST(n_tokens AS DOUBLE)) / sum_w * CAST(100000 AS DOUBLE) AS quota
          FROM bylang, totals),
        based AS (
          SELECT lang, n_tokens, share,
                 CAST(FLOOR(quota) AS BIGINT) AS base,
                 quota - CAST(FLOOR(quota) AS BIGINT) AS frac
          FROM quoted),
        ranked AS (
          SELECT *,
                 CAST(ROW_NUMBER() OVER (ORDER BY frac DESC, lang ASC) AS INTEGER) AS r,
                 CAST(100000 - SUM(base) OVER () AS BIGINT) AS leftover
          FROM based)
        SELECT lang, n_tokens, share,
               CAST(base + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota_tokens
        FROM ranked""")
    ),

    // ----------------------------------------------------------------
    // TEMPERATURE SAMPLING, REALIZED PER DOCUMENT — q164 computes the
    // τ-weighted QUOTAS (w_s = n_s^τ, τ = 1/2 because sqrt is
    // IEEE-exact cross-engine where pow is libm-1-ulp); this operator
    // actually DRAWS the corpus: each source gets an acceptance rate
    // r_s = min(1, quota_s / tokens_s) and each document a
    // deterministic 48-bit salted hash, accepted iff h < r_s·2^48 —
    // the standard down-weight-the-head-domain mix every LLM corpus
    // build runs (upsampling past r = 1 is epoch repetition, q160's
    // job, not this one's). Deterministic end to end: integer token
    // sums, one sorted O(#sources) weight fold, double arithmetic in
    // a pinned operation order, md5 thresholds — so the ROW-GRAIN
    // accept/reject decisions themselves are the hash-matched gate.
    // Scale: one corpus scan for token counts, a source-grain
    // broadcast of the rates, one map-side accept projection — no
    // row-grain shuffle beyond the (source) aggregate.
    "q318_temperature_sample" -> QueryDef(
      fn = (s, d) => {
        val Budget = 60000L
        val docs = graft.CacheLeases.lease(
          documents(s, d)
            .select(col("doc_id"), col("source"),
              TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
            .persist())
        val bySrc = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("tok"))
        val totals = bySrc.agg(
          expr("aggregate(sort_array(collect_list(struct(source, tok))), CAST(0 AS DOUBLE)," +
            " (acc, x) -> acc + sqrt(CAST(x.tok AS DOUBLE)))").as("sum_w"))
        val rates = bySrc.crossJoin(broadcast(totals))
          .withColumn("share", sqrt(col("tok").cast("double")) / col("sum_w"))
          .withColumn("rate",
            least(lit(1.0),
              col("share") * lit(Budget.toDouble) / col("tok").cast("double")))
          .select(col("source"), col("rate"))
        docs.join(broadcast(rates), "source")
          .withColumn("h",
            conv(substring(md5(concat(lit("ts:"), col("doc_id").cast("string"))), 1, 12),
              16, 10).cast("long"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            (col("h").cast("double") < col("rate") * lit(281474976710656.0))
              .as("accepted"))
      },
      oracle = Some(s"""
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(${TextQueries.tokenCountSql} AS BIGINT) AS n_tokens
          FROM (${TextQueries.normSql})),
        bysrc AS (
          SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
          FROM docs GROUP BY source),
        totals AS (
          SELECT list_sum(list_transform(
                   list(sqrt(CAST(tok AS DOUBLE)) ORDER BY source), x -> x)) AS sum_w
          FROM bysrc),
        rates AS (
          SELECT source,
                 LEAST(1.0, sqrt(CAST(tok AS DOUBLE)) / sum_w
                   * 60000.0 / CAST(tok AS DOUBLE)) AS rate
          FROM bysrc, totals)
        SELECT d.doc_id, d.source, d.n_tokens,
               CAST(CAST('0x' || substr(md5('ts:' || CAST(d.doc_id AS VARCHAR)), 1, 12)
                 AS BIGINT) AS DOUBLE) < r.rate * 281474976710656.0 AS accepted
        FROM docs d JOIN rates r ON r.source = d.source""")
    ),

    // ----------------------------------------------------------------
    // OVERLAPPING WINDOW CHUNKING — the third member of the sequence-
    // shaping family (q142 PACKS short docs into fixed budgets, q157
    // cuts content-defined chunks; this cuts the FIXED-STRIDE
    // OVERLAPPING windows RAG indexing and long-doc pretraining use):
    // window = 32 tokens, stride = 24, so consecutive chunks share an
    // 8-token overlap and no token is ever dropped (the last window is
    // short rather than skipped; a doc shorter than one window is one
    // chunk). Output is chunk-grain with an md5 content fingerprint —
    // the downstream chunk-dedup join key — so the gate pins the exact
    // window boundaries, not just counts. Scale: one generate-shaped
    // projection per doc (chunk count = ⌈max(1, n−overlap) / stride⌉,
    // linear in tokens), zero shuffles beyond the scan.
    "q320_overlap_chunking" -> QueryDef(
      fn = (s, d) => {
        val W = 32
        val S = 24
        documents(s, d)
          .select(col("doc_id"),
            split(TextFunctions.normalizeText(col("text")), " ").as("w"))
          .select(col("doc_id"), col("w"), size(col("w")).as("n"))
          .select(col("doc_id"), col("n"),
            posexplode(expr(
              s"""transform(
                 |  sequence(0, CAST(greatest(0, ceil((greatest(CAST(n AS DOUBLE), $W.0) - $W.0) / $S.0)) AS INT)),
                 |  i -> struct(
                 |    i * $S AS start_tok,
                 |    size(slice(w, i * $S + 1, $W)) AS n_tokens,
                 |    md5(concat_ws(' ', slice(w, i * $S + 1, $W))) AS chunk_md5))"""
                .stripMargin)).as(Seq("chunk_id", "c")))
          .select(col("doc_id"), col("chunk_id"),
            col("c.start_tok").as("start_tok"),
            col("c.n_tokens").as("n_tokens"),
            col("c.chunk_md5").as("chunk_md5"))
      },
      oracle = Some(s"""
        WITH docs AS (
          SELECT doc_id, string_split(t, ' ') AS w
          FROM (${TextQueries.normSql})),
        sized AS (SELECT doc_id, w, len(w) AS n FROM docs),
        chunks AS (
          SELECT doc_id, n, w,
                 unnest(range(0,
                   CAST(CEIL((GREATEST(CAST(n AS DOUBLE), 32.0) - 32.0) / 24.0) AS BIGINT) + 1)) AS chunk_id
          FROM sized)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(chunk_id * 24 AS INTEGER) AS start_tok,
               CAST(len(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS INTEGER) AS n_tokens,
               md5(list_aggregate(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32), 'string_agg', ' ')) AS chunk_md5
        FROM chunks""")
    ),

    // ----------------------------------------------------------------
    // CHUNK-GRAIN CROSS-DOCUMENT DEDUP — q320's windows pushed through
    // the exact-dedup grain: a chunk is a duplicate when the SAME
    // 32-token window (by content fingerprint) appears in an EARLIER
    // document (or earlier in the same one) — the window-level overlap
    // doc-grain exact dedup (q31) structurally misses (two docs sharing
    // half their text hash differently as wholes) and span mining
    // (q153) reports but doesn't score. Output is the per-document
    // CONTAMINATION REPORT a curation pipeline gates on: chunk counts,
    // duplicated-chunk counts, and the duplicate fraction that feeds a
    // keep/drop threshold. Keeper-per-fingerprint = lowest (doc_id,
    // chunk_id) — one (md5)-keyed aggregate, map-side combined; at
    // 100 TB this is the exact-substring pass every corpus build runs
    // (fingerprints shuffle, text never does).
    "q322_chunk_dedup_report" -> QueryDef(
      fn = (s, d) => {
        val W = 32
        val S = 24
        val chunks = graft.CacheLeases.lease(
          documents(s, d)
            .select(col("doc_id"),
              split(TextFunctions.normalizeText(col("text")), " ").as("w"))
            .select(col("doc_id"), size(col("w")).as("n"), col("w"))
            .select(col("doc_id"),
              posexplode(expr(
                s"""transform(
                   |  sequence(0, CAST(greatest(0, ceil((greatest(CAST(n AS DOUBLE), $W.0) - $W.0) / $S.0)) AS INT)),
                   |  i -> md5(concat_ws(' ', slice(w, i * $S + 1, $W))))"""
                  .stripMargin)).as(Seq("chunk_id", "chunk_md5")))
            .persist())
        // keeper = lowest (doc_id, chunk_id), packed into one BIGINT
        // (chunk_id < 2^20 at any document length) so the argmin is a
        // plain integer MIN on both engines
        val keyed = chunks.withColumn("ck",
          col("doc_id") * lit(1048576L) + col("chunk_id"))
        val keepers = keyed
          .groupBy(col("chunk_md5"))
          .agg(min(col("ck")).as("keep_ck"))
        keyed.join(keepers, "chunk_md5")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("ck") =!= col("keep_ck"), 1L).otherwise(0L))
              .as("dup_chunks"))
          .withColumn("dup_fraction",
            col("dup_chunks").cast("double") / col("n_chunks").cast("double"))
      },
      oracle = Some(s"""
        WITH docs AS (
          SELECT doc_id, string_split(t, ' ') AS w
          FROM (${TextQueries.normSql})),
        sized AS (SELECT doc_id, w, len(w) AS n FROM docs),
        chunks AS (
          SELECT doc_id,
                 unnest(range(0,
                   CAST(CEIL((GREATEST(CAST(n AS DOUBLE), 32.0) - 32.0) / 24.0) AS BIGINT) + 1)) AS chunk_id,
                 w
          FROM sized),
        hashed AS (
          SELECT doc_id, doc_id * 1048576 + chunk_id AS ck,
                 md5(list_aggregate(list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + 32),
                   'string_agg', ' ')) AS chunk_md5
          FROM chunks),
        keepers AS (
          SELECT chunk_md5, CAST(MIN(ck) AS BIGINT) AS keep_ck
          FROM hashed GROUP BY chunk_md5)
        SELECT h.doc_id, COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN h.ck <> k.keep_ck THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
               CAST(SUM(CASE WHEN h.ck <> k.keep_ck THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS dup_fraction
        FROM hashed h JOIN keepers k ON k.chunk_md5 = h.chunk_md5
        GROUP BY h.doc_id""")
    )
  )
}
