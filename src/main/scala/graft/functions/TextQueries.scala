package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operator queries over the `documents` table: token
  * counting, fingerprinting, language ID, quality scoring — the
  * text-pipeline half of the training-data operators, each with a DuckDB
  * oracle mirroring the exact heuristics.
  */
object TextQueries extends QueryModule {

  import Tables._
  import TextFunctions._

  /** DuckDB fragment: normalized text `t` for `documents`. */
  private[graft] val normSql =
    "SELECT doc_id, source, lang, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents"

  private def occSql(expr: String, sub: String): String =
    s"CAST(length($expr) - length(replace($expr, '$sub', '')) AS DOUBLE) / ${sub.length}"

  // Shared oracle fragments (the SQL mirrors of langId/qualityScore),
  // used by q29/q30 and recomposed by the q59 corpus selection.
  private val paddedSql = "(' ' || t || ' ')"

  /** Fixed number of merge rounds the q194 BPE trainer runs — declared
    * before `rawQueries` (the q176 lesson: a val referenced from the
    * query map must initialize first).
    */
  private val BpeRounds = 8

  /** The q194/q197 shared BPE train loop: collapse the corpus to its
    * word-frequency table once, then BpeRounds rounds of count-pairs →
    * driver top-1 → greedy rewrite (see the q194 comment for the
    * '..'-delimited replace encoding). Returns the FINAL vocabulary
    * state (word, seq, wc) — each distinct word's trained subword
    * segmentation, which is what the apply step joins against — plus
    * the merge table.
    */
  private def bpeTrain(
      s: org.apache.spark.sql.SparkSession, d: String
  ): (org.apache.spark.sql.DataFrame, Seq[(Int, String, String, Long)]) = {
    var state = documents(s, d)
      .select(explode(split(normalizeText(col("text")), " ")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$") && length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"),
        concat(lit(".."), regexp_replace(col("word"), "(.)", "$1..")).as("seq"),
        col("wc"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to BpeRounds) {
      val top = state
        .select(col("wc"),
          filter(split(col("seq"), "\\.\\."), x => x =!= "").as("syms"))
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"BPE trainer ran dry at round $r — corpus too small for $BpeRounds merges")
      val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((r, a, b, cnt))
      state = state
        .select(col("word"),
          expr(s"replace(seq, '.$a..$b.', '.$a$b.')").as("seq"), col("wc"))
        .localCheckpoint(true)
    }
    (state, merges.toSeq)
  }

  /** The chained-CTE oracle replay of [[bpeTrain]] — s0..s{BpeRounds}
    * carry (word, seq, wc); w{r} holds round r's winning merge. Every
    * CTE MATERIALIZED (the q183 lesson: DuckDB inlines plain CTEs at
    * each reference and a K-deep chain explodes exponentially).
    */
  private val bpeOracleCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""
        p$r AS MATERIALIZED (
          SELECT syms[i] AS a, syms[i + 1] AS b, SUM(wc) AS cnt
          FROM (SELECT list_filter(string_split(seq, '..'), x -> x <> '') AS syms, wc
                FROM s${r - 1}),
               UNNEST(range(1, len(syms))) AS u(i)
          GROUP BY 1, 2),
        w$r AS MATERIALIZED (
          SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
        s$r AS MATERIALIZED (
          SELECT word, replace(seq, '.' || a || '..' || b || '.', '.' || a || b || '.') AS seq, wc
          FROM s${r - 1}, w$r)"""
    }.mkString(",")
    s"""
        WITH words AS (
          SELECT UNNEST(string_split(t, ' ')) AS word FROM ($normSql)),
        s0 AS MATERIALIZED (
          SELECT word, '..' || regexp_replace(word, '(.)', '\\1..', 'g') AS seq, wc
          FROM (SELECT word, COUNT(*) AS wc FROM words
                WHERE regexp_matches(word, '^[a-z0-9]+$$') AND length(word) >= 2
                GROUP BY word)),
        $rounds"""
  }
  private lazy val markerCntsSql = TextFunctions.langMarkers.map { case (lang, ms) =>
    lang -> s"(len(regexp_split_to_array($paddedSql, '${ms.mkString("|")}')) - 1)"
  }
  private lazy val bestCntSql =
    markerCntsSql.map(_._2).reduceLeft((a, b) => s"GREATEST($a, $b)")
  // fold in declaration order: later whens win only on earlier langs,
  // mirroring the Scala foldLeft over reversed markers
  private lazy val langCaseSql =
    markerCntsSql.reverse.foldLeft("'und'") { case (acc, (lang, c)) =>
      s"CASE WHEN $c = best_cnt AND best_cnt > 0 THEN '$lang' ELSE $acc END"
    }
  private lazy val predictedSql =
    s"CASE WHEN length(regexp_replace(t, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 " +
      s"THEN 'zh' ELSE $langCaseSql END"
  private[graft] lazy val stopsSql = TextFunctions.langMarkers
    .find(_._1 == "en").get._2
    .map(m => occSql(paddedSql, m)).mkString("(", " + ", ")")
  private[graft] lazy val qualitySql =
    s"""GREATEST(LEAST(
              (CASE WHEN length(t) BETWEEN 200 AND 4000 THEN 40
                    WHEN length(t) BETWEEN 50 AND 199 THEN 25 ELSE 10 END)
              + (CASE WHEN $stopsSql >= 3 THEN 30 WHEN $stopsSql >= 1 THEN 20 ELSE 5 END)
              + 30
              - LEAST(length(regexp_replace(t, '[^.!?,;:]', '', 'g')) * 2, 20)
              - LEAST(length(regexp_replace(t, '[^0-9]', '', 'g')), 10), 100), 0)"""
  private[graft] lazy val tokenCountSql =
    "CAST(CASE WHEN length(t) = 0 THEN 0 ELSE len(string_split(t, ' ')) END AS INTEGER)"

  // ------------------------------------------------------------------
  // The q85 BM25 scoring kernel — ONE implementation (Spark side and
  // oracle fragments), shared with q162's hybrid RRF fusion so the two
  // gates can never drift apart: a k1/b or idf change lands in both or
  // neither. The idf keeps the rational core without the log wrap
  // (libm is 1-ulp, not bit-identical cross-engine); see q85's entry
  // for the full scoring-function contract.
  private[functions] val Bm25Terms = Seq("spark", "vector", "merge")

  /** (doc_id, dl, score) for documents matching ≥1 query term: corpus
    * stats in one 1-row broadcast, scoring in one linear pass.
    */
  private[functions] def bm25Scores(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val terms = Bm25Terms
    val toks  = split(normalizeText(col("text")), " ")
    val perDoc = documents(s, d)
      .select(col("doc_id"), toks.as("w"))
      .withColumn("dl", size(col("w")))
      .select(
        (col("doc_id") +: col("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            expr(s"size(filter(w, x -> x = '$t'))").as(s"tf$i")
          }): _*
      )
    val aggCols = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
      )
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    perDoc
      .crossJoin(broadcast(stats)) // 1-row corpus stats
      .where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .withColumn("score", bm25ScoreExpr)
      .select(col("doc_id"), col("dl"), col("score"))
  }

  /** The q85 scoring expression over columns (dl, tf_i, n, sdl, df_i) —
    * ONE definition shared by the scan-and-score plan (q85) and the
    * maintained-inverted-index retrieval (q199), so the two gates score
    * with bit-identical parenthesization by construction. Term scores
    * are summed in fixed term order (i = 0, 1, 2); a term absent from a
    * doc contributes exactly +0.0 (tf = 0 ⇒ numerator 0.0), so the
    * index path — which only materializes PRESENT terms — lands on the
    * same double as q85's dense tf columns.
    */
  private[functions] def bm25ScoreExpr: org.apache.spark.sql.Column = {
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def termScore(i: Int) = {
      val tf  = col(s"tf$i").cast("double")
      val dfc = col(s"df$i").cast("double")
      val idf = (col("n").cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    }
    Bm25Terms.indices.map(termScore).reduce(_ + _)
  }

  // ------------------------------------------------------------------
  // q199 maintained-inverted-index kernel, shared with Bm25IndexSpec so
  // the spec exercises the exact production build/retrieve paths.

  /** (doc_id, w, dl) — the tokenized corpus an ingest batch slices. */
  private[graft] def bm25DocTerms(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
      .withColumn("dl", size(col("w")))

  /** One O(ingest) index maintenance step: the batch's POSITIONAL
    * postings (term, doc_id, dl, tf, positions — dl denormalized in,
    * impact-style, so retrieval never joins a doc-grain table; the
    * sorted 0-based position array is what phrase retrieval q260
    * verifies adjacency against, Lucene's positions list) appended to
    * the term-bucketed postings table, and the batch's corpus totals
    * appended as ONE additive stats row (the q176 MV pattern). tf is
    * kept alongside size(positions) so BM25 retrieval never touches
    * the arrays.
    */
  private[graft] def bm25IngestBatch(
      wh: graft.etl.Warehouse, batchDocTerms: org.apache.spark.sql.DataFrame): Unit = {
    val batch = batchDocTerms.localCheckpoint(true) // read 2x: pin once
    val postings = batch
      .select(col("doc_id"), col("dl"), posexplode(col("w")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("int").as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
    if (wh.exists("silver", "bm25_postings"))
      wh.appendBucketed(postings, "silver", "bm25_postings", Seq("term"))
    else
      wh.overwriteBucketed(postings, "silver", "bm25_postings", Seq("term"))
    val batchStats =
      batch.agg(count(lit(1)).as("n"), sum(col("dl").cast("long")).as("sdl"))
    if (wh.exists("silver", "bm25_stats")) wh.append(batchStats, "silver", "bm25_stats")
    else wh.overwrite(batchStats, "silver", "bm25_stats")
  }

  /** Execute `f` with the auto-bucketed-scan heuristic off: Spark's
    * `DisableUnnecessaryBucketedScan` rule only weighs DISTRIBUTION
    * reuse (a downstream join/agg on the bucket keys) and would drop
    * the bucket layout from a pruning-only scan — losing exactly the
    * K-of-32 bucket skip that makes index retrieval O(query-term
    * postings). The conf is read at physical planning, so the caller
    * must MATERIALIZE inside `f`, not just build the plan.
    */
  private[graft] def withBucketPruning[A](
      s: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = s.conf.get(k)
    s.conf.set(k, "false")
    try f finally s.conf.set(k, prev)
  }

  /** Retrieval against the maintained state: the term filter is an isin
    * on the BUCKET column, so the scan bucket-prunes to the query
    * terms' buckets (SelectedBucketsCount K/32 — plan/execute under
    * [[withBucketPruning]]) and everything downstream — candidate set,
    * df counts, the pivoted tf columns — is sized by those posting
    * lists, never by the corpus. Corpus totals are the SUM of the
    * additive stats rows; the score is q85's shared [[bm25ScoreExpr]].
    */
  private[graft] def bm25IndexScores(
      wh: graft.etl.Warehouse): org.apache.spark.sql.DataFrame = {
    def queryPostings = wh.load("silver", "bm25_postings")
      .where(col("term").isin(Bm25Terms: _*))
    val dfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df$i")
    }
    val dfs = queryPostings.agg(dfCols.head, dfCols.tail: _*)
    val stats = wh.load("silver", "bm25_stats")
      .agg(sum(col("n")).as("n"), sum(col("sdl")).as("sdl"))
    val tfCols = max(col("dl")).as("dl") +:
      Bm25Terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0)).cast("int").as(s"tf$i")
      }
    queryPostings
      .groupBy(col("doc_id"))
      .agg(tfCols.head, tfCols.tail: _*)
      .crossJoin(broadcast(stats.crossJoin(dfs))) // 1-row stats ⨯ 1-row dfs
      .withColumn("score", bm25ScoreExpr)
      .select(col("doc_id"), col("dl"), col("score"))
  }

  /** The q260 phrase: both terms occur adjacently across the corpus at
    * every gated scale factor.
    */
  private[graft] val PhraseTerms: (String, String) = ("merge", "group")

  /** Phrase retrieval against the maintained positional index (q260):
    * prune to the TWO phrase terms' buckets, pivot each doc's two
    * position arrays side by side ((term, doc) is unique — each doc
    * lives in exactly one ingest batch), and count adjacency
    * array-side: |{p ∈ pos(t1) : p+1 ∈ pos(t2)}| via a transform +
    * intersect over the (distinct) position sets. Candidate set and
    * all downstream work are sized by the two posting lists, never
    * the corpus — the same index asymmetry as BM25 retrieval, now for
    * the query class TF bags cannot answer.
    */
  private[graft] def phraseMatches(
      wh: graft.etl.Warehouse): org.apache.spark.sql.DataFrame = {
    val (t1, t2) = PhraseTerms
    wh.load("silver", "bm25_postings")
      .where(col("term").isin(t1, t2))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"),
        first(when(col("term") === t1, col("positions")), ignoreNulls = true).as("pos1"),
        first(when(col("term") === t2, col("positions")), ignoreNulls = true).as("pos2"))
      .where(col("pos1").isNotNull && col("pos2").isNotNull)
      .withColumn("n_phrase",
        size(array_intersect(expr("transform(pos1, x -> x + 1)"), col("pos2"))))
      .where(col("n_phrase") > 0)
      .select(col("doc_id"), col("dl"), col("n_phrase"))
  }

  /** Oracle CTEs `perdoc` (doc_id, dl, tf_i) and `stats` (n, sdl, df_i). */
  private[functions] lazy val bm25OracleCtes: String = {
    val tfs = Bm25Terms.zipWithIndex
      .map { case (t, i) => s"len(list_filter(string_split(t, ' '), x -> x = '$t')) AS tf$i" }
      .mkString(", ")
    val dfs = Bm25Terms.indices
      .map(i => s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(", ")
    s"""perdoc AS (
          SELECT doc_id, CAST(len(string_split(t, ' ')) AS INTEGER) AS dl, $tfs
          FROM ($normSql)),
        stats AS (
          SELECT COUNT(*) AS n, SUM(dl) AS sdl, $dfs FROM perdoc)"""
  }

  /** The summed per-term score expression over `perdoc, stats`. */
  private[functions] lazy val bm25ScoreSql: String = {
    val avgdl = "(CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))"
    def termScore(i: Int) = {
      val tf  = s"CAST(tf$i AS DOUBLE)"
      val dfc = s"CAST(df$i AS DOUBLE)"
      val idf = s"((CAST(n AS DOUBLE) - $dfc + CAST(0.5 AS DOUBLE)) / ($dfc + CAST(0.5 AS DOUBLE)))"
      s"(($idf * ($tf * CAST(2.2 AS DOUBLE))) / " +
        s"($tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / $avgdl))))"
    }
    Bm25Terms.indices.map(termScore).mkString(" + ")
  }

  /** `tf0 > 0 OR ...` — the ≥1-term match predicate. */
  private[functions] lazy val bm25MatchSql: String =
    Bm25Terms.indices.map(i => s"tf$i > 0").mkString(" OR ")

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Token count + char stats + md5 fingerprint per document.
    "q28_text_stats" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            tokenCount(col("text")).as("n_tokens"),
            length(normalizeText(col("text"))).as("n_chars_norm"),
            fingerprint(col("text")).as("fp")
          ),
      oracle = Some(s"""
        SELECT doc_id, source,
               CAST(CASE WHEN length(t) = 0 THEN 0
                         ELSE len(string_split(t, ' ')) END AS INTEGER) AS n_tokens,
               CAST(length(t) AS INTEGER) AS n_chars_norm,
               md5(t) AS fp
        FROM ($normSql)""")
    ),

    // ----------------------------------------------------------------
    // Language ID: marker-word argmax heuristic + CJK check, counted per
    // (predicted, labeled) pair — the confusion matrix of the heuristic.
    "q29_lang_id" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        documents(s, d)
          .withColumn("predicted", langId(col("text")))
          .groupBy(col("predicted"), col("lang"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some(s"""
        SELECT predicted, lang, COUNT(*) AS n FROM (
          SELECT lang, $predictedSql AS predicted
          FROM (SELECT *, $bestCntSql AS best_cnt FROM ($normSql))
        ) GROUP BY predicted, lang""")
    ),

    // ----------------------------------------------------------------
    // Quality scoring: length/stopword/punct/digit components, averaged
    // per source bucket (the pipeline's per-shard quality report).
    "q30_text_quality" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .withColumn("q", qualityScore(col("text")))
          .groupBy(col("source"))
          .agg(
            sum(col("q").cast("long")).cast("double")./(count(lit(1))).as("avg_quality"),
            min(col("q")).as("min_quality"),
            max(col("q")).as("max_quality"),
            count(lit(1)).as("n_docs")
          ),
      oracle = Some(s"""
        SELECT source,
               CAST(SUM(CAST(q AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_quality,
               CAST(MIN(q) AS INTEGER) AS min_quality,
               CAST(MAX(q) AS INTEGER) AS max_quality,
               COUNT(*) AS n_docs
        FROM (
          SELECT source, $qualitySql AS q
          FROM ($normSql)
        ) GROUP BY source""")
    ),

    // ----------------------------------------------------------------
    // The composed training-corpus selection a data pipeline actually
    // runs before tokenization: quality floor + language filter + token
    // band + exact dedup (keep the lowest doc_id per fingerprint), then
    // per-source acceptance stats. One pass for the scoring (all four
    // scores are column functions over the same normalized text), a
    // hash-agg for the dedup winners, a LEFT SEMI join to keep them —
    // every stage linear and shuffle-bounded at 100 TB.
    "q59_corpus_select" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val scored = documents(s, d).select(
          col("doc_id"), col("source"),
          qualityScore(col("text")).as("q"),
          langId(col("text")).as("predicted"),
          tokenCount(col("text")).as("n_tokens"),
          fingerprint(col("text")).as("fp"))
        val cand = scored.where(
          col("q") >= 60 && col("predicted") === "en" &&
            col("n_tokens").between(20, 1000))
        val keep = cand.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        cand
          .join(keep, Seq("fp", "doc_id"), "left_semi")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"))
      },
      oracle = Some(s"""
        WITH scored AS (
          SELECT doc_id, source,
                 $qualitySql AS q,
                 $predictedSql AS predicted,
                 $tokenCountSql AS n_tokens,
                 md5(t) AS fp
          FROM (SELECT *, $bestCntSql AS best_cnt FROM ($normSql))),
        cand AS (
          SELECT * FROM scored
          WHERE q >= 60 AND predicted = 'en' AND n_tokens BETWEEN 20 AND 1000),
        keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM cand GROUP BY fp)
        SELECT c.source, COUNT(*) AS n_docs,
               CAST(SUM(CAST(c.n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
        FROM cand c JOIN keep k ON c.fp = k.fp AND c.doc_id = k.doc_id
        GROUP BY c.source""")
    ),

    // ----------------------------------------------------------------
    // Winnowing fingerprints (the MOSS rolling-hash scheme): base-33
    // polynomial hash over character 8-grams, minimum of each 4-wide
    // hash window, deduplicated per document. The one-pass expression
    // emits each doc's fingerprint set in place, so the only shuffle is
    // the doc-grain aggregate — the oracle replays the identical
    // arithmetic with window functions (base powers are exact BIGINT
    // multiply-adds, no modulus, so both engines agree bit-for-bit).
    // ----------------------------------------------------------------
    // BPE-ish token counting next to the whitespace count: GPT-2-style
    // pre-tokenizer chunks (letter runs / digit runs / single symbols)
    // charged ceil(len/4) subword tokens each — the estimate a corpus
    // budget planner runs before real tokenization.
    "q72_token_count_bpe" -> QueryDef(
      fn = (s, d) =>
        documents(s, d).select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens_ws"),
          size(regexp_extract_all(
            normalizeText(col("text")), lit(TextFunctions.BpeChunkPattern), lit(0)))
            .as("n_chunks"),
          tokenCountBpe(col("text")).as("n_tokens_bpe")
        ),
      oracle = Some(s"""
        SELECT doc_id,
               $tokenCountSql AS n_tokens_ws,
               CAST(len(regexp_extract_all(t, '${TextFunctions.BpeChunkPattern}'))
                 AS INTEGER) AS n_chunks,
               CAST(COALESCE(list_sum(list_transform(
                 regexp_extract_all(t, '${TextFunctions.BpeChunkPattern}'),
                 x -> (length(x) + 3) // 4)), 0) AS INTEGER) AS n_tokens_bpe
        FROM ($normSql)""")
    ),

    "q71_winnow_fingerprint" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        documents(s, d)
          .select(
            col("doc_id"),
            explode(call_function("winnow_fp", normalizeText(col("text")))).as("fp")
          )
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_fp"),
            min(col("fp")).as("min_fp"),
            max(col("fp")).as("max_fp"),
            sum(col("fp")).as("fp_sum")
          )
      },
      oracle = Some {
        val k = 8; val w = 4; val b = 33L
        val pows = (0 until k).map(j => { var p = 1L; (0 until (k - 1 - j)).foreach(_ => p *= b); p })
        val hashExpr = (0 until k)
          .map(j => s"CAST(ord(substr(s, CAST(i + $j AS INT), 1)) AS BIGINT) * ${pows(j)}")
          .mkString(" + ")
        s"""
        WITH t AS (
          SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
          FROM documents),
        pos AS (
          SELECT doc_id, s, unnest(range(1, length(s) - $k + 2)) AS i
          FROM t WHERE length(s) >= $k),
        kg AS (SELECT doc_id, i, $hashExpr AS h FROM pos),
        win AS (
          SELECT doc_id, h,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wmin,
                 COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS wn
          FROM kg),
        sel AS (SELECT DISTINCT doc_id, wmin AS fp FROM win WHERE wn = $w)
        SELECT doc_id, COUNT(*) AS n_fp, MIN(fp) AS min_fp, MAX(fp) AS max_fp,
               CAST(SUM(fp) AS BIGINT) AS fp_sum
        FROM sel GROUP BY doc_id"""
      }
    ),

    // ----------------------------------------------------------------
    // Stratified sampling: k docs per (source, lang) stratum, selected
    // by a deterministic salted-md5 order — the training-data "balanced
    // subset" operator. Hash order makes the sample unbiased w.r.t. any
    // corpus attribute yet exactly reproducible cross-engine (both sort
    // the same lowercase hex strings); the window partitions by stratum,
    // so at 100 TB this is one keyed shuffle and no stratum ever passes
    // through a single global partition. Strata smaller than k are kept
    // whole — proportional allocation is the same plan with a
    // per-stratum k joined in.
    "q84_stratified_sample" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("source"), col("lang"))
          .orderBy(md5(concat(lit("strat:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
        documents(s, d)
          .withColumn("sample_rank", row_number().over(w))
          .where(col("sample_rank") <= 3)
          .select(col("source"), col("lang"), col("doc_id"), col("sample_rank"))
      },
      oracle = Some("""
        SELECT source, lang, doc_id, CAST(rn AS INTEGER) AS sample_rank FROM (
          SELECT source, lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source, lang
                   ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
          FROM documents)
        WHERE rn <= 3""")
    ),

    // ----------------------------------------------------------------
    // Benchmark decontamination — the eval-leak filter every serious
    // pretraining pipeline runs: a training document is CONTAMINATED if
    // it shares any word-3-gram shingle with the holdout (benchmark)
    // set, and the surviving corpus drops both the holdout and the
    // contaminated docs. Holdout membership is deterministic
    // (doc_id % 97 = 0 — the eval set a harness would pin). The
    // holdout's shingle set is tiny relative to the corpus, so Catalyst
    // broadcasts it into the semi-join: one linear pass over training
    // shingles, one anti-join at doc grain — no shingle-keyed shuffle
    // of the full corpus at 100 TB. Duplicates of a held-out doc share
    // all its shingles, so near-dups of eval data are swept out too —
    // exactly the leak the operator exists to stop.
    "q110_decontaminate" -> QueryDef(
      fn = (s, d) => {
        val sh = DedupQueries.shingleDf(s, d)
        val holdoutShingles = sh
          .where(col("doc_id") % 97 === 0)
          .select(col("shingle")).distinct()
        val contaminated = sh
          .where(col("doc_id") % 97 =!= 0)
          .join(holdoutShingles, Seq("shingle"), "left_semi")
          .select(col("doc_id")).distinct()
        documents(s, d)
          .where(col("doc_id") % 97 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      },
      oracle = Some(s"""
        WITH sh AS (${DedupQueries.shingleSql}),
        cont AS (
          SELECT DISTINCT doc_id FROM sh
          WHERE doc_id % 97 <> 0
            AND shingle IN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0))
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id % 97 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM cont)"""),
    ),

    // ----------------------------------------------------------------
    // Deterministic train/val/test split: bucket = salted-md5 of the
    // doc id mod 10 → 80/10/10. A pure projection — no shuffle, no
    // state, reproducible on any cluster and STABLE UNDER CORPUS
    // GROWTH: a document's split never changes when neighbors arrive
    // or depart, which a rank-based split cannot promise. The same
    // salted-hash idiom q47/q84/q90 established; per-(source, lang)
    // proportions follow from hash uniformity.
    "q113_train_split" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .withColumn(
            "bucket",
            (conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
              .cast("long") % 10).cast("int"))
          .select(
            col("doc_id"), col("source"), col("lang"), col("bucket"),
            when(col("bucket") < 8, "train")
              .when(col("bucket") === 8, "val")
              .otherwise("test").as("split")),
      oracle = Some("""
        SELECT doc_id, source, lang, bucket,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id, source, lang,
                 CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 AS INTEGER) AS bucket
          FROM documents)"""),
    ),

    // ----------------------------------------------------------------
    // The dataset card: per-source corpus report — doc/token volume,
    // language spread, quality, and length percentiles in ONE pass of
    // one-pass expressions (every stat is a codegen'd projection into a
    // hash aggregate; the exact p50 reuses q99's rank-selection trick
    // inside the same query). This is the roll-up a data curator reads
    // before shipping a mix, and the operator every pipeline run ends
    // with.
    "q114_corpus_report" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.plans.VectorFunctions.register(s)
        val scored = documents(s, d).select(
          col("source"),
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          TextFunctions.qualityScore(col("text")).as("q"),
          langId(col("text")).as("pl"))
        val ranked = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("n_tokens").asc, col("doc_id").asc)))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        ranked.groupBy(col("source"))
          .agg(
            max(col("n")).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            countDistinct(col("pl")).as("n_langs"),
            sum(when(col("pl") === "en", 1L).otherwise(0L)).as("n_en"),
            avg(col("q").cast("double")).as("avg_quality"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("n_tokens"))).as("p50_tokens"))
      },
      oracle = Some(s"""
        SELECT source,
               MAX(n) AS n_docs,
               CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT pl) AS n_langs,
               CAST(SUM(CASE WHEN pl = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
               AVG(CAST(q AS DOUBLE)) AS avg_quality,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END) AS p50_tokens
        FROM (
          SELECT source, n_tokens, q, pl,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens ASC, doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM (
            SELECT source, doc_id, $tokenCountSql AS n_tokens,
                   CAST($qualitySql AS INTEGER) AS q,
                   $predictedSql AS pl
            FROM (SELECT *, $bestCntSql AS best_cnt FROM ($normSql))))
        GROUP BY source"""),
    ),

    // ----------------------------------------------------------------
    // Token-budget selection: the pretraining-mix operator — each
    // source contributes documents in deterministic salted-hash order
    // until its token budget fills (running total <= 5000), so the mix
    // is unbiased, reproducible, and exactly sized. One partitioned
    // cumulative-sum window per source — a single keyed shuffle; the
    // budget predicate is integer-exact.
    "q90_token_budget_mix" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("source"))
          .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))).asc, col("doc_id").asc)
        documents(s, d)
          .select(col("source"), col("doc_id"), tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum_tokens",
            sum(col("n_tokens").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .where(col("cum_tokens") <= 5000)
      },
      oracle = Some(s"""
        SELECT source, doc_id, n_tokens, cum_tokens FROM (
          SELECT source, doc_id, n_tokens,
                 CAST(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
                   ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
          FROM (SELECT source, doc_id, $tokenCountSql AS n_tokens FROM ($normSql))
        ) WHERE cum_tokens <= 5000""")
    ),

    // ----------------------------------------------------------------
    // BM25-style relevance scoring for a fixed query — the "select
    // documents about X" operator: corpus stats (N, avgdl, per-term df)
    // in ONE 1-row aggregate broadcast to a single scoring pass, so the
    // whole query is two linear scans regardless of corpus size. The
    // idf uses the rational core (N - df + 0.5)/(df + 0.5) WITHOUT the
    // log wrap: java.lang.Math.log and libm are only 1-ulp-accurate and
    // not guaranteed bit-identical across engines, while +,*,/ are
    // IEEE-exact — so the score is reproducible to the bit. (log is
    // monotone in the rational core, so per-term ranking is unchanged;
    // multi-term score weighting differs from textbook BM25 and is
    // documented as this engine's scoring function.) Term frequencies
    // come from one filter-HOF per term over the token array; every
    // double op is written with identical parenthesization in both
    // engines.
    "q85_bm25" -> QueryDef(
      fn = (s, d) => bm25Scores(s, d),
      oracle = Some(s"""
        WITH $bm25OracleCtes
        SELECT doc_id, dl, $bm25ScoreSql AS score
        FROM perdoc, stats
        WHERE $bm25MatchSql""")
    ),

    // ----------------------------------------------------------------
    // TEXTBOOK BM25 (q85's tolerance-gated twin): the same two-scan plan
    // but with the standard Lucene/Robertson idf, ln(1 + (N-df+0.5)/
    // (df+0.5)), so multi-term scores weight terms the way every IR
    // stack expects. ln() is where cross-engine bit-exactness ends —
    // libm implementations are 1-ulp-accurate, not bit-identical — so
    // the ROUNDING CONTRACT is part of the query: both engines round
    // the final score to 6 decimals (half-up), which absorbs a 1-ulp
    // difference everywhere except the measure-zero case of a score
    // sitting within 1 ulp of a rounding boundary. q85 remains the
    // bit-exact variant for callers that need hash-stable scores.
    "q93_bm25_log_idf" -> QueryDef(
      fn = (s, d) => {
        val terms = Seq("spark", "vector", "merge")
        val toks  = split(normalizeText(col("text")), " ")
        val perDoc = documents(s, d)
          .select(col("doc_id"), toks.as("w"))
          .withColumn("dl", size(col("w")))
          .select(
            (col("doc_id") +: col("dl") +:
              terms.zipWithIndex.map { case (t, i) =>
                expr(s"size(filter(w, x -> x = '$t'))").as(s"tf$i")
              }): _*
          )
        val aggCols = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
          )
        val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
        val avgdl = col("sdl").cast("double") / col("n").cast("double")
        def termScore(i: Int) = {
          val tf  = col(s"tf$i").cast("double")
          val dfc = col(s"df$i").cast("double")
          val idf = log(
            lit(1.0) + (col("n").cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5)))
          idf * (tf * lit(2.2)) /
            (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
        }
        perDoc
          .crossJoin(broadcast(stats)) // 1-row corpus stats
          .where(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
          .withColumn("score", round(terms.indices.map(termScore).reduce(_ + _), 6))
          .select(col("doc_id"), col("dl"), col("score"))
      },
      oracle = Some {
        val terms = Seq("spark", "vector", "merge")
        val tfs = terms.zipWithIndex
          .map { case (t, i) => s"len(list_filter(string_split(t, ' '), x -> x = '$t')) AS tf$i" }
          .mkString(", ")
        val dfs = terms.indices
          .map(i => s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
          .mkString(", ")
        val avgdl = "(CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))"
        def termScore(i: Int) = {
          val tf  = s"CAST(tf$i AS DOUBLE)"
          val dfc = s"CAST(df$i AS DOUBLE)"
          val idf = s"ln(CAST(1.0 AS DOUBLE) + " +
            s"((CAST(n AS DOUBLE) - $dfc + CAST(0.5 AS DOUBLE)) / ($dfc + CAST(0.5 AS DOUBLE))))"
          s"(($idf * ($tf * CAST(2.2 AS DOUBLE))) / " +
            s"($tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / $avgdl))))"
        }
        val score = terms.indices.map(termScore).mkString(" + ")
        s"""
        WITH perdoc AS (
          SELECT doc_id, CAST(len(string_split(t, ' ')) AS INTEGER) AS dl, $tfs
          FROM ($normSql)),
        stats AS (
          SELECT COUNT(*) AS n, SUM(dl) AS sdl, $dfs FROM perdoc)
        SELECT doc_id, dl, ROUND($score, 6) AS score
        FROM perdoc, stats
        WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0"""
      }
    ),

    // ----------------------------------------------------------------
    // PII REDACTION — the scrubbing pass every training-data pipeline
    // runs before text ships. Emails, phone numbers, and IPv4 addresses
    // are replaced by typed placeholders and counted per record; the
    // input is a synthesized support-ticket projection of `customer` so
    // the patterns demonstrably FIRE (the synthetic `documents` corpus
    // contains no PII-shaped tokens). Pure projection: zero shuffle,
    // linear, codegen'd regexes; the three regexes use only syntax with
    // identical semantics in java.util.regex and RE2 (no backrefs, no
    // lookaround), and redaction order (email, phone, IP) is fixed on
    // both sides.
    "q115_pii_redaction" -> QueryDef(
      fn = (s, d) => {
        val note = concat(
          lit("Reach "), col("c_name"), lit(" <"),
          lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com> or +1-415-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" from host 10.0."),
          (col("c_custkey") % 256).cast("string"), lit("."),
          (expr("c_custkey div 256") % 256).cast("string"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"
        val ipRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        Tables.customer(s, d)
          .select(col("c_custkey"), note.as("note"))
          .select(
            col("c_custkey"),
            regexp_replace(
              regexp_replace(
                regexp_replace(col("note"), emailRe, "[EMAIL]"),
                phoneRe, "[PHONE]"),
              ipRe, "[IP]").as("redacted"),
            regexp_count(col("note"), lit(emailRe)).as("n_email"),
            regexp_count(col("note"), lit(phoneRe)).as("n_phone"),
            regexp_count(col("note"), lit(ipRe)).as("n_ip"))
      },
      oracle = Some("""
        WITH tickets AS (
          SELECT c_custkey,
                 'Reach ' || c_name || ' <' || lower(regexp_replace(c_name, '#', '.', 'g')) ||
                 '@example.com> or +1-415-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
                 ' from host 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
                 CAST((c_custkey // 256) % 256 AS VARCHAR) AS note
          FROM customer)
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(note,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\+\d{1,2}-\d{3}-\d{4}', '[PHONE]', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted,
               CAST(len(regexp_extract_all(note, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
               CAST(len(regexp_extract_all(note, '\+\d{1,2}-\d{3}-\d{4}')) AS INTEGER) AS n_phone,
               CAST(len(regexp_extract_all(note, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ip
        FROM tickets"""),
    ),

    // ----------------------------------------------------------------
    // INVERTED INDEX build — term -> (document frequency, sorted
    // posting list). The retrieval-side dual of the BM25 scorer (q85
    // recomputes per-term stats inline; a real engine scores against
    // this index). Shape: explode to (doc, term), distinct, one hash
    // aggregate keyed by term — the partial aggregate combines map-side
    // so the shuffle carries per-(term, mapper) rows, and posting lists
    // are built where the term's rows land (never on the driver).
    // Postings serialize as a comma-joined sorted string: deterministic,
    // so the whole index is hash-comparable cross-engine.
    "q119_inverted_index" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            explode(split(normalizeText(col("text")), " ")).as("term"))
          .where(length(col("term")) >= 3)
          .distinct()
          .groupBy(col("term"))
          .agg(
            count(lit(1)).as("df"),
            concat_ws(",", sort_array(collect_set(col("doc_id")))).as("postings"))
          .where(col("df") >= 5),
      oracle = Some(s"""
        WITH terms AS (
          SELECT DISTINCT doc_id, u.term
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
               UNNEST(w) AS u(term)
          WHERE length(u.term) >= 3)
        SELECT term, COUNT(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM terms GROUP BY term HAVING COUNT(*) >= 5"""),
    ),

    // ----------------------------------------------------------------
    // BIGRAM LANGUAGE MODEL — adjacent-pair counts and conditional
    // probabilities P(w2 | w1), the n-gram statistic behind corpus
    // perplexity filters and contamination heuristics. Pair generation
    // is a zero-join array transform (struct per adjacent pair, one
    // explode); counting is one map-side-combined hash aggregate on
    // (w1, w2); the unigram denominator is a window SUM over the
    // ALREADY-REDUCED bigram table partitioned by w1 — O(distinct
    // bigrams), never a second pass over tokens. `sequence()` errors
    // when start > stop (unlike DuckDB's empty range), so one-token
    // docs are filtered before the transform.
    "q121_bigram_lm" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        documents(s, d)
          .select(split(normalizeText(col("text")), " ").as("w"))
          .where(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("g"))
          .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
          .groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("w1"))))
          .where(col("cnt") >= 3)
          .select(
            col("w1"), col("w2"), col("cnt"),
            round(col("cnt").cast("double") / col("total"), 6).as("cond_p"))
      },
      oracle = Some(s"""
        WITH grams AS (
          SELECT w[i] AS w1, w[i + 1] AS w2
          FROM (SELECT string_split(t, ' ') AS w FROM ($normSql) WHERE length(t) > 0),
               UNNEST(range(1, len(w))) AS u(i)),
        bg AS (
          SELECT w1, w2, COUNT(*) AS cnt,
                 SUM(COUNT(*)) OVER (PARTITION BY w1) AS total
          FROM grams GROUP BY w1, w2)
        SELECT w1, w2, cnt, ROUND(CAST(cnt AS DOUBLE) / total, 6) AS cond_p
        FROM bg WHERE cnt >= 3"""),
    ),

    // ----------------------------------------------------------------
    // REPETITION QUALITY FILTER — the Gopher-style within-document
    // repetition signals: top-token fraction, top-bigram fraction, and
    // distinct-token ratio, plus the boolean flag a pipeline filters
    // on. All three are per-document aggregations (keyed by doc_id, so
    // map-side combine applies and no doc's tokens cross partitions
    // twice); the token and bigram branches join doc-grain tables —
    // O(docs), not O(tokens). Fractions are computed on ROUNDED values
    // so the flag is bit-identical cross-engine.
    "q123_doc_repetition" -> QueryDef(
      fn = (s, d) => {
        val toks = documents(s, d)
          .select(col("doc_id"),
            explode(split(normalizeText(col("text")), " ")).as("tok"))
        val tokStats = toks
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("top_tok"))
        val biStats = documents(s, d)
          .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("g"))
          .groupBy(col("doc_id"), col("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as("top_bigram"))
        val ttf = round(col("top_tok").cast("double") / col("n_tokens"), 6)
        val tbf = when(col("n_tokens") > 1,
          round(coalesce(col("top_bigram"), lit(0L)).cast("double") /
            (col("n_tokens") - 1), 6)).otherwise(0.0)
        val dr = round(col("n_distinct").cast("double") / col("n_tokens"), 6)
        tokStats
          .join(biStats, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"),
            ttf.as("top_tok_frac"),
            tbf.as("top_bigram_frac"),
            dr.as("distinct_ratio"),
            (ttf > 0.1 || dr < 0.45).as("is_repetitive"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, u.tok
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
               UNNEST(w) AS u(tok)),
        tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        ts AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_tok
          FROM tc GROUP BY 1),
        bg AS (
          SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql) WHERE length(t) > 0),
               UNNEST(range(1, len(w))) AS u(i)),
        bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        bs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram FROM bc GROUP BY 1)
        SELECT ts.doc_id, n_tokens, n_distinct,
               ROUND(CAST(top_tok AS DOUBLE) / n_tokens, 6) AS top_tok_frac,
               CASE WHEN n_tokens > 1
                    THEN ROUND(CAST(COALESCE(top_bigram, 0) AS DOUBLE) / (n_tokens - 1), 6)
                    ELSE 0.0 END AS top_bigram_frac,
               ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
               (ROUND(CAST(top_tok AS DOUBLE) / n_tokens, 6) > 0.1 OR
                ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) < 0.45) AS is_repetitive
        FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id"""),
    ),

    // ----------------------------------------------------------------
    // PMI COLLOCATIONS — pointwise mutual information over adjacent
    // word pairs: ln(P(w1,w2) / (P(w1)P(w2))), the classic collocation
    // / phrase-mining statistic. The pair and unigram tables are both
    // REDUCED aggregates before any join (O(distinct bigrams) joined
    // with O(vocab), never token-grain); the two totals ride along as
    // 1-row broadcasts. ln is the one nonlinear step -> round-6
    // contract (both engines are 1-ulp libm, the q93 precedent).
    "q127_pmi_collocations" -> QueryDef(
      fn = (s, d) => {
        val w = documents(s, d)
          .select(split(normalizeText(col("text")), " ").as("w"))
        val toks = w.select(explode(col("w")).as("tok"))
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("uc"))
        val tTok = toks.agg(count(lit(1)).as("t_tok"))
        val bi = w
          .where(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("g"))
          .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
          .groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("n_pair"))
        val tBi = bi.agg(sum(col("n_pair")).as("t_bi"))
        val pJoint = col("n_pair").cast("double") / col("t_bi").cast("double")
        val pIndep =
          (col("uc1").cast("double") / col("t_tok").cast("double")) *
            (col("uc2").cast("double") / col("t_tok").cast("double"))
        bi
          .where(col("n_pair") >= 5)
          .join(uni.select(col("tok").as("w1"), col("uc").as("uc1")), Seq("w1"))
          .join(uni.select(col("tok").as("w2"), col("uc").as("uc2")), Seq("w2"))
          .crossJoin(broadcast(tTok))
          .crossJoin(broadcast(tBi))
          .select(
            col("w1"), col("w2"), col("n_pair"),
            round(log(pJoint / pIndep), 6).as("pmi"))
      },
      oracle = Some(s"""
        WITH ws AS (SELECT string_split(t, ' ') AS w FROM ($normSql)),
        toks AS (SELECT u.tok FROM ws, UNNEST(ws.w) AS u(tok)),
        uni AS (SELECT tok, COUNT(*) AS uc FROM toks GROUP BY tok),
        t_tok AS (SELECT COUNT(*) AS t_tok FROM toks),
        bi AS (
          SELECT w[i] AS w1, w[i + 1] AS w2, COUNT(*) AS n_pair
          FROM (SELECT w FROM ws WHERE len(w) >= 2), UNNEST(range(1, len(w))) AS u(i)
          GROUP BY 1, 2),
        t_bi AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS t_bi FROM bi)
        SELECT b.w1, b.w2, b.n_pair,
               ROUND(LN((CAST(b.n_pair AS DOUBLE) / CAST(t_bi AS DOUBLE)) /
                        ((CAST(u1.uc AS DOUBLE) / CAST(t_tok AS DOUBLE)) *
                         (CAST(u2.uc AS DOUBLE) / CAST(t_tok AS DOUBLE)))), 6) AS pmi
        FROM bi b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        CROSS JOIN t_tok CROSS JOIN t_bi
        WHERE b.n_pair >= 5"""),
    ),

    // ----------------------------------------------------------------
    // TF-IDF KEYWORD EXTRACTION — each document's 3 most distinctive
    // terms by tf * (ln((N+1)/(df+1)) + 1), the smoothed-idf variant.
    // tf and df are both REDUCED aggregates ((doc, term) and term
    // grain) before the join; the corpus doc count is a 1-row
    // broadcast; ranking is a doc-partitioned window over the reduced
    // (doc, term) table — O(distinct doc-terms), never token grain.
    // Ranking compares the ROUNDED score (then term asc), so the
    // round-6 ln contract also fixes the order cross-engine.
    "q128_tfidf_keywords" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = documents(s, d)
          .select(col("doc_id"),
            explode(split(normalizeText(col("text")), " ")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(df, Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf", round(
            col("tf").cast("double") *
              (log((col("n_docs").cast("double") + 1.0) /
                (col("df").cast("double") + 1.0)) + 1.0), 6))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("tfidf").desc, col("term").asc)))
          .where(col("rank") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("tfidf"), col("rank"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, u.term
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
               UNNEST(w) AS u(term)),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, tf.term, tf,
                 ROUND(CAST(tf AS DOUBLE) *
                       (LN((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0),
                       6) AS tfidf
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd)
        SELECT doc_id, term, tf, tfidf, rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
          FROM scored)
        WHERE rank <= 3"""),
    ),

    // ----------------------------------------------------------------
    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (A-Res / exponential
    // keys): each doc draws key = u^(1/w) with deterministic u from a
    // salted md5 and weight w = token count; the top-k keys ARE a
    // weighted sample without replacement (Efraimidis-Spirakis). The
    // selection is top-k by a computed column — TakeOrderedAndProject,
    // a per-partition heap + k-row merge, NEVER a global sort — which
    // is how a pipeline draws a 10M-doc sample from a 10B-doc corpus.
    // Keys are ranked ROUNDED (round-6) so the 1-ulp pow() difference
    // cannot flip the selection boundary cross-engine.
    "q137_weighted_sample" -> QueryDef(
      fn = (s, d) => {
        val u = (conv(substring(md5(concat(lit("ws:"),
          col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long").cast("double") + 1.0) / 4294967297.0
        documents(s, d)
          .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
          .where(col("n_tokens") >= 1)
          .withColumn("sample_key", round(pow(u, lit(1.0) / col("n_tokens")), 6))
          .orderBy(col("sample_key").desc, col("doc_id").asc)
          .limit(25)
      },
      oracle = Some(s"""
        WITH tk AS (
          SELECT doc_id, CAST(len(string_split(t, ' ')) AS INTEGER) AS n_tokens
          FROM ($normSql) WHERE length(t) > 0),
        k AS (
          SELECT doc_id, n_tokens,
                 ROUND(POWER(
                   (CAST(CAST(concat('0x', substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) + 1.0)
                     / 4294967297.0,
                   1.0 / n_tokens), 6) AS sample_key
          FROM tk)
        SELECT doc_id, n_tokens, sample_key FROM k
        ORDER BY sample_key DESC, doc_id ASC LIMIT 25"""),
    ),

    // ----------------------------------------------------------------
    // BPE MERGE-PAIR COUNTING — the first iteration of byte-pair-
    // encoding TOKENIZER TRAINING (Sennrich et al., ACL'16): count
    // adjacent symbol pairs across the corpus and surface the top
    // merge candidates. q72 APPLIES a BPE-ish tokenizer; this is the
    // statistic the tokenizer is trained FROM.
    //
    // The scale trick is the one real BPE trainers use: collapse the
    // corpus to its WORD FREQUENCY table first (one map-side-combined
    // hash aggregate — the only corpus-sized pass), then explode
    // character pairs over the DISTINCT vocabulary only, weighted by
    // word count. Pair counting touches |vocab|·avg_len rows instead
    // of |corpus|·avg_len — at 100 TB the vocab is millions of rows
    // while the corpus is trillions of tokens. Top-50 selection is a
    // TakeOrderedAndProject heap (never a global sort), determinized
    // by the (cnt DESC, pair ASC) tiebreak.
    "q154_bpe_merge_pairs" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .select(explode(split(normalizeText(col("text")), " ")).as("word"))
          .where(col("word") =!= "")
          .groupBy(col("word")).agg(count(lit(1)).as("wc"))
          .where(length(col("word")) >= 2)
          .select(col("wc"),
            explode(expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"))
              .as("pair"))
          .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(50),
      oracle = Some(s"""
        WITH words AS (
          SELECT UNNEST(string_split(t, ' ')) AS word FROM ($normSql)),
        wf AS (
          SELECT word, COUNT(*) AS wc FROM words WHERE word <> '' GROUP BY word),
        pairs AS (
          SELECT substr(word, i, 2) AS pair, wc
          FROM wf, UNNEST(range(1, length(word))) AS u(i)
          WHERE length(word) >= 2)
        SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair ASC LIMIT 50""")
    ),

    // ----------------------------------------------------------------
    // ITERATIVE BPE TRAINER — q154's statistic run to a FIXED-K merge
    // table (Sennrich et al., ACL'16): K rounds of count-pairs →
    // pick-top-merge → rewrite the vocabulary, the q167 BSP shape
    // (fixed driver loop, vocab-grain state localCheckpoint'd between
    // rounds so plan depth stays constant) applied to tokenizer
    // training. The corpus collapses to its word-frequency table ONCE
    // (the only corpus-sized pass — q154's scale trick); every round
    // after that touches O(vocab) rows: one map-side-combined pair
    // aggregate, a driver-side top-1 (a scalar gate, the A4 pattern),
    // and a shuffle-free symbol-sequence rewrite.
    //
    // The merge rewrite is exact greedy BPE: each word's symbol
    // sequence is encoded as a '..'-delimited string ('..a..b..c..' —
    // trainer vocabulary restricted to [a-z0-9]+ words so '.' can
    // never occur INSIDE a symbol), and replace(seq, '.a..b.', '.ab.')
    // consumes only the INNER dot of each flanking delimiter, so
    // consecutive pair occurrences share no matched character and
    // leftmost non-overlapping replace ≡ the canonical left-to-right
    // greedy merge — with identical replace semantics on both engines,
    // which is what lets the oracle replay all K rounds as chained
    // MATERIALIZED CTEs. Ties pinned (cnt DESC, a ASC, b ASC).
    "q194_bpe_trainer" -> QueryDef(
      fn = (s, d) => {
        val (_, merges) = bpeTrain(s, d)
        val spark = s
        import spark.implicits._
        merges.toDF("round", "sym_a", "sym_b", "cnt")
          .select(col("round"), col("sym_a"), col("sym_b"),
            concat(col("sym_a"), col("sym_b")).as("merged"), col("cnt"))
      },
      oracle = Some(s"""
        $bpeOracleCtes
        ${(1 to BpeRounds).map { r =>
          s"""SELECT $r AS round, a AS sym_a, b AS sym_b, a || b AS merged,
                 CAST(cnt AS BIGINT) AS cnt FROM w$r"""
        }.mkString(" UNION ALL ")}""")
    ),

    // ----------------------------------------------------------------
    // BPE TOKENIZER APPLY — the train→apply composition that closes
    // the tokenizer loop: tokenize the whole corpus under the q194
    // trained merge table and report per-document subword counts (the
    // number every mixture/packing stage budgets by). The scale trick
    // is that tokenization happens at VOCAB grain, not corpus grain:
    // the trained final state already holds each distinct word's
    // subword segmentation, so applying the tokenizer is one keyed
    // word⋈vocab join (shuffled hash/SMJ at 100 TB vocab — never a
    // per-document re-merge), and per-doc counts are one doc-grain
    // aggregate. The oracle replays the full K-round chain and the
    // same join.
    "q197_bpe_apply" -> QueryDef(
      fn = (s, d) => {
        val (vocab, _) = bpeTrain(s, d)
        val tok = vocab.select(col("word"),
          size(filter(split(col("seq"), "\\.\\."), x => x =!= "")).as("n_sub"))
        documents(s, d)
          .select(col("doc_id"), explode(split(normalizeText(col("text")), " ")).as("word"))
          .where(col("word").rlike("^[a-z0-9]+$") && length(col("word")) >= 2)
          .join(tok, "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
      },
      oracle = Some(s"""
        $bpeOracleCtes,
        tok AS MATERIALIZED (
          SELECT word, len(list_filter(string_split(seq, '..'), x -> x <> '')) AS n_sub
          FROM s$BpeRounds),
        dw AS (
          SELECT doc_id, UNNEST(string_split(t, ' ')) AS word FROM ($normSql))
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens
        FROM dw JOIN tok USING (word)
        GROUP BY doc_id""")
    ),

    // ----------------------------------------------------------------
    // LANGUAGE-MODEL PERPLEXITY FILTER — the CCNet-style quality gate
    // (Wenzek et al., LREC'20): score every document by its negative
    // log-likelihood under a corpus-trained bigram LM and flag the
    // high-NLL tail. q121 BUILDS the bigram LM; this query trains it
    // AND applies it in one plan, self-scored on the training corpus
    // so every document bigram has a nonzero probability and no
    // smoothing constant enters the contract.
    //
    // Scale shape: the corpus collapses to doc-grain bigram COUNTS
    // first (one map-side-combined aggregate — the only corpus-sized
    // pass); the LM is a (w1,w2)-grain rollup of that same table, so
    // the scoring join is keyed (w1,w2)⋈(w1,w2) — shuffled hash/SMJ,
    // never broadcast (a 100 TB corpus's bigram vocab is itself huge).
    // Per-document NLL folds in sorted (w1,w2) order (the q161/q164
    // discipline: double addition is not associative, so the fold
    // order is pinned on both engines); ln() is the only libm call
    // and ROUND(…,6) absorbs its cross-engine ulp.
    "q166_lm_perplexity" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // doc-grain bigram counts: the ONE corpus-sized pass. Persisted
        // (spill-safe) because both the LM rollup and the scoring join
        // read it — without the pin the text normalize+explode runs
        // twice over the full corpus.
        val docGrams = graft.CacheLeases.lease(
          documents(s, d)
            .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
            .where(size(col("w")) >= 2)
            .select(col("doc_id"), explode(expr(
              "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("g"))
            .groupBy(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
            .agg(count(lit(1)).as("c"))
            .persist())
        // conditional bigram LM over the same corpus: p(w2|w1) as an
        // exact integer ratio — deterministic division, order-free sums
        val lm = docGrams
          .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cnt"))
          .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("w1"))))
          .select(col("w1"), col("w2"),
            (col("cnt").cast("double") / col("tot").cast("double")).as("p"))
        val nll = -expr("aggregate(ts, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)") /
          col("n_bigrams").cast("double")
        // doc-grain (tiny): persisted so the corpus-mean aggregate and
        // the final select don't re-run the scoring join + fold twice
        val scored = graft.CacheLeases.lease(
          docGrams
            .join(lm, Seq("w1", "w2"))
            .withColumn("term", col("c").cast("double") * log(col("p")))
            .groupBy(col("doc_id"))
            .agg(
              sort_array(collect_list(struct(col("w1"), col("w2"), col("term")))).as("ts"),
              sum(col("c")).as("n_bigrams"))
            .select(col("doc_id"), col("n_bigrams"), round(nll, 6).as("nll"))
            .persist())
        // relative cut, CCNet-style: flag NLL above 105% of the corpus
        // mean. The comparison runs entirely in INTEGER micro-NLL space
        // (20·n·nllµ > 21·Σnllµ ⇔ nllµ > 1.05·mean) so the corpus fold
        // is an order-free integer sum — no double-summation pinning,
        // no collect of the doc-grain table. Headroom: nllµ ≲ 10^8,
        // ×20×10^10 docs ≈ 2·10^19… so Σ runs first (Σnllµ·21 ≲ 10^18
        // at 10^10 docs) and the per-doc side multiplies nllµ·20·n —
        // both < 2^63 up to ~4·10^9 docs per corpus partition of the
        // comparison; beyond that shard the stats by language.
        val nllu = round(col("nll") * lit(1e6)).cast("long")
        val stats = scored
          .agg(sum(nllu).as("smu"), count(lit(1)).as("nd"))
        scored
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), col("n_bigrams"), col("nll"),
            (nllu * lit(20L) * col("nd") > col("smu") * lit(21L)).as("is_flagged"))
      },
      oracle = Some(s"""
        WITH grams AS (
          SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql) WHERE length(t) > 0),
               UNNEST(range(1, len(w))) AS u(i)),
        dg AS (
          SELECT doc_id, w1, w2, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
        lm AS (
          SELECT w1, w2,
                 CAST(SUM(c) AS DOUBLE) / CAST(SUM(SUM(c)) OVER (PARTITION BY w1) AS DOUBLE) AS p
          FROM dg GROUP BY w1, w2),
        terms AS (
          SELECT dg.doc_id, dg.w1, dg.w2, CAST(dg.c AS DOUBLE) * ln(lm.p) AS term, dg.c
          FROM dg JOIN lm ON lm.w1 = dg.w1 AND lm.w2 = dg.w2),
        agg AS (
          SELECT doc_id,
                 list_sum(list_transform(list(term ORDER BY w1, w2), x -> x)) AS s,
                 CAST(SUM(c) AS BIGINT) AS n_bigrams
          FROM terms GROUP BY doc_id),
        scored AS (
          SELECT doc_id, n_bigrams,
                 ROUND(-s / n_bigrams, 6) AS nll,
                 CAST(ROUND(ROUND(-s / n_bigrams, 6) * 1e6) AS BIGINT) AS nllu
          FROM agg),
        stats AS (
          SELECT CAST(SUM(nllu) AS BIGINT) AS smu, COUNT(*) AS nd FROM scored)
        SELECT doc_id, n_bigrams, nll,
               nllu * 20 * nd > smu * 21 AS is_flagged
        FROM scored, stats""")
    ),

    // ----------------------------------------------------------------
    // HELD-OUT LM SCORING WITH STUPID BACKOFF (Brants et al., EMNLP'07)
    // — the production form of the perplexity filter q166 demonstrates
    // in-corpus: the LM trains on the TRAIN slice (doc_id % 3 != 0,
    // the q161 convention) and scores the EVAL slice, so unseen
    // bigrams are real and the backoff path matters. Unseen (w1,w2)
    // backs off to 0.4 · p_uni(w2); p_uni is add-one smoothed over the
    // train vocabulary so a fully-OOV word keeps a nonzero floor —
    // every probability is an exact integer ratio scaled by the exact
    // rational 2/5, ln is the only libm call, the per-doc fold is
    // pinned in (w1,w2) order, and ROUND(…,6) absorbs the ulp.
    //
    // Scale shape: two corpus-sized aggregates (train bigrams + train
    // unigrams, both map-side combined) and two keyed LEFT joins from
    // the eval bigrams — bigram-keyed then w2-keyed. Nothing
    // broadcasts by assumption; AQE may choose to when the train LM
    // fits.
    "q175_lm_backoff_score" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def gramsOf(df: org.apache.spark.sql.DataFrame) = df
          .where(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("g"))
          .groupBy(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
          .agg(count(lit(1)).as("c"))
        def tokenized(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
        // the tokenized train slice feeds BOTH the bigram LM and the
        // unigram table — pinned so normalize+split runs once (the
        // q166 discipline)
        val train = graft.CacheLeases.lease(
          tokenized(documents(s, d).where(col("doc_id") % 3 =!= 0)).persist())
        val lm2 = gramsOf(train)
          .groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("c2"))
          .withColumn("ctx", sum(col("c2")).over(Window.partitionBy(col("w1"))))
        val uniRaw = train
          .select(explode(col("w")).as("w2"))
          .where(col("w2") =!= "")
          .groupBy(col("w2")).agg(count(lit(1)).as("cu"))
        val uniTot = uniRaw.agg(
          sum(col("cu")).as("tt"), count(lit(1)).as("vv"))
        val p = when(col("c2").isNotNull,
          col("c2").cast("double") / col("ctx").cast("double"))
          .otherwise(lit(0.4) *
            (coalesce(col("cu"), lit(0L)) + lit(1L)).cast("double") /
            (col("tt") + col("vv")).cast("double"))
        gramsOf(tokenized(documents(s, d).where(col("doc_id") % 3 === 0)))
          .join(lm2, Seq("w1", "w2"), "left")
          .join(uniRaw, Seq("w2"), "left")
          // the 1-row totals broadcast separately: a fully-OOV w2 has
          // no uniRaw row, but its floor term still needs tt/vv
          .crossJoin(broadcast(uniTot))
          .withColumn("term", col("c").cast("double") * log(p))
          .withColumn("bo", when(col("c2").isNull, col("c")).otherwise(lit(0L)))
          .groupBy(col("doc_id"))
          .agg(
            sort_array(collect_list(struct(col("w1"), col("w2"), col("term")))).as("ts"),
            sum(col("c")).as("n_bigrams"),
            sum(col("bo")).as("n_backoff"))
          .select(col("doc_id"), col("n_bigrams"), col("n_backoff"),
            round(-expr("aggregate(ts, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)") /
              col("n_bigrams").cast("double"), 6).as("nll"))
      },
      oracle = Some(s"""
        WITH grams AS (
          SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql) WHERE length(t) > 0),
               UNNEST(range(1, len(w))) AS u(i)),
        dg AS (
          SELECT doc_id, w1, w2, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
        lm2 AS (
          SELECT w1, w2, SUM(c) AS c2, SUM(SUM(c)) OVER (PARTITION BY w1) AS ctx
          FROM dg WHERE doc_id % 3 <> 0 GROUP BY w1, w2),
        uniraw AS (
          SELECT u.w2, COUNT(*) AS cu
          FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql) WHERE length(t) > 0),
               UNNEST(w) AS u(w2)
          WHERE doc_id % 3 <> 0 AND u.w2 <> ''
          GROUP BY u.w2),
        unitot AS (SELECT SUM(cu) AS tt, COUNT(*) AS vv FROM uniraw),
        terms AS (
          SELECT dg.doc_id, dg.w1, dg.w2, dg.c,
                 CASE WHEN lm2.c2 IS NOT NULL THEN 0 ELSE dg.c END AS bo,
                 CAST(dg.c AS DOUBLE) * ln(
                   CASE WHEN lm2.c2 IS NOT NULL
                        THEN CAST(lm2.c2 AS DOUBLE) / CAST(lm2.ctx AS DOUBLE)
                        ELSE 0.4 * CAST(COALESCE(uniraw.cu, 0) + 1 AS DOUBLE)
                               / CAST(unitot.tt + unitot.vv AS DOUBLE)
                   END) AS term
          FROM dg
          LEFT JOIN lm2 ON lm2.w1 = dg.w1 AND lm2.w2 = dg.w2
          LEFT JOIN uniraw ON uniraw.w2 = dg.w2
          CROSS JOIN unitot
          WHERE dg.doc_id % 3 = 0)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(SUM(bo) AS BIGINT) AS n_backoff,
               ROUND(-list_sum(list_transform(list(term ORDER BY w1, w2), x -> x))
                 / CAST(SUM(c) AS BIGINT), 6) AS nll
        FROM terms GROUP BY doc_id""")
    ),

    // ----------------------------------------------------------------
    // MAINTAINED BM25 INVERTED INDEX — the retrieval twin of q85, and
    // the text-retrieval member of the maintained-index family (bands
    // q182, ANN postings q187, aggregate/sketch MVs q176/q177, Gram
    // q193). q85 scans and scores the WHOLE corpus per query — fine for
    // a one-off, wrong at 100 TB where queries outnumber rebuilds. Here
    // the corpus is ingested in 3 batches into a warehouse-maintained
    // inverted index:
    //   postings (term, doc_id, dl, tf)  — bucketed by term, so a query
    //     on K terms opens only the K matching buckets (bucket pruning:
    //     SelectedBucketsCount K/32 in the scan) and never touches the
    //     rest of the index; dl is denormalized into the posting row
    //     (impact-style) so retrieval needs NO doc-grain join at all.
    //   stats (n, sdl) — one row appended per ingest; the corpus-grain
    //     totals are the SUM of the rows (additive state, the q176 MV
    //     pattern), never a rescan of documents.
    // Appends are O(ingest) bucketed file adds — history is never
    // rewritten. Query cost is O(postings of the query terms): the
    // candidate set is the union of K posting lists, df_k is the length
    // of list k, and the score reuses q85's exact expression
    // (bm25ScoreExpr) over per-doc pivoted tf columns, so the gate
    // below is q85's oracle VERBATIM — the maintained index must land
    // on the scan-and-score answer to the last bit.
    "q199_maintained_bm25_index" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q199_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          val docTerms = bm25DocTerms(s, d)
          for (g <- 0 until 3)
            bm25IngestBatch(wh, docTerms.where(pmod(col("doc_id"), lit(3)) === g))
          withBucketPruning(s) {
            bm25IndexScores(wh)
              .localCheckpoint(true) // pin before the warehouse dir is deleted
          }
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      // q85's oracle verbatim: the index path must reproduce the
      // scan-and-score answer exactly
      oracle = Some(s"""
        WITH $bm25OracleCtes
        SELECT doc_id, dl, $bm25ScoreSql AS score
        FROM perdoc, stats
        WHERE $bm25MatchSql""")
    ),

    // ----------------------------------------------------------------
    // TOP-QUALITY-QUINTILE SELECTION PER SOURCE — the curation cut
    // every corpus build applies ("keep the best 20% of each source"),
    // built scale-honest: the per-source percentile comes from the
    // RankSelect full-ranking kernel ((source, score-bucket) windows +
    // broadcast offsets), so a 5-source corpus never serializes through
    // 5 sort tasks the way PERCENT_RANK OVER (PARTITION BY source)
    // would. The integer quality score is tie-heavy BY DESIGN (values
    // 0..100) — exactly the case where ties must co-bucket, which the
    // kernel guarantees; (q, doc_id) totally orders each source so the
    // row_number and the cut are deterministic. Output is the full
    // ranked census with the selection flag (rn > floor(4n/5) keeps
    // ceil(n/5) docs — the top quintile by score).
    "q262_quality_percentile_select" -> QueryDef(
      fn = (s, d) => {
        val scored = documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("q"))
        graft.operators.RankSelect
          .withGroupRanks(scored, "source", "q", tieBreak = Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("q"),
            col("__rk_rn").as("rn"), col("__rk_n").as("n"))
          .withColumn("selected", expr("rn > (4 * n) div 5"))
      },
      oracle = Some(s"""
        WITH sc AS MATERIALIZED (
          SELECT doc_id, source, CAST($qualitySql AS INTEGER) AS q
          FROM ($normSql)),
        rk AS MATERIALIZED (
          SELECT doc_id, source, q,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY q ASC, doc_id ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM sc)
        SELECT doc_id, source, q, CAST(rn AS BIGINT) AS rn,
               CAST(n AS BIGINT) AS n,
               rn > (4 * n) // 5 AS selected
        FROM rk""")
    ),

    // ----------------------------------------------------------------
    // PHRASE RETRIEVAL ON THE POSITIONAL INDEX — what the q199 postings
    // carry positions FOR: "merge group" as an exact two-term phrase.
    // Same maintained-index build (3 O(ingest) bucketed appends), then
    // retrieval opens ONLY the two phrase terms' buckets (plan-audited
    // ≤2/32 SelectedBucketsCount alongside q199's), joins the two
    // posting lists on doc_id by pivoting the position arrays side by
    // side, and verifies adjacency array-side — |{p ∈ pos(t1) : p+1 ∈
    // pos(t2)}| — with no second pass over text. The oracle recomputes
    // the phrase count from RAW tokens (positions via UNNEST(range),
    // a self-join on p+1), so the gate proves the positional index is
    // faithful to the text, not merely self-consistent.
    "q260_phrase_retrieval" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q260_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          val docTerms = bm25DocTerms(s, d)
          for (g <- 0 until 3)
            bm25IngestBatch(wh, docTerms.where(pmod(col("doc_id"), lit(3)) === g))
          withBucketPruning(s) {
            phraseMatches(wh)
              .localCheckpoint(true) // pin before the warehouse dir is deleted
          }
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      oracle = {
        val (t1, t2) = PhraseTerms
        Some(s"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
        pos AS MATERIALIZED (
          SELECT doc_id, CAST(len(w) AS INTEGER) AS dl,
                 CAST(u.i AS INT) - 1 AS p, w[CAST(u.i AS INT)] AS tk
          FROM tok, UNNEST(range(1, len(w) + 1)) AS u(i))
        SELECT a.doc_id, CAST(MAX(a.dl) AS INTEGER) AS dl,
               CAST(COUNT(*) AS INTEGER) AS n_phrase
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        WHERE a.tk = '$t1' AND b.tk = '$t2'
        GROUP BY a.doc_id""")
      }
    )
  )
}
