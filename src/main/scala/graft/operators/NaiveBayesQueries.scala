package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTINOMIAL NAIVE BAYES over document tokens — the bag-of-words
  * counterpart to the IRLS logistic classifier (q263-q265): where the
  * logistic model scores four bounded ratio FEATURES, Naive Bayes
  * scores the TOKENS themselves, which is the classifier a corpus
  * pipeline reaches for when the quality signal lives in vocabulary
  * ("click here", "lorem", boilerplate markers) rather than in summary
  * statistics. Reference scope: bakery-big-data has no model engine;
  * this is training-data-pipeline extension surface alongside q263.
  *
  * Scale contract: FIT is one explode + one (token, class)-grain
  * aggregate — map-side combined, shuffle O(vocab), never O(corpus) —
  * plus a vocab-grain rollup for the class totals (the q128 TF-IDF
  * shape). APPLY is one doc-token aggregate joined to the vocab-grain
  * model (token-keyed shuffled join at corpus scale — a 100 TB corpus's
  * vocab is itself large, so nothing broadcasts by assumption) and a
  * per-doc fold over ≤|vocab| terms. No windows, no driver state beyond
  * the 4 class constants.
  *
  * Determinism contract (the q166 LM discipline): every probability is
  * one `ln` of an EXACT integer rational — counts are BIGINT, the
  * products (c+1)·(N+V) stay far under 2^53 so the double division is
  * a single IEEE-exact op and `ln` is the only libm call, 1 ulp
  * cross-engine. Per-document folds run in sorted token order on both
  * engines and ROUND(…,6) absorbs the ulp; the hard decision compares
  * the ROUNDED score (identical cross-engine by the hash gate itself)
  * against zero.
  */
object NaiveBayesQueries extends QueryModule {

  import Tables._

  /** Label threshold on [[TextFunctions.qualityScore]] — same rule-gate
    * bootstrap as the logistic classifier (q263).
    */
  private val LabelCut = 80

  /** Holdout fold: doc_id % 5 == 4 (the q265 convention). */
  private val Fold = 5

  /** Minimum document frequency (and minimum absence count) for χ². */
  private val MinDf = 20

  // ------------------------------------------------------------------
  // Shared frames

  /** (doc_id, y): the rule-gate class label at document grain. */
  private def docClass(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      when(TextFunctions.qualityScore(col("text")) >= LabelCut, 1L)
        .otherwise(0L).as("y"))

  /** (doc_id, y, token, c): per-document token counts — the ONE
    * corpus-sized explode, collapsed to (doc, token) grain immediately
    * (map-side combined). The label and the token array are computed in
    * a SEPARATE select below the explode (the q166 two-stage shape):
    * with both in one select, Catalyst's ExtractGenerator puts the
    * non-generator expressions in a Project ABOVE the Generate and the
    * quality-score regexes re-run PER TOKEN instead of per document —
    * measured 16.7 s → 1.3 s at sf0.1 for the q273 fit.
    */
  private def docTokens(s: SparkSession, d: String): DataFrame =
    docTokensOf(documents(s, d))

  /** [[docTokens]] over an arbitrary documents-shaped frame — the seam
    * the streaming maintenance twin (q294) feeds micro-batches through.
    */
  private def docTokensOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        when(TextFunctions.qualityScore(col("text")) >= LabelCut, 1L)
          .otherwise(0L).as("y"),
        split(TextFunctions.normalizeText(col("text")), " ").as("ws"))
      .select(col("doc_id"), col("y"), explode(col("ws")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("y"), col("token"))
      .agg(count(lit(1)).as("c"))

  /** SQL mirrors (CTEs `dc` / `dt`) over [[TextQueries.normSql]]. */
  private lazy val docClassSql =
    s"""dc AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN (${TextQueries.qualitySql}) >= $LabelCut
                      THEN 1 ELSE 0 END AS y
          FROM (${TextQueries.normSql}))"""
  private lazy val docTokensSql =
    s"""dtoks AS MATERIALIZED (
          SELECT doc_id, y, token, CAST(COUNT(*) AS BIGINT) AS c
          FROM (
            SELECT doc_id,
                   CASE WHEN (${TextQueries.qualitySql}) >= $LabelCut
                        THEN 1 ELSE 0 END AS y,
                   UNNEST(string_split(t, ' ')) AS token
            FROM (${TextQueries.normSql}))
          WHERE token <> ''
          GROUP BY doc_id, y, token)"""

  /** Token-grain model from a (doc_id, y, token, c) slice: per-token
    * class counts c0/c1 — one aggregate, shuffle O(vocab).
    */
  private def tokenCounts(dt: DataFrame): DataFrame =
    dt.groupBy(col("token"))
      .agg(
        sum(when(col("y") === 0L, col("c")).otherwise(0L)).as("c0"),
        sum(when(col("y") === 1L, col("c")).otherwise(0L)).as("c1"))

  private def tokenCountsSql(src: String) =
    s"""tc AS MATERIALIZED (
          SELECT token,
                 CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS c1
          FROM $src GROUP BY token)"""

  /** Class totals + vocab size from the token-grain model: N0, N1 (total
    * token mass per class) and V (distinct tokens) — a 1-row frame that
    * broadcasts into every downstream projection.
    */
  private def classTotals(tc: DataFrame): DataFrame =
    tc.agg(
      sum(col("c0")).as("n0"),
      sum(col("c1")).as("n1"),
      count(lit(1)).as("v"))

  private val classTotalsSql =
    """ct AS MATERIALIZED (
          SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM tc)"""

  /** Laplace-smoothed log-likelihood ratio for one token:
    * ln( ((c1+1)·(N0+V)) / ((c0+1)·(N1+V)) ) — ONE ln of an exact
    * integer rational (both products < 2^53 at any gated scale), so the
    * only cross-engine noise is the final ulp.
    */
  private def llrCol: org.apache.spark.sql.Column =
    log(((col("c1") + lit(1L)) * (col("n0") + col("v"))).cast("double") /
      ((col("c0") + lit(1L)) * (col("n1") + col("v"))).cast("double"))

  private val llrSql =
    "ln(CAST((c1 + 1) * (n0 + v) AS DOUBLE) / CAST((c0 + 1) * (n1 + v) AS DOUBLE))"

  /** Fold-4 NB scores under the folds-0-3 token model: (doc_id, actual,
    * n_toks, nb_score) — the q274/q275 core, shared with the q280
    * model comparison.
    */
  private def nbScored(
      s: SparkSession, d: String, salted: Boolean = false): DataFrame = {
    val dt = graft.CacheLeases.lease(docTokens(s, d).persist())
    val tc = graft.CacheLeases.lease(
      tokenCounts(dt.where(col("doc_id") % Fold =!= Fold - 1)).persist())
    val consts = classTotals(tc)
    val priors = docClass(s, d).where(col("doc_id") % Fold =!= Fold - 1)
      .agg(
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("d0"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("d1"))
    val lm = tc.crossJoin(broadcast(consts))
      .select(col("token"), llrCol.as("llr"))
    val evalToks = dt.where(col("doc_id") % Fold === Fold - 1)
    // the ONE corpus-scale token-keyed join: plain by default; the q299
    // twin routes it through the salted kernel (q43) because token keys
    // are Zipf-heavy at real-corpus scale — "the" owns a posting list
    // millions long, and one hash partition would hold it all
    val joined =
      if (salted) SkewJoin.saltedJoin(evalToks, lm, Seq("token"),
        buckets = 8, joinType = "left")
      else evalToks.join(lm, Seq("token"), "left")
    val sums = joined
      .crossJoin(broadcast(consts.select(
        log((col("n0") + col("v")).cast("double") /
          (col("n1") + col("v")).cast("double")).as("llr_u"))))
      .select(col("doc_id"), col("token"), col("c"),
        (col("c").cast("double") * coalesce(col("llr"), col("llr_u"))).as("term"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_toks"),
        sort_array(collect_list(struct(col("token"), col("term")))).as("tl"))
      .select(col("doc_id"), col("n_toks"),
        expr("aggregate(tl, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)").as("ts"))
    docClass(s, d).where(col("doc_id") % Fold === Fold - 1)
      .join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(priors.select(
        log(col("d1").cast("double") / col("d0").cast("double")).as("prior"))))
      .select(col("doc_id"), col("y").cast("int").as("actual"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        round(col("prior") + coalesce(col("ts"), lit(0.0)), 6).as("nb_score"))
  }

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // FIT — the trained token model: per-token class occurrence counts
    // and the smoothed log-likelihood ratio each occurrence contributes
    // to the good-vs-bad decision. At 100 TB: one map-side-combined
    // explode-aggregate (shuffle O(vocab)), one vocab-grain rollup,
    // one broadcast of 3 integers — no windows, no driver state.
    "q273_nb_fit" -> QueryDef(
      fn = (s, d) => {
        val tc = graft.CacheLeases.lease(tokenCounts(docTokens(s, d)).persist())
        tc.crossJoin(broadcast(classTotals(tc)))
          .select(col("token"), col("c0"), col("c1"),
            round(llrCol, 6).as("llr"))
      },
      oracle = fitOracle
    ),

    // ----------------------------------------------------------------
    // MAINTAINED NB MODEL — the q176/q236 MV-merge pattern applied to
    // the token classifier: (token, class) counts are ADDITIVE state,
    // so a corpus ingested in four chronological batches merges each
    // batch's counts into the stored model table (re-aggregate of
    // O(vocab) rows, never a corpus re-scan) and the final smoothed
    // model is gated against the SAME oracle as the one-shot q273 fit
    // — maintained ≡ recompute, hash-proven. At 100 TB a nightly
    // refresh pays O(ingest) + O(vocab), never O(history).
    "q288_nb_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q288_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          for (b <- 0 until 4) {
            val batch = tokenCounts(docTokens(s, d).where(col("doc_id") % 4 === b))
            val merged =
              if (wh.exists("gold", "mv_nb_counts"))
                wh.load("gold", "mv_nb_counts").unionByName(batch)
                  .groupBy(col("token"))
                  .agg(sum(col("c0")).as("c0"), sum(col("c1")).as("c1"))
              else batch
            wh.overwrite(merged, "gold", "mv_nb_counts")
          }
          val tc = graft.CacheLeases.lease(
            wh.load("gold", "mv_nb_counts")
              .select(col("token"),
                col("c0").cast("long").as("c0"), col("c1").cast("long").as("c1"))
              .persist())
          tc.crossJoin(broadcast(classTotals(tc)))
            .select(col("token"), col("c0"), col("c1"),
              round(llrCol, 6).as("llr"))
            .localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = fitOracle
    ),

    // ----------------------------------------------------------------
    // STREAMING NB MAINTENANCE — q288's batch merges run as a real
    // Structured Streaming pipeline (the q231/q216/q212 foreachBatch
    // discipline), completing the maintenance symmetry matrix: the last
    // state class (NB token counts) now has batch-maintained AND
    // streaming twins. Documents arrive as 3 mtime-ordered micro-batch
    // slices; each batch explodes ONLY its own rows, aggregates its own
    // (token, class) count partials — shuffle O(batch vocab) — and
    // merges them into the stored model table by addition. Additive
    // state needs no arrival order, so streamed ≡ batch-merged ≡
    // one-shot: gated against the SAME q273 fit oracle.
    "q294_nb_stream_maintenance" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot =
            java.nio.file.Files.createTempDirectory("graft_q294_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            val staged = graft.sources.SliceStager.stage(
              "graft_stream_nb_slices",
              java.nio.file.Paths.get(d, "documents.parquet"),
              slices = 3,
              g => documents(s, d).where(pmod(col("doc_id"), lit(3)) === g))
            val stream = s.readStream
              .schema(documents(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(staged)
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                 _: Long) =>
                  val bm = tokenCounts(docTokensOf(batch.toDF()))
                  val merged =
                    if (wh.exists("gold", "mv_stream_nb_counts"))
                      wh.load("gold", "mv_stream_nb_counts").unionByName(bm)
                        .groupBy(col("token"))
                        .agg(sum(col("c0")).as("c0"), sum(col("c1")).as("c1"))
                    else bm
                  wh.overwrite(merged, "gold", "mv_stream_nb_counts")
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            val tc = graft.CacheLeases.lease(
              wh.load("gold", "mv_stream_nb_counts")
                .select(col("token"),
                  col("c0").cast("long").as("c0"),
                  col("c1").cast("long").as("c1"))
                .persist())
            tc.crossJoin(broadcast(classTotals(tc)))
              .select(col("token"), col("c0"), col("c1"),
                round(llrCol, 6).as("llr"))
              .localCheckpoint(true)
          } finally graft.Staging.deleteRecursively(
            java.nio.file.Paths.get(whRoot))
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = fitOracle
    ),

    // ----------------------------------------------------------------
    // APPLY — train on folds 0-3, score the unseen fold 4: per-doc
    // score = ln(D1/D0) + Σ_tokens c · llr(token), with UNSEEN tokens
    // (absent from the train vocab) contributing the smoothing constant
    // ln((N0+V)/(N1+V)) per occurrence (the Laplace numerators cancel
    // to 1). The per-doc fold runs in sorted token order on both
    // engines (the q166 pinning); token-less documents score the bare
    // prior. Decision: rounded score > 0.
    "q274_nb_apply" -> QueryDef(
      fn = (s, d) =>
        nbScored(s, d).withColumn("predicted_good", col("nb_score") > lit(0.0)),
      oracle = Some(applySql +
        """
        SELECT doc_id, actual, n_toks, nb_score, nb_score > 0.0 AS predicted_good
        FROM scored""")
    ),

    // ----------------------------------------------------------------
    // SALTED-JOIN APPLY — q274 with its vocab-keyed join routed through
    // the salted kernel (SkewJoin, gated standalone by q43): real
    // corpora have Zipf token frequencies, so the plain token-hash join
    // sends every occurrence of a head token ("the") to ONE task — the
    // classic power-law straggler at 100 TB. Salting splits the eval
    // side across 8 buckets and replicates only the O(vocab) model side
    // (each model row ×8 — cheap; the corpus side is never replicated).
    // The salt is uniformity-only (monotonic-id hash), so row
    // multiplicity — and therefore the score — is EXACTLY q274's: gated
    // against q274's oracle verbatim. Measured skew behavior (1×/10×
    // head-token mass) in tools/SkewTrend + docs/corpus.md.
    "q299_nb_apply_salted" -> QueryDef(
      fn = (s, d) =>
        nbScored(s, d, salted = true)
          .withColumn("predicted_good", col("nb_score") > lit(0.0)),
      oracle = Some(applySql +
        """
        SELECT doc_id, actual, n_toks, nb_score, nb_score > 0.0 AS predicted_good
        FROM scored""")
    ),

    // ----------------------------------------------------------------
    // CONFUSION MATRIX — the holdout evaluation at decision grain: one
    // row per (actual, predicted) cell. Pure integer counts over the
    // q274 chain; the production readout a curation pipeline alerts on
    // (false-good rate = junk leaking into the corpus).
    "q275_nb_confusion" -> QueryDef(
      fn = (s, d) => {
        val scored = rawQueries("q274_nb_apply").fn(s, d)
        scored.groupBy(col("actual"), col("predicted_good"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some(applySql +
        """
        SELECT actual, nb_score > 0.0 AS predicted_good,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM scored GROUP BY 1, 2""")
    ),

    // ----------------------------------------------------------------
    // OOV RATE — vocabulary coverage of the train slice on the holdout,
    // per language: the first diagnostic a tokenizer/model owner reads
    // before trusting any token-level score (an OOV-heavy language is
    // being scored by the smoothing constant, not the model). Pure
    // integer counts and one exact division — no libm at all. Scale:
    // one explode aggregate per slice + a token-keyed LEFT join
    // (shuffled at corpus scale, the q274 argument), then a ≤|langs|
    // rollup.
    "q279_oov_rate" -> QueryDef(
      fn = (s, d) => {
        // read twice (train vocab + eval slice): lease the exploded
        // frame so the corpus explode runs once (round-11 advice)
        val toks = graft.CacheLeases.lease(documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(TextFunctions.normalizeText(col("text")), " ")).as("token"))
          .where(col("token") =!= "")
          .persist())
        val vocab = toks.where(col("doc_id") % Fold =!= Fold - 1)
          .select(col("token")).distinct()
          .withColumn("seen", lit(1))
        toks.where(col("doc_id") % Fold === Fold - 1)
          .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("c"))
          .join(vocab, Seq("token"), "left")
          .groupBy(col("lang"))
          .agg(
            sum(col("c")).as("n_toks"),
            sum(when(col("seen").isNull, col("c")).otherwise(0L)).as("n_oov"))
          .select(col("lang"), col("n_toks"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_toks").cast("double"), 6)
              .as("oov_rate"))
      },
      oracle = Some(s"""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, lang, UNNEST(string_split(t, ' ')) AS token
          FROM (${TextQueries.normSql})),
        tk AS MATERIALIZED (SELECT * FROM toks WHERE token <> ''),
        vocab AS MATERIALIZED (
          SELECT DISTINCT token FROM tk WHERE doc_id % $Fold <> ${Fold - 1}),
        ev AS MATERIALIZED (
          SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
          FROM tk WHERE doc_id % $Fold = ${Fold - 1}
          GROUP BY lang, token)
        SELECT ev.lang, CAST(SUM(c) AS BIGINT) AS n_toks,
               CAST(SUM(CASE WHEN vocab.token IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
               ROUND(CAST(SUM(CASE WHEN vocab.token IS NULL THEN c ELSE 0 END) AS DOUBLE) /
                     CAST(SUM(c) AS DOUBLE), 6) AS oov_rate
        FROM ev LEFT JOIN vocab ON vocab.token = ev.token
        GROUP BY ev.lang""")
    ),

    // ----------------------------------------------------------------
    // McNEMAR'S TEST — the paired model comparison on the SAME holdout:
    // does the logistic feature model (q264) and the NB token model
    // (q274) disagree more than chance in one direction? The statistic
    // (b−c)²/(b+c) over the discordant cells is pure integer arithmetic
    // (both decisions are exact: η ≥ 0 needs no libm, the NB decision
    // compares the gate-rounded score) — this is how a pipeline decides
    // a classifier SWAP, not just a score. Scale: both scoring chains
    // are already O(corpus) map work; the comparison joins two fold-4
    // doc-grain frames on doc_id and reduces to one row.
    "q280_mcnemar_models" -> QueryDef(
      fn = (s, d) => {
        val nb = nbScored(s, d)
          .select(col("doc_id"), col("actual"),
            (col("nb_score") > lit(0.0)).as("nb_pred"))
        val lg = ClassifierQueries.holdoutScores(s, d)
          .select(col("doc_id"), (col("eta") >= lit(0.0)).as("lg_pred"))
        nb.join(lg, Seq("doc_id"))
          .select(col("actual"),
            (col("lg_pred") === (col("actual") === 1)).as("lg_ok"),
            (col("nb_pred") === (col("actual") === 1)).as("nb_ok"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("lg_ok") && col("nb_ok"), 1L).otherwise(0L)).as("both_right"),
            sum(when(!col("lg_ok") && !col("nb_ok"), 1L).otherwise(0L)).as("both_wrong"),
            sum(when(col("lg_ok") && !col("nb_ok"), 1L).otherwise(0L)).as("logit_only"),
            sum(when(!col("lg_ok") && col("nb_ok"), 1L).otherwise(0L)).as("nb_only"))
          .select(col("n"), col("both_right"), col("both_wrong"),
            col("logit_only"), col("nb_only"),
            round(when(col("logit_only") + col("nb_only") > 0,
              ((col("logit_only") - col("nb_only")) *
                (col("logit_only") - col("nb_only"))).cast("double") /
                (col("logit_only") + col("nb_only")).cast("double"))
              .otherwise(lit(0.0)), 6).as("mcnemar"))
      },
      oracle = Some(applySql + s""",
        ${ClassifierQueries.holdoutScoresSql},
        cmp AS MATERIALIZED (
          SELECT scored.actual,
                 (sc.eta >= 0.0) = (scored.actual = 1) AS lg_ok,
                 (scored.nb_score > 0.0) = (scored.actual = 1) AS nb_ok
          FROM scored JOIN sc ON sc.doc_id = scored.doc_id),
        cells AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN lg_ok AND nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
                 CAST(SUM(CASE WHEN NOT lg_ok AND NOT nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
                 CAST(SUM(CASE WHEN lg_ok AND NOT nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS logit_only,
                 CAST(SUM(CASE WHEN NOT lg_ok AND nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS nb_only
          FROM cmp)
        SELECT n, both_right, both_wrong, logit_only, nb_only,
               ROUND(CASE WHEN logit_only + nb_only > 0
                 THEN CAST((logit_only - nb_only) * (logit_only - nb_only) AS DOUBLE)
                      / CAST(logit_only + nb_only AS DOUBLE)
                 ELSE 0.0 END, 6) AS mcnemar
        FROM cells""")
    ),

    // ----------------------------------------------------------------
    // CHI-SQUARED FEATURE SELECTION — per-token 2×2 contingency of
    // document-level PRESENCE against the class label, the standard
    // vocabulary-selection statistic (Yang & Pedersen, ICML'97) a
    // pipeline runs before training token models: which tokens are
    // actually informative about quality? One distinct-presence
    // aggregate (shuffle O(corpus→(doc,token) pairs, map-side
    // combined), one vocab-grain rollup, one 2-integer broadcast. The
    // statistic is computed in DOUBLES with pinned association (the
    // integer form overflows BIGINT at ~10^6 documents; doubles are
    // deterministic IEEE at every scale). Tokens present in fewer than
    // MinDf or absent from fewer than MinDf documents are excluded
    // (degenerate margins make χ² meaningless and risk 0/0).
    "q276_chi2_tokens" -> QueryDef(
      fn = (s, d) => {
        val dt = graft.CacheLeases.lease(docTokens(s, d).persist())
        val pres = dt.groupBy(col("token"))
          .agg(
            count(lit(1)).as("df_all"),
            sum(col("y")).as("a"))
        val totals = docClass(s, d).agg(
          sum(when(col("y") === 1L, 1L).otherwise(0L)).as("dg"),
          sum(when(col("y") === 0L, 1L).otherwise(0L)).as("db"))
        val ad = col("a").cast("double")
        val bd = (col("df_all") - col("a")).cast("double")
        val cd = (col("dg") - col("a")).cast("double")
        val dd = (col("db") - (col("df_all") - col("a"))).cast("double")
        val nD = (col("dg") + col("db")).cast("double")
        val num = ad * dd - bd * cd
        val chi2 = (nD * num * num) /
          (((ad + bd) * (cd + dd)) * ((ad + cd) * (bd + dd)))
        pres.crossJoin(broadcast(totals))
          .where(col("df_all") >= MinDf &&
            (col("dg") + col("db") - col("df_all")) >= MinDf)
          .select(col("token"), col("df_all").as("df"), col("a").as("df_good"),
            round(chi2, 6).as("chi2"))
      },
      oracle = Some(s"""
        WITH $docTokensSql,
        $docClassSql,
        pres AS MATERIALIZED (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS df_all,
                 CAST(SUM(y) AS BIGINT) AS a
          FROM dtoks GROUP BY token),
        tot AS MATERIALIZED (
          SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dg,
                 CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS db
          FROM dc)
        SELECT token, df_all AS df, a AS df_good,
               ROUND(
                 (CAST(dg + db AS DOUBLE)
                    * (CAST(a AS DOUBLE) * CAST(db - (df_all - a) AS DOUBLE)
                       - CAST(df_all - a AS DOUBLE) * CAST(dg - a AS DOUBLE))
                    * (CAST(a AS DOUBLE) * CAST(db - (df_all - a) AS DOUBLE)
                       - CAST(df_all - a AS DOUBLE) * CAST(dg - a AS DOUBLE)))
                 / ((CAST(a AS DOUBLE) + CAST(df_all - a AS DOUBLE))
                      * (CAST(dg - a AS DOUBLE) + CAST(db - (df_all - a) AS DOUBLE))
                    * ((CAST(a AS DOUBLE) + CAST(dg - a AS DOUBLE))
                       * (CAST(df_all - a AS DOUBLE) + CAST(db - (df_all - a) AS DOUBLE)))),
                 6) AS chi2
        FROM pres CROSS JOIN tot
        WHERE df_all >= $MinDf AND (dg + db - df_all) >= $MinDf""")
    )
  )

  /** The one-shot fit oracle — shared by q273 and its maintained-state
    * twin q288, whose hash match against the SAME text is the
    * merge ≡ recompute proof (the q223/q236 discipline).
    */
  private lazy val fitOracle: Option[String] = Some(s"""
        WITH $docTokensSql,
        ${tokenCountsSql("dtoks")},
        $classTotalsSql
        SELECT token, c0, c1, ROUND($llrSql, 6) AS llr
        FROM tc CROSS JOIN ct""")

  /** The shared q274/q275 oracle chain: train-slice model + constants,
    * fold-4 scoring with the sorted-token fold, ending at CTE `scored`
    * (doc_id, actual, n_toks, nb_score).
    */
  private lazy val applySql: String = s"""
        WITH $docTokensSql,
        $docClassSql,
        tr AS MATERIALIZED (SELECT * FROM dtoks WHERE doc_id % $Fold <> ${Fold - 1}),
        ${tokenCountsSql("tr")},
        $classTotalsSql,
        pri AS MATERIALIZED (
          SELECT ln(CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
                    CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS DOUBLE)) AS prior
          FROM dc WHERE doc_id % $Fold <> ${Fold - 1}),
        lm AS MATERIALIZED (
          SELECT token, $llrSql AS llr FROM tc CROSS JOIN ct),
        uc AS MATERIALIZED (
          SELECT ln(CAST(n0 + v AS DOUBLE) / CAST(n1 + v AS DOUBLE)) AS llr_u FROM ct),
        terms AS MATERIALIZED (
          SELECT d.doc_id, d.token, d.c,
                 CAST(d.c AS DOUBLE) * COALESCE(lm.llr, uc.llr_u) AS term
          FROM dtoks d LEFT JOIN lm ON lm.token = d.token CROSS JOIN uc
          WHERE d.doc_id % $Fold = ${Fold - 1}),
        sums AS MATERIALIZED (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
                 list_sum(list_transform(list(term ORDER BY token), x -> x)) AS ts
          FROM terms GROUP BY doc_id),
        scored AS MATERIALIZED (
          SELECT dc.doc_id, CAST(dc.y AS INT) AS actual,
                 COALESCE(sums.n_toks, 0) AS n_toks,
                 ROUND(pri.prior + COALESCE(sums.ts, 0.0), 6) AS nb_score
          FROM dc LEFT JOIN sums ON sums.doc_id = dc.doc_id CROSS JOIN pri
          WHERE dc.doc_id % $Fold = ${Fold - 1})"""
}
