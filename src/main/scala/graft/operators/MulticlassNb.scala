package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{TextFunctions, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTICLASS multinomial Naive Bayes — the binary token classifier
  * (q273-q275) generalized to K classes, with the document LANGUAGE as
  * the label: the production shape a corpus pipeline runs when the
  * buckets are quality tiers, domains, or languages-as-labels rather
  * than good/bad. Reference scope: bakery-big-data has no model engine;
  * training-data-pipeline extension surface (round-11 verdict item 5).
  *
  * Scale contract (the q273 discipline at K-class grain): FIT is one
  * explode + one (token, class)-grain aggregate — map-side combined,
  * shuffle O(vocab·K), never O(corpus). APPLY joins the eval tokens to
  * the (token, class) model — token-keyed shuffled join at corpus scale
  * (a 100 TB vocab does not broadcast by assumption; the K-row class
  * constants DO) — and folds per (doc, class) before a per-doc argmax
  * AGGREGATE (min-struct — no window over the fact). Driver state: the
  * K priors.
  *
  * Determinism (the q274 rules): every probability is one `ln` of an
  * exact integer rational; per-(doc, class) folds run in sorted token
  * order on both engines; scores pass ROUND(…,6) BEFORE the argmax, and
  * argmax ties break on class ascending — so the chosen class is
  * engine-independent. The K-class χ² sums its per-class terms in
  * sorted class order (the q161 ordered-fold discipline).
  */
object MulticlassNb extends QueryModule {

  import Tables._

  /** Holdout fold: doc_id % 5 == 4 (the q265/q274 convention). */
  private val Fold = 5

  /** Minimum document frequency (and absence count) for the K-class χ². */
  private val MinDf = 20

  // ------------------------------------------------------------------
  // Shared frames — the q274 two-stage explode shape with the CLASS
  // label (lang) in place of the binary rule gate.

  /** (doc_id, lang, token, c): per-document token counts at class
    * grain — one corpus explode, collapsed immediately.
    */
  private def docTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        split(TextFunctions.normalizeText(col("text")), " ").as("ws"))
      .select(col("doc_id"), col("lang"), explode(col("ws")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("lang"), col("token"))
      .agg(count(lit(1)).as("c"))

  private lazy val docTokensSql =
    s"""mdt AS MATERIALIZED (
          SELECT doc_id, lang, token, CAST(COUNT(*) AS BIGINT) AS c
          FROM (
            SELECT doc_id, lang, UNNEST(string_split(t, ' ')) AS token
            FROM (${TextQueries.normSql}))
          WHERE token <> ''
          GROUP BY doc_id, lang, token)"""

  private lazy val docLangSql =
    s"""mdl AS MATERIALIZED (
          SELECT doc_id, lang FROM (${TextQueries.normSql}))"""

  /** (token, lang, c) model counts from a (doc, lang, token, c) slice —
    * one aggregate, shuffle O(vocab·K).
    */
  private def tokenClassCounts(dt: DataFrame): DataFrame =
    dt.groupBy(col("token"), col("lang")).agg(sum(col("c")).as("c"))

  private def tokenClassCountsSql(src: String) =
    s"""mtc AS MATERIALIZED (
          SELECT token, lang, CAST(SUM(c) AS BIGINT) AS c
          FROM $src GROUP BY token, lang)"""

  /** Per-class token mass (lang, nk) and the 1-row vocab size v. */
  private val classMassSql =
    """mnk AS MATERIALIZED (
          SELECT lang, CAST(SUM(c) AS BIGINT) AS nk FROM mtc GROUP BY lang),
        mv AS MATERIALIZED (
          SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM mtc)"""

  /** Smoothed per-(token, class) log-weight:
    * llw = ln( (c+1) / (Nk+V) ) — ONE ln of an exact integer rational.
    */
  private def llwCol: org.apache.spark.sql.Column =
    log((col("c") + lit(1L)).cast("double") /
      (col("nk") + col("v")).cast("double"))

  private val llwSql =
    "ln(CAST(c + 1 AS DOUBLE) / CAST(nk + v AS DOUBLE))"

  /** The scored fold-4 frame under the folds-0-3 K-class model:
    * (doc_id, actual, pred, score) — shared by q296 (doc grain) and
    * q297 (confusion rollup).
    */
  private def scored(s: SparkSession, d: String): DataFrame = {
    val dt = graft.CacheLeases.lease(docTokens(s, d).persist())
    val tc = graft.CacheLeases.lease(
      tokenClassCounts(dt.where(col("doc_id") % Fold =!= Fold - 1)).persist())
    val nk = tc.groupBy(col("lang")).agg(sum(col("c")).as("nk"))
    val v  = tc.agg(countDistinct(col("token")).as("v"))
    val docLang = documents(s, d).select(col("doc_id"), col("lang"))
    val priors = docLang.where(col("doc_id") % Fold =!= Fold - 1)
      .groupBy(col("lang")).agg(count(lit(1)).as("dk"))
    val dtot = priors.agg(sum(col("dk")).as("dtot"))
    // per-class constants: K rows — always broadcast
    val lu = nk.crossJoin(broadcast(v))
      .select(col("lang"),
        log(lit(1.0) / (col("nk") + col("v")).cast("double")).as("llu"))
    val lm = tc
      .join(broadcast(nk), "lang").crossJoin(broadcast(v))
      .select(col("token"), col("lang"), llwCol.as("llw"))
    // eval tokens × K classes: the only corpus-scale join keys on
    // (token, class) — never assumed broadcastable
    val terms = dt.where(col("doc_id") % Fold === Fold - 1)
      .select(col("doc_id"), col("token"), col("c"))
      .crossJoin(broadcast(lu))
      .join(lm, Seq("token", "lang"), "left")
      .select(col("doc_id"), col("lang"), col("token"),
        (col("c").cast("double") * coalesce(col("llw"), col("llu"))).as("term"))
    val sums = terms
      .groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(struct(col("token"), col("term")))).as("tl"))
      .select(col("doc_id"), col("lang"),
        expr("aggregate(tl, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)").as("ts"))
    val score = docLang.where(col("doc_id") % Fold === Fold - 1)
      .select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(
        priors.crossJoin(dtot).select(col("lang"),
          log(col("dk").cast("double") / col("dtot").cast("double")).as("prior"))))
      .join(sums, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("actual"), col("lang"),
        round(col("prior") + coalesce(col("ts"), lit(0.0)), 6).as("score"))
    // per-doc argmax as an AGGREGATE (no fact-grain window): min over
    // (−score, class) picks the max ROUNDED score, ties on class asc
    score
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("ns"), col("lang").as("pl"))).as("b"))
      .select(col("doc_id"), col("actual"),
        col("b").getField("pl").as("pred"),
        (-col("b").getField("ns")).as("score"))
  }

  /** The shared q296/q297 oracle chain ending at CTE `mbest1`
    * (doc_id, actual, pred, score) — no WITH prefix, so the q307
    * model comparison can compose it with the OvR-logistic chain.
    */
  private lazy val applyChainSql: String = s"""$docTokensSql,
        $docLangSql,
        mtr AS MATERIALIZED (SELECT * FROM mdt WHERE doc_id % $Fold <> ${Fold - 1}),
        ${tokenClassCountsSql("mtr")},
        $classMassSql,
        mpr AS MATERIALIZED (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS dk
          FROM mdl WHERE doc_id % $Fold <> ${Fold - 1} GROUP BY lang),
        mdd AS MATERIALIZED (SELECT CAST(SUM(dk) AS BIGINT) AS dtot FROM mpr),
        mlm AS MATERIALIZED (
          SELECT token, lang, $llwSql AS llw
          FROM mtc JOIN mnk USING (lang) CROSS JOIN mv),
        mlu AS MATERIALIZED (
          SELECT lang, ln(1.0 / CAST(nk + v AS DOUBLE)) AS llu
          FROM mnk CROSS JOIN mv),
        mterm AS MATERIALIZED (
          SELECT e.doc_id, u.lang, e.token,
                 CAST(e.c AS DOUBLE) * COALESCE(lm.llw, u.llu) AS term
          FROM (SELECT doc_id, token, c FROM mdt WHERE doc_id % $Fold = ${Fold - 1}) e
          CROSS JOIN mlu u
          LEFT JOIN mlm lm ON lm.token = e.token AND lm.lang = u.lang),
        msum AS MATERIALIZED (
          SELECT doc_id, lang,
                 list_sum(list_transform(list(term ORDER BY token), x -> x)) AS ts
          FROM mterm GROUP BY doc_id, lang),
        mscore AS MATERIALIZED (
          SELECT d.doc_id, d.lang AS actual, p.lang,
                 ROUND(ln(CAST(p.dk AS DOUBLE) / CAST(mdd.dtot AS DOUBLE))
                       + COALESCE(s.ts, 0.0), 6) AS score
          FROM (SELECT doc_id, lang FROM mdl WHERE doc_id % $Fold = ${Fold - 1}) d
          CROSS JOIN mpr p CROSS JOIN mdd
          LEFT JOIN msum s ON s.doc_id = d.doc_id AND s.lang = p.lang),
        mbest AS MATERIALIZED (
          SELECT doc_id, actual, lang AS pred, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang ASC) AS rn
          FROM mscore),
        mbest1 AS MATERIALIZED (
          SELECT doc_id, actual, pred, score FROM mbest WHERE rn = 1)"""

  private lazy val applySql: String = s"""
        WITH $applyChainSql"""

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // K-CLASS FIT — the trained language model over tokens: per
    // (token, class) occurrence counts and the Laplace-smoothed
    // log-weight each occurrence contributes to that class's score.
    // One explode-aggregate (shuffle O(vocab·K)), one K-row mass
    // rollup, one 1-row vocab broadcast.
    "q295_nb_lang_fit" -> QueryDef(
      fn = (s, d) => {
        val tc = graft.CacheLeases.lease(
          tokenClassCounts(docTokens(s, d)).persist())
        val nk = tc.groupBy(col("lang")).agg(sum(col("c")).as("nk"))
        val v  = tc.agg(countDistinct(col("token")).as("v"))
        tc.join(broadcast(nk), "lang").crossJoin(broadcast(v))
          .select(col("token"), col("lang"), col("c"),
            round(llwCol, 6).as("llw"))
      },
      oracle = Some(s"""
        WITH $docTokensSql,
        ${tokenClassCountsSql("mdt")},
        $classMassSql
        SELECT token, lang, c, ROUND($llwSql, 6) AS llw
        FROM mtc JOIN mnk USING (lang) CROSS JOIN mv""")
    ),

    // ----------------------------------------------------------------
    // MAINTAINED K-CLASS MODEL — the q288 count-merge pattern at
    // (token, class) grain: four ingest batches each aggregate their
    // OWN (token, lang) counts and merge into the stored model table
    // by addition (O(batch vocab·K) per refresh, never a corpus
    // rescan); the final smoothed model gates against the SAME oracle
    // as the one-shot q295 fit — maintained ≡ recompute, hash-proven.
    "q310_nb_lang_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q310_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          for (b <- 0 until 4) {
            val batch = tokenClassCounts(
              docTokens(s, d).where(col("doc_id") % 4 === b))
            val merged =
              if (wh.exists("gold", "mv_nb_lang_counts"))
                wh.load("gold", "mv_nb_lang_counts").unionByName(batch)
                  .groupBy(col("token"), col("lang"))
                  .agg(sum(col("c")).as("c"))
              else batch
            wh.overwrite(merged, "gold", "mv_nb_lang_counts")
          }
          val tc = graft.CacheLeases.lease(
            wh.load("gold", "mv_nb_lang_counts")
              .select(col("token"), col("lang"), col("c").cast("long").as("c"))
              .persist())
          val nk = tc.groupBy(col("lang")).agg(sum(col("c")).as("nk"))
          val v  = tc.agg(countDistinct(col("token")).as("v"))
          tc.join(broadcast(nk), "lang").crossJoin(broadcast(v))
            .select(col("token"), col("lang"), col("c"),
              round(llwCol, 6).as("llw"))
            .localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(
          java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(s"""
        WITH $docTokensSql,
        ${tokenClassCountsSql("mdt")},
        $classMassSql
        SELECT token, lang, c, ROUND($llwSql, 6) AS llw
        FROM mtc JOIN mnk USING (lang) CROSS JOIN mv""")
    ),

    // ----------------------------------------------------------------
    // K-CLASS APPLY — train on folds 0-3, predict the language of the
    // unseen fold 4: per (doc, class) score = ln(Dk/D) + Σ c·llw with
    // unseen tokens contributing the class's smoothing constant, scores
    // ROUNDED before the per-doc argmax (class-asc ties) so the
    // decision is engine-independent. Doc-grain output gates the whole
    // train→score→decide pipeline.
    "q296_nb_lang_apply" -> QueryDef(
      fn = (s, d) => scored(s, d),
      oracle = Some(applySql + """
        SELECT doc_id, actual, pred, score FROM mbest1""")
    ),

    // ----------------------------------------------------------------
    // K×K CONFUSION MATRIX — the multiclass holdout evaluation at
    // decision grain; the production readout (which languages bleed
    // into which) a routing pipeline alerts on.
    "q297_nb_lang_confusion" -> QueryDef(
      fn = (s, d) => {
        scored(s, d)
          .groupBy(col("actual"), col("pred"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some(applySql + """
        SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS n
        FROM mbest1 GROUP BY actual, pred""")
    ),

    // ----------------------------------------------------------------
    // PAIRED MODEL COMPARISON — multinomial NB (q296, generative) vs
    // one-vs-rest logistic (q306, discriminative) on the SAME fold-4
    // holdout: the q280 McNemar discipline at K classes (correctness is
    // "pred == actual", the discordant cells feed (b−c)²/(b+c) — pure
    // integer arithmetic). This is how a routing pipeline decides which
    // multiclass family to ship. Both scoring chains are the already-
    // gated shapes; the comparison joins two fold-4 doc-grain frames
    // and reduces to one row.
    "q307_multiclass_mcnemar" -> QueryDef(
      fn = (s, d) => {
        val nb = scored(s, d)
          .select(col("doc_id"), col("actual"), col("pred").as("nb_pred"))
        val lg = ClassifierQueries.ovrScored(s, d)
          .select(col("doc_id"), col("pred").as("lg_pred"))
        nb.join(lg, Seq("doc_id"))
          .select(
            (col("lg_pred") === col("actual")).as("lg_ok"),
            (col("nb_pred") === col("actual")).as("nb_ok"))
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
      oracle = Some(s"""
        WITH $applyChainSql,
        ${ClassifierQueries.ovrScoredSql},
        xcmp AS MATERIALIZED (
          SELECT (o.pred = m.actual) AS lg_ok, (m.pred = m.actual) AS nb_ok
          FROM mbest1 m JOIN ovbest1 o ON o.doc_id = m.doc_id),
        xcells AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN lg_ok AND nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
                 CAST(SUM(CASE WHEN NOT lg_ok AND NOT nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
                 CAST(SUM(CASE WHEN lg_ok AND NOT nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS logit_only,
                 CAST(SUM(CASE WHEN NOT lg_ok AND nb_ok THEN 1 ELSE 0 END) AS BIGINT) AS nb_only
          FROM xcmp)
        SELECT n, both_right, both_wrong, logit_only, nb_only,
               ROUND(CASE WHEN logit_only + nb_only > 0
                 THEN CAST((logit_only - nb_only) * (logit_only - nb_only) AS DOUBLE)
                      / CAST(logit_only + nb_only AS DOUBLE)
                 ELSE 0.0 END, 6) AS mcnemar
        FROM xcells""")
    ),

    // ----------------------------------------------------------------
    // K-CLASS χ² FEATURE SELECTION — q276's 2×2 presence statistic
    // extended to the full 2×K contingency (Yang & Pedersen): per
    // token, observed per-class presence/absence counts against the
    // class-proportional expectation, χ² = Σ_k (O−E)²/E over BOTH rows
    // of every class column, the per-class terms summed in sorted class
    // order (the q161 ordered-fold rule — a hash aggregate's merge
    // order would drift the double sum). Degenerate margins excluded
    // (df and absence both ≥ MinDf). Shapes: one presence aggregate
    // (map-side combined), a vocab-grain rollup, a K-row broadcast.
    "q298_chi2_lang" -> QueryDef(
      fn = (s, d) => {
        val dt = graft.CacheLeases.lease(docTokens(s, d).persist())
        val pres = dt.groupBy(col("token"), col("lang"))
          .agg(count(lit(1)).as("a"))
        val dfs = pres.groupBy(col("token")).agg(sum(col("a")).as("df"))
        val dk = documents(s, d).groupBy(col("lang"))
          .agg(count(lit(1)).as("dk"))
        val dd = dk.agg(sum(col("dk")).as("dd"))
        val grid = dfs
          .crossJoin(broadcast(dk.crossJoin(dd)))
          .join(pres, Seq("token", "lang"), "left")
          .select(col("token"), col("lang"), col("df"), col("dk"), col("dd"),
            coalesce(col("a"), lit(0L)).as("a"))
        val ep = col("dk").cast("double") * col("df").cast("double") /
          col("dd").cast("double")
        val ea = col("dk").cast("double") * (col("dd") - col("df")).cast("double") /
          col("dd").cast("double")
        val op = col("a").cast("double")
        val oa = (col("dk") - col("a")).cast("double")
        val term = (op - ep) * (op - ep) / ep + (oa - ea) * (oa - ea) / ea
        grid
          .where(col("df") >= MinDf && (col("dd") - col("df")) >= MinDf)
          .select(col("token"), col("df"), col("lang"), term.as("term"))
          .groupBy(col("token"))
          .agg(
            max(col("df")).as("df"),
            sort_array(collect_list(struct(col("lang"), col("term")))).as("ts"))
          .select(col("token"), col("df"),
            round(expr(
              "aggregate(ts, CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)"), 6)
              .as("chi2"))
      },
      oracle = Some(s"""
        WITH $docTokensSql,
        $docLangSql,
        mpres AS MATERIALIZED (
          SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS a
          FROM mdt GROUP BY token, lang),
        mdf AS MATERIALIZED (
          SELECT token, CAST(SUM(a) AS BIGINT) AS df FROM mpres GROUP BY token),
        mdk AS MATERIALIZED (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS dk FROM mdl GROUP BY lang),
        mtt AS MATERIALIZED (SELECT CAST(SUM(dk) AS BIGINT) AS dd FROM mdk),
        mgrid AS MATERIALIZED (
          SELECT f.token, k.lang, f.df, k.dk, mtt.dd,
                 COALESCE(p.a, 0) AS a
          FROM mdf f CROSS JOIN mdk k CROSS JOIN mtt
          LEFT JOIN mpres p ON p.token = f.token AND p.lang = k.lang),
        mterm AS MATERIALIZED (
          SELECT token, df, lang,
                 (CAST(a AS DOUBLE)
                    - CAST(dk AS DOUBLE) * CAST(df AS DOUBLE) / CAST(dd AS DOUBLE))
                 * (CAST(a AS DOUBLE)
                    - CAST(dk AS DOUBLE) * CAST(df AS DOUBLE) / CAST(dd AS DOUBLE))
                 / (CAST(dk AS DOUBLE) * CAST(df AS DOUBLE) / CAST(dd AS DOUBLE))
                 + (CAST(dk - a AS DOUBLE)
                    - CAST(dk AS DOUBLE) * CAST(dd - df AS DOUBLE) / CAST(dd AS DOUBLE))
                 * (CAST(dk - a AS DOUBLE)
                    - CAST(dk AS DOUBLE) * CAST(dd - df AS DOUBLE) / CAST(dd AS DOUBLE))
                 / (CAST(dk AS DOUBLE) * CAST(dd - df AS DOUBLE) / CAST(dd AS DOUBLE))
                   AS term
          FROM mgrid
          WHERE df >= $MinDf AND dd - df >= $MinDf)
        SELECT token, CAST(MAX(df) AS BIGINT) AS df,
               ROUND(list_sum(list_transform(list(term ORDER BY lang), x -> x)), 6) AS chi2
        FROM mterm GROUP BY token""")
    )
  )
}
