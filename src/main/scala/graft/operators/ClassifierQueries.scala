package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.{TextFunctions, TextQueries}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A trained QUALITY CLASSIFIER — L2-regularized logistic regression fit
  * by fixed-step IRLS — the model every production corpus pipeline
  * trains on labeled documents, completing the supervised family (the
  * engine could regress, rank, and rule-score quality but not CLASSIFY).
  * Reference scope: bakery-big-data has no model engine at all; this is
  * the training-data-pipeline extension surface (builder prompt), built
  * from the kernels the regression family already proved:
  *
  *   - each IRLS step is ONE weighted moment aggregate — 21 decimal sums
  *     (XᵀWX upper triangle + XᵀWz) — the q204/q222 O(groups·d²) shape:
  *     shuffle is O(d²) per step regardless of corpus size, so three
  *     steps at 100 TB are three map-side-combined scans, never a
  *     row-grain shuffle;
  *   - each solve runs the q222 GENERATED Gaussian elimination over the
  *     collected O(d²) moment state (driver doubles) while the DuckDB
  *     oracle executes the IDENTICAL step program as level-batched
  *     MATERIALIZED CTEs — bit-for-bit the same op sequence, so the
  *     fitted coefficients hash-match without hand-pinning;
  *   - the working response uses the real logistic sigmoid via `exp`.
  *     Cross-engine, JVM `Math.exp` and DuckDB's libm differ on ~0.3% of
  *     inputs by exactly 1 ulp (measured on 20k samples); each such flip
  *     can shift one DECIMAL(38,10) moment cast by at most 1e-10 —
  *     relative 1e-13 on the moments, absorbed by the ROUND(…,6) output
  *     gate with seven orders of magnitude to spare. η is clamped to
  *     ±30 (IEEE-exact GREATEST/LEAST both engines) so μ can never round
  *     to an exact 0/1 and zero the IRLS weight.
  *
  * Features are bounded, engine-exact ratios of the q28-q30 text
  * statistics (stopword density, mean token length, type-token ratio,
  * capped length) — integer counts divided once, so both engines
  * produce identical doubles. The label distills the rule-based
  * [[TextFunctions.qualityScore]] gate (≥ 80 = curated) into a trained
  * model — the classic "replace the heuristic with a classifier trained
  * on its decisions, then audit where they disagree" bootstrap.
  */
object ClassifierQueries extends QueryModule {

  import Tables._

  private val dt = DecimalType(38, 10)

  /** L2 penalty (added to every diagonal normal-matrix entry, intercept
    * included — documented choice, keeps the solve well-conditioned even
    * on quasi-separable corpora).
    */
  private val Lambda = 1.0

  /** Fixed IRLS step count: deterministic, CTE-mirrorable; three steps
    * reach round-6 coefficient stability on every gated corpus.
    */
  private val Steps = 3

  /** Working-response clamp on η: exp(±30) keeps μ strictly inside
    * (1e-13, 1 - 1e-13), so the IRLS weight μ(1-μ) can never underflow
    * to an exact 0 and poison z with a 0/0.
    */
  private val EtaClamp = 30.0

  /** Label threshold on [[TextFunctions.qualityScore]] (0..100). */
  private val LabelCut = 80

  // ------------------------------------------------------------------
  // Features (Spark side + SQL mirror). All four are bounded ratios of
  // exact integer counts — one IEEE division each, identical cross-
  // engine; x4 caps length so no feature is unbounded at corpus scale.

  /** (doc_id, x1..x4, y): stopword density, mean token length,
    * type-token ratio (the Gopher-style repetition signal — a low
    * distinct-token share marks boilerplate/spam), capped length — and
    * the rule-gate label. Punctuation/digit ratios were considered and
    * rejected: this corpus contains neither, and a constant-zero
    * feature is a dead coefficient.
    */
  private def docFeatures(s: SparkSession, d: String): DataFrame = {
    val t      = TextFunctions.normalizeText(col("text"))
    val chars  = length(t)
    val tokens = TextFunctions.tokenCount(col("text"))
    val toksD  = greatest(tokens, lit(1)).cast("double")
    val stops  = TextFunctions.langMarkers
      .find(_._1 == "en").get._2
      .map(m => TextFunctions.occurrences(concat(lit(" "), t, lit(" ")), m))
      .reduce(_ + _)
    val distinctToks = size(array_distinct(split(t, " ")))
    documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      (stops / toksD).as("x1"),
      (chars.cast("double") / toksD).as("x2"),
      (distinctToks.cast("double") / toksD).as("x3"),
      (least(chars, lit(4000)).cast("double") / lit(4000.0)).as("x4"),
      when(TextFunctions.qualityScore(col("text")) >= LabelCut, 1.0)
        .otherwise(0.0).as("y"))
  }

  /** SQL mirror of [[docFeatures]] over the `documents` table. */
  private lazy val featuresSql: String = {
    val toksD = s"CAST(GREATEST(${TextQueries.tokenCountSql}, 1) AS DOUBLE)"
    s"""
        f AS MATERIALIZED (
          SELECT doc_id, lang, source,
                 (${TextQueries.stopsSql}) / $toksD AS x1,
                 CAST(length(t) AS DOUBLE) / $toksD AS x2,
                 CAST(len(list_distinct(string_split(t, ' '))) AS DOUBLE) /
                   $toksD AS x3,
                 CAST(LEAST(length(t), 4000) AS DOUBLE) / 4000.0 AS x4,
                 CASE WHEN (${TextQueries.qualitySql}) >= $LabelCut
                      THEN 1.0 ELSE 0.0 END AS y
          FROM (${TextQueries.normSql}))"""
  }

  // ------------------------------------------------------------------
  // The IRLS kernel. Shared op-order contracts with the SQL chain:
  //   η  = ((((b0 + b1·x1) + b2·x2) + b3·x3) + b4·x4), clamped ±30
  //   μ  = 1 / (1 + exp(-η));  w = μ·(1-μ);  z = η + (y-μ)/(μ·(1-μ))
  //   moment m_i_j = Σ DECIMAL(w · xᵢ · xⱼ), x0 ≡ 1, x5 ≡ z
  //   solve (XᵀWX + λI) β = XᵀWz via eliminationProgram(4)

  /** Left-associated clamped η from driver-side coefficients. */
  private def etaCol(beta: Array[Double]): Column = {
    val raw = lit(beta(0)) + lit(beta(1)) * col("x1") + lit(beta(2)) * col("x2") +
      lit(beta(3)) * col("x3") + lit(beta(4)) * col("x4")
    greatest(least(raw, lit(EtaClamp)), lit(-EtaClamp))
  }

  /** Fit on `rows` (must have x1..x4, y): Steps aggregate+solve rounds,
    * each one distributed O(d²)-moment pass plus a driver-local solve on
    * the collected 21 doubles (the q179/q222 dimension-bounded-state
    * discipline). Returns (β, n).
    */
  private def irlsFit(rows: DataFrame): (Array[Double], Long) = {
    val steps = RegressionQueries.eliminationProgram(4)
    var beta = Array.fill(5)(0.0)
    var n = 0L
    for (_ <- 1 to Steps) {
      val eta = etaCol(beta)
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      val w = mu * (lit(1.0) - mu)
      val z = eta + (col("y") - mu) / (mu * (lit(1.0) - mu))
      def feat(i: Int): Column =
        if (i == 0) lit(1.0) else if (i == 5) z else col(s"x$i")
      val momCols = for { i <- 0 to 4; j <- i to 5 }
        yield sum((w * feat(i) * feat(j)).cast(dt)).cast("double").as(s"m_${i}_$j")
      val r = rows.agg(count(lit(1)).as("n"), momCols: _*).head()
      n = r.getAs[Long]("n")
      val init = (for { i <- 0 to 4; j <- 0 to 5 } yield {
        val src = if (j == 5) s"m_${i}_5"
        else s"m_${math.min(i, j)}_${math.max(i, j)}"
        val v = r.getAs[Double](src)
        s"a_${i}_$j" -> (if (i == j) v + Lambda else v)
      }).toMap
      val env = RegressionQueries.runProgram(steps, init)
      beta = Array.tabulate(5)(i => env(s"b_$i"))
    }
    (beta, n)
  }

  /** GROUPED IRLS — one model per value of `gcol`, the q204/q222
    * group-grain discipline applied to classification (per-language
    * quality models, the multilingual-corpus production shape): each
    * step is STILL one aggregate (now at (group, d²) grain — 21 decimal
    * sums per group, map-side combined), the solves run per collected
    * group row through the same generated elimination, and the per-group
    * β frame broadcasts back for the next step's working response.
    * Returns (group, n, β) sorted by group.
    */
  private def irlsFitGrouped(
      rows: DataFrame, gcol: String): Seq[(String, Long, Array[Double])] = {
    val sess = rows.sparkSession
    val steps = RegressionQueries.eliminationProgram(4)
    var betas: Seq[(String, Long, Array[Double])] = Nil
    for (step <- 1 to Steps) {
      val withEta =
        if (step == 1)
          // β ≡ 0 for every group: η is the same clamped constant the
          // oracle's p1 computes — no join needed
          rows.withColumn("eta",
            greatest(least(lit(0.0), lit(EtaClamp)), lit(-EtaClamp)))
        else {
          import sess.implicits._
          val bdf = betas
            .map { case (g, _, b) => (g, b(0), b(1), b(2), b(3), b(4)) }
            .toDF(gcol, "b_0", "b_1", "b_2", "b_3", "b_4")
          rows.join(broadcast(bdf), gcol)
            .withColumn("eta", greatest(least(
              col("b_0") + col("b_1") * col("x1") + col("b_2") * col("x2") +
                col("b_3") * col("x3") + col("b_4") * col("x4"),
              lit(EtaClamp)), lit(-EtaClamp)))
        }
      val mu = lit(1.0) / (lit(1.0) + exp(-col("eta")))
      val w = mu * (lit(1.0) - mu)
      val z = col("eta") + (col("y") - mu) / (mu * (lit(1.0) - mu))
      def feat(i: Int): Column =
        if (i == 0) lit(1.0) else if (i == 5) z else col(s"x$i")
      val momCols = for { i <- 0 to 4; j <- i to 5 }
        yield sum((w * feat(i) * feat(j)).cast(dt)).cast("double").as(s"m_${i}_$j")
      val m = withEta.groupBy(col(gcol)).agg(count(lit(1)).as("n"), momCols: _*)
      betas = m.collect().toSeq.map { row =>
        val init = (for { i <- 0 to 4; j <- 0 to 5 } yield {
          val src = if (j == 5) s"m_${i}_5"
          else s"m_${math.min(i, j)}_${math.max(i, j)}"
          val v = row.getAs[Double](src)
          s"a_${i}_$j" -> (if (i == j) v + Lambda else v)
        }).toMap
        val env = RegressionQueries.runProgram(steps, init)
        (row.getAs[String](gcol), row.getAs[Long]("n"),
          Array.tabulate(5)(i => env(s"b_$i")))
      }.sortBy(_._1)
    }
    betas
  }

  /** The oracle's GROUPED IRLS chain: the [[irlsSql]] shape with the
    * moments at (group, d²) grain, the elimination program running
    * per group ROW of the reduced frame (each step op is a projection,
    * so the same CTE text solves every group at once — the q222
    * multi-group property), and the β CTE joined back on the group.
    */
  private def irlsGroupedSql(src: String, gcol: String): (String, String) = {
    def featSql(i: Int): String =
      if (i == 0) "1.0" else if (i == 5) "z" else s"x$i"
    val parts = Vector.newBuilder[String]
    for (t <- 1 to Steps) {
      parts += (if (t == 1) s"""gp1 AS MATERIALIZED (
          SELECT $src.*, GREATEST(LEAST(0.0, $EtaClamp), -$EtaClamp) AS eta
          FROM $src)"""
      else s"""gp$t AS MATERIALIZED (
          SELECT $src.*,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM $src JOIN gbeta${t - 1} USING ($gcol))""")
      parts += s"""gr$t AS MATERIALIZED (
          SELECT *, 1.0 / (1.0 + exp(-eta)) AS mu FROM gp$t)"""
      parts += s"""gs$t AS MATERIALIZED (
          SELECT *, eta + (y - mu) / (mu * (1.0 - mu)) AS z FROM gr$t)"""
      val moments = for { i <- 0 to 4; j <- i to 5 } yield
        s"SUM(CAST(mu * (1.0 - mu) * ${featSql(i)} * ${featSql(j)} AS DECIMAL(38,10))) AS m_${i}_$j"
      parts += s"""gm$t AS MATERIALIZED (
          SELECT $gcol, COUNT(*) AS n, ${moments.mkString(",\n                 ")}
          FROM gs$t GROUP BY $gcol)"""
      val aInit = for { i <- 0 to 4; j <- 0 to 5 } yield {
        val m = if (j == 5) s"m_${i}_5"
        else s"m_${math.min(i, j)}_${math.max(i, j)}"
        val base = s"CAST($m AS DOUBLE)"
        s"${if (i == j) s"($base + $Lambda)" else base} AS a_${i}_$j"
      }
      parts += s"""ga$t AS MATERIALIZED (
          SELECT $gcol, n, ${aInit.mkString(",\n                 ")} FROM gm$t)"""
      val (ctes, last) = RegressionQueries.programSql(
        RegressionQueries.eliminationProgram(4), s"ga$t", s"gg${t}_")
      parts += ctes
      parts += s"""gbeta$t AS MATERIALIZED (
          SELECT $gcol, n, b_0, b_1, b_2, b_3, b_4 FROM $last)"""
    }
    (parts.result().mkString(",\n        "), s"gbeta$Steps")
  }

  /** The oracle's IRLS chain over feature CTE `src`: per-step per-row
    * CTEs (η / μ / w,z), the 21-sum moment CTE, the λ-augmented normal
    * matrix, and the generated elimination (level-batched MATERIALIZED
    * CTEs — the q222 mirror). Returns (cteText, finalBetaCteName); the
    * final CTE carries n and b_0..b_4.
    */
  private def irlsSql(src: String, pfx: String = ""): (String, String) = {
    def featSql(i: Int): String =
      if (i == 0) "1.0" else if (i == 5) "z" else s"x$i"
    val parts = Vector.newBuilder[String]
    parts += s"""${pfx}beta0 AS MATERIALIZED (
          SELECT 0.0 AS b_0, 0.0 AS b_1, 0.0 AS b_2, 0.0 AS b_3, 0.0 AS b_4)"""
    for (t <- 1 to Steps) {
      parts += s"""${pfx}p$t AS MATERIALIZED (
          SELECT $src.*,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM $src CROSS JOIN ${pfx}beta${t - 1})"""
      parts += s"""${pfx}r$t AS MATERIALIZED (
          SELECT *, 1.0 / (1.0 + exp(-eta)) AS mu FROM ${pfx}p$t)"""
      parts += s"""${pfx}s$t AS MATERIALIZED (
          SELECT *, eta + (y - mu) / (mu * (1.0 - mu)) AS z FROM ${pfx}r$t)"""
      val moments = for { i <- 0 to 4; j <- i to 5 } yield
        s"SUM(CAST(mu * (1.0 - mu) * ${featSql(i)} * ${featSql(j)} AS DECIMAL(38,10))) AS m_${i}_$j"
      parts += s"""${pfx}m$t AS MATERIALIZED (
          SELECT COUNT(*) AS n, ${moments.mkString(",\n                 ")}
          FROM ${pfx}s$t)"""
      val aInit = for { i <- 0 to 4; j <- 0 to 5 } yield {
        val m = if (j == 5) s"m_${i}_5"
        else s"m_${math.min(i, j)}_${math.max(i, j)}"
        val base = s"CAST($m AS DOUBLE)"
        s"${if (i == j) s"($base + $Lambda)" else base} AS a_${i}_$j"
      }
      parts += s"""${pfx}a$t AS MATERIALIZED (
          SELECT n, ${aInit.mkString(",\n                 ")} FROM ${pfx}m$t)"""
      val (ctes, last) = RegressionQueries.programSql(
        RegressionQueries.eliminationProgram(4), s"${pfx}a$t", s"${pfx}g${t}_")
      parts += ctes
      parts += s"""${pfx}beta$t AS MATERIALIZED (
          SELECT n, b_0, b_1, b_2, b_3, b_4 FROM $last)"""
    }
    (parts.result().mkString(",\n        "), s"${pfx}beta$Steps")
  }

  // IMPORTANT: the Spark-side moment expression is (w · xᵢ) · xⱼ with
  // w = μ·(1-μ) — the SQL above writes mu * (1.0 - mu) * xᵢ * xⱼ, the
  // same left-association, so both engines run the identical IEEE ops.

  /** (doc_id, y, eta) on the fold-4 holdout under the folds-0-3 fit —
    * the scoring surface q265/q270/q272/q277 all rank; exposed for the
    * q280 McNemar model comparison (NaiveBayesQueries).
    */
  private[operators] def holdoutScores(s: SparkSession, d: String): DataFrame = {
    val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
    val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
    all.where(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("y"), etaCol(beta).as("eta"))
  }

  /** CTE chain ending at `sc` (doc_id, y, eta) — [[holdoutScores]]'s
    * oracle mirror (no WITH prefix; composes with other chains).
    */
  private[operators] lazy val holdoutScoresSql: String = {
    val (chain, betaF) = irlsSql("ftr")
    s"""$featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT doc_id, y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4)"""
  }

  /** Doc-grain trained-quality scores under the GATE-ROUNDED fold-0-3
    * model: (doc_id, source, lang, eta) over the WHOLE corpus — the
    * map-only curation scoring pass q290's corpus build ranks on.
    *
    * β is rounded to the gated 6 decimals BEFORE scoring (through a
    * Spark `round` so both engines round the identical way — the q282
    * staged-leaf-mean precedent): with rounded β, η is a pure IEEE-exact
    * function of cross-engine-identical inputs, so downstream RANKINGS
    * of η (the percentile cut, the dedup keeper rule) are deterministic.
    * q264's raw-β η is only gate-stable through its ROUND(p_good, 6) —
    * not rankable.
    */
  private[graft] def trainedEta(s: SparkSession, d: String): DataFrame =
    scoreEta(s, d, trainQualityBeta(s, d))

  /** The train step alone: fit on the labeled folds, return the
    * GATE-ROUNDED β — the 5 doubles a staged model table stores (q309
    * stages exactly this array and re-loads it for the build).
    */
  private[graft] def trainQualityBeta(s: SparkSession, d: String): Array[Double] = {
    val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
    val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
    import s.implicits._
    val r = Seq((beta(0), beta(1), beta(2), beta(3), beta(4)))
      .toDF("b0", "b1", "b2", "b3", "b4")
      .select((0 to 4).map(i => round(col(s"b$i"), 6).as(s"b$i")): _*)
      .head()
    Array.tabulate(5)(r.getDouble)
  }

  /** The score step alone: map-only doc-grain η under a (rounded) β —
    * the apply half q309 runs from the staged table. `docFeatures` is
    * re-leased so the scoring pass stands alone.
    */
  private[graft] def scoreEta(s: SparkSession, d: String, betaR: Array[Double]): DataFrame =
    graft.CacheLeases.lease(docFeatures(s, d).persist())
      .select(col("doc_id"), col("source"), col("lang"),
        etaCol(betaR).as("eta"))

  /** [[trainedEta]]'s oracle mirror: CTE chain ending at `ceta`
    * (doc_id, source, lang, eta) — no WITH prefix, composes with other
    * chains (CTE names: f, ftr, beta0..3 + p/r/s/m/a/g-step names from
    * [[irlsSql]], rbeta, ceta).
    */
  private[graft] lazy val trainedEtaSql: String = {
    val (chain, betaF) = irlsSql("ftr")
    s"""$featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        rbeta AS MATERIALIZED (
          SELECT ROUND(b_0, 6) AS b_0, ROUND(b_1, 6) AS b_1,
                 ROUND(b_2, 6) AS b_2, ROUND(b_3, 6) AS b_3,
                 ROUND(b_4, 6) AS b_4
          FROM $betaF),
        ceta AS MATERIALIZED (
          SELECT doc_id, source, lang,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN rbeta)"""
  }

  // ------------------------------------------------------------------
  // ONE-VS-REST MULTICLASS LOGISTIC (q305/q306) — the q271 grouped-IRLS
  // machinery pointed at K binary problems instead of K data slices:
  // the feature frame replicates across the K class labels with the
  // indicator response y = (lang == cls), and ONE grouped fit trains
  // all K models simultaneously (each step is still one aggregate, now
  // at (cls, d²) grain — 21 decimal sums × K, map-side combined). The
  // multinomial-NB family (q295-q297) is the generative counterpart;
  // q307 compares the two paired on the same holdout.

  /** The K-replicated OvR frame: (doc_id, lang, cls, x1..x4, y) with
    * y the one-vs-rest indicator. K rows per document — the honest
    * cost of OvR, linear in K and never quadratic in anything.
    */
  private def ovrRows(all: DataFrame): DataFrame = {
    val classes = all.select(col("lang").as("cls")).distinct()
    all.crossJoin(broadcast(classes))
      .select(col("doc_id"), col("lang"), col("cls"),
        col("x1"), col("x2"), col("x3"), col("x4"),
        when(col("lang") === col("cls"), 1.0).otherwise(0.0).as("y"))
  }

  /** CTEs `ovrf` (replicated frame) and `ovrt` (train folds) over the
    * [[featuresSql]] CTE `f`.
    */
  private val ovrSql = s"""ovrf AS MATERIALIZED (
          SELECT f.doc_id, f.lang, c.cls, f.x1, f.x2, f.x3, f.x4,
                 CASE WHEN f.lang = c.cls THEN 1.0 ELSE 0.0 END AS y
          FROM f CROSS JOIN (SELECT DISTINCT lang AS cls FROM f) c),
        ovrt AS MATERIALIZED (SELECT * FROM ovrf WHERE doc_id % 5 <> 4)"""

  /** Fold-4 OvR decisions under the folds-0-3 K-model fit: (doc_id,
    * actual, pred, eta) — shared by q306 and the q307 comparison. η is
    * computed from the GATE-ROUNDED per-class β (the q290 rule), so it
    * is IEEE-exact cross-engine and the argmax needs no rounding.
    */
  private[graft] def ovrScored(s: SparkSession, d: String): DataFrame = {
    val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
    val betas = irlsFitGrouped(
      ovrRows(all).where(col("doc_id") % 5 =!= 4), "cls")
    import s.implicits._
    val bdf = betas.map { case (g, _, b) => (g, b(0), b(1), b(2), b(3), b(4)) }
      .toDF("cls", "rb0", "rb1", "rb2", "rb3", "rb4")
      .select(col("cls") +: (0 to 4).map(i => round(col(s"rb$i"), 6).as(s"b_$i")): _*)
    val eta = greatest(least(
      col("b_0") + col("b_1") * col("x1") + col("b_2") * col("x2") +
        col("b_3") * col("x3") + col("b_4") * col("x4"),
      lit(EtaClamp)), lit(-EtaClamp))
    all.where(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("lang").as("actual"),
        col("x1"), col("x2"), col("x3"), col("x4"))
      .crossJoin(broadcast(bdf))
      .withColumn("eta", eta)
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("eta")).as("ns"), col("cls").as("pc"))).as("b"))
      .select(col("doc_id"), col("actual"),
        col("b").getField("pc").as("pred"),
        round(-col("b").getField("ns"), 6).as("eta"))
  }

  /** [[ovrScored]]'s oracle chain ending at `ovbest1` (doc_id, actual,
    * pred, eta) — no WITH prefix; composes with the MulticlassNb chain
    * for the q307 comparison.
    */
  private[graft] lazy val ovrScoredSql: String = {
    val (chain, betaF) = irlsGroupedSql("ovrt", "cls")
    s"""$featuresSql,
        $ovrSql,
        $chain,
        ovrb AS MATERIALIZED (
          SELECT cls, ROUND(b_0, 6) AS b_0, ROUND(b_1, 6) AS b_1,
                 ROUND(b_2, 6) AS b_2, ROUND(b_3, 6) AS b_3,
                 ROUND(b_4, 6) AS b_4
          FROM $betaF),
        ovsc AS MATERIALIZED (
          SELECT f.doc_id, f.lang AS actual, r.cls,
                 GREATEST(LEAST(r.b_0 + r.b_1 * x1 + r.b_2 * x2 + r.b_3 * x3
                   + r.b_4 * x4, $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN ovrb r
          WHERE f.doc_id % 5 = 4),
        ovbest AS MATERIALIZED (
          SELECT doc_id, actual, cls AS pred, eta,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY eta DESC, cls ASC) AS rn
          FROM ovsc),
        ovbest1 AS MATERIALIZED (
          SELECT doc_id, actual, pred, ROUND(eta, 6) AS eta
          FROM ovbest WHERE rn = 1)"""
  }

  /** The full-corpus apply oracle — shared by q264 (refit-apply) and its
    * staged-model twin q291, whose hash match against the SAME text is
    * the staged ≡ refit proof (the q223/q236 discipline).
    */
  private lazy val applyOracle: Option[String] = Some {
    val (chain, betaF) = irlsSql("f")
    s"""
        WITH $featuresSql,
        $chain,
        sc AS MATERIALIZED (
          SELECT doc_id,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF)
        SELECT doc_id, ROUND(1.0 / (1.0 + exp(-eta)), 6) AS p_good,
               eta >= 0.0 AS predicted_good
        FROM sc"""
  }

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // FIT — the trained quality classifier's coefficients. Three IRLS
    // rounds; each is one O(d²)-moment aggregate over the corpus (21
    // decimal sums — map-side combined, shuffle O(1) in the corpus) and
    // one driver-local generated-elimination solve on the collected
    // 5×6 normal system. At 100 TB: 3 column-pruned scans, zero
    // row-grain shuffles, O(d²) driver state — the q222 scale argument
    // with a sigmoid in front.
    "q263_logit_quality_fit" -> QueryDef(
      fn = (s, d) => {
        val rows = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, n) = irlsFit(rows)
        import s.implicits._
        Seq((n, beta(0), beta(1), beta(2), beta(3), beta(4)))
          .toDF("n", "rb0", "rb1", "rb2", "rb3", "rb4")
          .select(col("n"),
            round(col("rb0"), 6).as("b0"), round(col("rb1"), 6).as("b1"),
            round(col("rb2"), 6).as("b2"), round(col("rb3"), 6).as("b3"),
            round(col("rb4"), 6).as("b4"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("f")
        s"""
        WITH $featuresSql,
        $chain
        SELECT n, ROUND(b_0, 6) AS b0, ROUND(b_1, 6) AS b1,
               ROUND(b_2, 6) AS b2, ROUND(b_3, 6) AS b3, ROUND(b_4, 6) AS b4
        FROM $betaF"""
      }
    ),

    // ----------------------------------------------------------------
    // APPLY — score every document with the fitted model: calibrated
    // P(good) plus the hard decision. The decision is η ≥ 0 (exact
    // arithmetic, no exp on the decision path); the probability is the
    // sigmoid, rounded well above its 1-ulp cross-engine noise. At
    // scale this is the map-only curation pass: broadcast 5 doubles,
    // one projection over the corpus.
    "q264_logit_quality_apply" -> QueryDef(
      fn = (s, d) => {
        val rows = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(rows)
        val eta = etaCol(beta)
        rows.select(
          col("doc_id"),
          round(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("p_good"),
          (eta >= lit(0.0)).as("predicted_good"))
      },
      oracle = applyOracle
    ),

    // ----------------------------------------------------------------
    // STAGED-MODEL APPLY — q264's production form: TRAIN ONCE, stage the
    // fitted β as a warehouse model table (the q288 NB-count-table
    // pattern applied to the logistic family), and APPLY FROM THE TABLE
    // — the scoring pass reads the staged model, never re-derives it.
    // Parquet round-trips IEEE doubles exactly, so staged-apply is
    // bit-identical to refit-apply and gates against q264's oracle
    // verbatim (the hash match IS the staging proof). The returned plan
    // folds the 5 collected doubles as literals — stricter than
    // broadcast: one corpus scan, zero joins, zero fit jobs
    // (plan-audited). At 100 TB this is what apply-many costs: a scan.
    "q291_logit_staged_apply" -> QueryDef(
      fn = (s, d) => {
        val rows = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q291_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          // train once → stage
          val (beta, n) = irlsFit(rows)
          import s.implicits._
          wh.overwrite(
            Seq((n, beta(0), beta(1), beta(2), beta(3), beta(4)))
              .toDF("n", "b0", "b1", "b2", "b3", "b4"),
            "gold", "model_logit_quality")
          // apply-many: the staged table is the ONLY model input
          val m = wh.load("gold", "model_logit_quality").head()
          val staged = Array.tabulate(5)(i => m.getAs[Double](s"b$i"))
          val eta = etaCol(staged)
          rows.select(
            col("doc_id"),
            round(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("p_good"),
            (eta >= lit(0.0)).as("predicted_good"))
        } finally graft.Staging.deleteRecursively(
          java.nio.file.Paths.get(whRoot))
      },
      oracle = applyOracle
    ),

    // ----------------------------------------------------------------
    // ONE-VS-REST FIT — K binary logistic models trained in ONE grouped
    // IRLS pass over the class-replicated frame (y = indicator): each
    // step is one (cls, d²)-grain aggregate, 21 decimal sums × K, the
    // oracle's elimination CTEs solving all K models at once (the q271
    // multi-group property). The discriminative counterpart of the
    // multinomial NB q295; at 100 TB the replicate is K× the scan —
    // linear in K — and shuffle stays O(K·d²).
    "q305_ovr_logit_fit" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val betas = irlsFitGrouped(
          ovrRows(all).where(col("doc_id") % 5 =!= 4), "cls")
        import s.implicits._
        betas.map { case (g, n, b) => (g, n, b(0), b(1), b(2), b(3), b(4)) }
          .toDF("cls", "n", "rb0", "rb1", "rb2", "rb3", "rb4")
          .select(col("cls"), col("n"),
            round(col("rb0"), 6).as("b0"), round(col("rb1"), 6).as("b1"),
            round(col("rb2"), 6).as("b2"), round(col("rb3"), 6).as("b3"),
            round(col("rb4"), 6).as("b4"))
      },
      oracle = Some {
        val (chain, betaF) = irlsGroupedSql("ovrt", "cls")
        s"""
        WITH $featuresSql,
        $ovrSql,
        $chain
        SELECT cls, n, ROUND(b_0, 6) AS b0, ROUND(b_1, 6) AS b1,
               ROUND(b_2, 6) AS b2, ROUND(b_3, 6) AS b3, ROUND(b_4, 6) AS b4
        FROM $betaF"""
      }
    ),

    // ----------------------------------------------------------------
    // ONE-VS-REST APPLY — fold-4 language decisions by argmax over the
    // K models' η (gate-rounded β ⇒ η is IEEE-exact, so the argmax
    // needs no score rounding; ties break class-asc). The decision is
    // an AGGREGATE (min-struct over the K-replicated scores), never a
    // fact-grain window. Doc-grain output gates train→score→decide.
    "q306_ovr_logit_apply" -> QueryDef(
      fn = (s, d) => ovrScored(s, d),
      oracle = Some(s"""
        WITH $ovrScoredSql
        SELECT doc_id, actual, pred, eta FROM ovbest1""")
    ),

    // ----------------------------------------------------------------
    // BRIER SCORE — the proper scoring rule that completes the holdout
    // triad (q265 AUC measures ranking, q270 deciles measure grouping;
    // Brier = mean squared probability error measures both at once and
    // is PURE arithmetic — no log loss, whose ln is 1-ulp libm). The
    // reference point is the climatological baseline (predicting the
    // TRAIN base rate for every holdout doc); skill = 1 − brier/base is
    // the standard Brier skill score (> 0 ⇔ the model beats the
    // constant predictor).
    "q272_logit_brier" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val train = all.where(col("doc_id") % 5 =!= 4)
        val (beta, _) = irlsFit(train)
        // train base rate: one exact BIGINT/BIGINT division
        val br = train.agg(
          sum(col("y").cast(dt)).cast("double").as("sy"),
          count(lit(1)).cast("double").as("nt")).head()
        val pbar = br.getAs[Double]("sy") / br.getAs[Double]("nt")
        val eta = etaCol(beta)
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        all.where(col("doc_id") % 5 === 4)
          .agg(
            count(lit(1)).as("n"),
            sum(((mu - col("y")) * (mu - col("y"))).cast(dt)).as("se"),
            sum(((lit(pbar) - col("y")) * (lit(pbar) - col("y"))).cast(dt)).as("sb"))
          .select(col("n"),
            round(col("se").cast("double") / col("n").cast("double"), 6).as("brier"),
            round(col("sb").cast("double") / col("n").cast("double"), 6).as("brier_base"),
            round(lit(1.0) -
              (col("se").cast("double") / col("n").cast("double")) /
                (col("sb").cast("double") / col("n").cast("double")), 6).as("skill"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        pb AS MATERIALIZED (
          SELECT CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) /
                 CAST(COUNT(*) AS DOUBLE) AS pbar
          FROM ftr),
        sc AS MATERIALIZED (
          SELECT y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta, pbar
          FROM f CROSS JOIN $betaF CROSS JOIN pb
          WHERE doc_id % 5 = 4),
        sm AS MATERIALIZED (
          SELECT y, pbar, 1.0 / (1.0 + exp(-eta)) AS mu FROM sc),
        ag AS MATERIALIZED (
          SELECT COUNT(*) AS n,
                 SUM(CAST((mu - y) * (mu - y) AS DECIMAL(38,10))) AS se,
                 SUM(CAST((pbar - y) * (pbar - y) AS DECIMAL(38,10))) AS sb
          FROM sm)
        SELECT n,
               ROUND(CAST(se AS DOUBLE) / CAST(n AS DOUBLE), 6) AS brier,
               ROUND(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE), 6) AS brier_base,
               ROUND(1.0 - (CAST(se AS DOUBLE) / CAST(n AS DOUBLE)) /
                           (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS skill
        FROM ag"""
      }
    ),

    // ----------------------------------------------------------------
    // GROUPED FIT — one quality classifier PER LANGUAGE, the
    // multilingual-corpus production shape (a German stopword-density
    // coefficient has no business scoring Chinese text). Identical IRLS
    // machinery at (lang, d²) grain: each step is still ONE aggregate
    // (21 decimal sums × 5 languages, map-side combined — shuffle
    // O(groups·d²), never O(rows)); the oracle's elimination CTEs solve
    // all groups at once because every generated op is a row-wise
    // projection (the q222 multi-group property).
    "q271_logit_fit_by_lang" -> QueryDef(
      fn = (s, d) => {
        val rows = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val betas = irlsFitGrouped(rows, "lang")
        import s.implicits._
        betas.map { case (g, n, b) => (g, n, b(0), b(1), b(2), b(3), b(4)) }
          .toDF("lang", "n", "rb0", "rb1", "rb2", "rb3", "rb4")
          .select(col("lang"), col("n"),
            round(col("rb0"), 6).as("b0"), round(col("rb1"), 6).as("b1"),
            round(col("rb2"), 6).as("b2"), round(col("rb3"), 6).as("b3"),
            round(col("rb4"), 6).as("b4"))
      },
      oracle = Some {
        val (chain, betaF) = irlsGroupedSql("f", "lang")
        s"""
        WITH $featuresSql,
        $chain
        SELECT lang, n, ROUND(b_0, 6) AS b0, ROUND(b_1, 6) AS b1,
               ROUND(b_2, 6) AS b2, ROUND(b_3, 6) AS b3, ROUND(b_4, 6) AS b4
        FROM $betaF"""
      }
    ),

    // ----------------------------------------------------------------
    // CALIBRATION READOUT — the reliability diagram every deployed
    // classifier ships with: holdout scores cut into deciles (ranked by
    // η through the RankSelect kernel + arithmetic NTILE — never a
    // single-task global sort), each decile reporting mean predicted
    // P(good) against the empirical good-rate. Decimal sums keep both
    // columns engine-exact; ties order on (η, doc_id) so the cut is
    // deterministic.
    "q270_logit_calibration" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
        val eta = etaCol(beta)
        val scored = all.where(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("y"), eta.as("eta"),
            (lit(1.0) / (lit(1.0) + exp(-eta))).as("mu"),
            lit("holdout").as("g"))
        RankSelect.withGroupRanks(scored, "g", "eta", tieBreak = Seq("doc_id"))
          .withColumn("decile", expr(RankSelect.ntileSql(10)))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(col("mu").cast(dt)).as("sp"),
            sum(col("y").cast(dt)).as("sy"))
          .select(col("decile"), col("n"),
            round(col("sp").cast("double") / col("n").cast("double"), 6).as("avg_p"),
            round(col("sy").cast("double") / col("n").cast("double"), 6).as("rate"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT doc_id, y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4),
        sm AS MATERIALIZED (
          SELECT doc_id, y, eta, 1.0 / (1.0 + exp(-eta)) AS mu FROM sc),
        rk AS MATERIALIZED (
          SELECT y, mu, NTILE(10) OVER (ORDER BY eta, doc_id) AS decile FROM sm)
        SELECT CAST(decile AS INT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(mu AS DECIMAL(38,10))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS avg_p,
               ROUND(CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS rate
        FROM rk GROUP BY decile"""
      }
    ),

    // ----------------------------------------------------------------
    // AVERAGE PRECISION — the PR-curve summary that completes the
    // holdout quartet (q265 AUC is threshold-free ranking, q270 is
    // calibration, q272 is the proper score; AP is what a CURATION user
    // reads, because precision-at-the-top is what survives the cut).
    // With a strict ordering (η desc, doc_id), AP = (1/P)·Σ_positives
    // r_pos/r_all where r_all is the positive's rank in the holdout and
    // r_pos its rank among positives — BOTH integers from two
    // RankSelect passes, so the only floating op is one exact division
    // per positive, decimal-summed order-free. No libm anywhere: this
    // evaluation is bit-exact cross-engine before the final ROUND.
    "q277_logit_avg_precision" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
        val scored = all.where(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("y"),
            (-etaCol(beta)).as("neg"), lit("holdout").as("g"))
        val ranked = RankSelect
          .withGroupRanks(scored, "g", "neg", tieBreak = Seq("doc_id"))
          .select(col("doc_id"), col("y"), col("neg"),
            col("__rk_rn").as("r_all"), col("__rk_n").as("n_holdout"),
            lit("p").as("g"))
        val pos = ranked.where(col("y") === 1.0)
        RankSelect.withGroupRanks(pos, "g", "neg", tieBreak = Seq("doc_id"))
          .agg(
            max(col("n_holdout")).as("n_holdout"),
            count(lit(1)).as("n_pos"),
            sum((col("__rk_rn").cast("double") / col("r_all").cast("double"))
              .cast(dt)).as("sap"))
          .where(col("n_pos") > 0)
          .select(col("n_holdout"), col("n_pos"),
            round(col("sap").cast("double") / col("n_pos").cast("double"), 6)
              .as("ap"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT doc_id, y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4),
        rk AS MATERIALIZED (
          SELECT doc_id, y,
                 CAST(ROW_NUMBER() OVER (ORDER BY eta DESC, doc_id) AS BIGINT) AS r_all
          FROM sc),
        pk AS MATERIALIZED (
          SELECT r_all,
                 CAST(ROW_NUMBER() OVER (ORDER BY r_all) AS BIGINT) AS r_pos
          FROM rk WHERE y = 1.0),
        nh AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_holdout FROM rk),
        ag AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
                 SUM(CAST(CAST(r_pos AS DOUBLE) / CAST(r_all AS DOUBLE)
                     AS DECIMAL(38,10))) AS sap
          FROM pk)
        SELECT nh.n_holdout, ag.n_pos,
               ROUND(CAST(sap AS DOUBLE) / CAST(n_pos AS DOUBLE), 6) AS ap
        FROM ag CROSS JOIN nh WHERE n_pos > 0"""
      }
    ),

    // ----------------------------------------------------------------
    // SOURCE QUALITY REPORT — the trained classifier turned into the
    // decision table a curation owner actually reads: per SOURCE, how
    // many documents, the model's mean P(good), the hard-decision keep
    // rate (η ≥ 0 — exact arithmetic), and the rule-gate label rate
    // for contrast. A source whose keep rate craters is the one you
    // drop from the crawl — this closes the loop from model (q263) to
    // pipeline action. Map-only scoring + ONE (source)-grain aggregate:
    // at 100 TB the report costs a scan.
    "q289_source_quality_report" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
        val eta = etaCol(beta)
        all.select(col("source"), col("y"), eta.as("eta"),
          (lit(1.0) / (lit(1.0) + exp(-eta))).as("mu"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("mu").cast(dt)).as("sp"),
            sum(when(col("eta") >= 0.0, 1L).otherwise(0L)).as("gp"),
            sum(col("y").cast(dt)).as("sy"))
          .select(col("source"), col("n"),
            round(col("sp").cast("double") / col("n").cast("double"), 6)
              .as("avg_p_good"),
            round(col("gp").cast("double") / col("n").cast("double"), 6)
              .as("keep_rate"),
            round(col("sy").cast("double") / col("n").cast("double"), 6)
              .as("label_rate"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT source, y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF),
        sm AS MATERIALIZED (
          SELECT source, y, eta, 1.0 / (1.0 + exp(-eta)) AS mu FROM sc)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(mu AS DECIMAL(38,10))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS avg_p_good,
               ROUND(CAST(SUM(CASE WHEN eta >= 0.0 THEN 1 ELSE 0 END) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate,
               ROUND(CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS label_rate
        FROM sm GROUP BY source"""
      }
    ),

    // ----------------------------------------------------------------
    // LEARNING CURVE — holdout AUC as a function of TRAINING SIZE: fit
    // on the first 1, 2, 3 and 4 folds, evaluate each model on the
    // same unseen fold 4. This is the readout that answers "do we need
    // more labels?" — a curve still rising at 4 folds says label more
    // data; a flat one says fix the features instead. All four models'
    // holdout scores rank in ONE RankSelect pass (group = model id),
    // so the evaluation costs one kernel invocation, not four; each
    // fit is the standard 3 × O(d²)-moment IRLS. 4-row output.
    "q287_learning_curve" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val scored = (1 to 4).map { k =>
          val train = all.where(col("doc_id") % 5 < k)
          val (beta, n) = irlsFit(train)
          all.where(col("doc_id") % 5 === 4)
            .select(lit(k).as("g"), lit(n).as("n_train"),
              col("y"), (-etaCol(beta)).as("neg"))
        }.reduce(_ unionByName _)
        val rk = RankSelect.withGroupRanks(scored, "g", "neg")
          .withColumn("r2",
            lit(2L) * col("__rk_rank") + col("__rk_ties") - lit(1L))
        // ranked by DESCENDING eta: positives-rank-low is the good
        // direction, so AUC = 1 − MannWhitney(neg) — equivalently swap
        // the roles; keep the q265 formula on the negated key and
        // subtract from 1 (exact integer arithmetic either way)
        rk.groupBy(col("g"))
          .agg(
            max(col("n_train")).as("n_train"),
            sum(when(col("y") === 1.0, col("r2")).otherwise(lit(0L))).as("s2"),
            sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("p"),
            sum(when(col("y") =!= 1.0, 1L).otherwise(0L)).as("nn"))
          .where(col("p") > 0 && col("nn") > 0)
          .select(col("g").as("train_folds"), col("n_train"),
            round(lit(1.0) -
              (col("s2") - col("p") * (col("p") + 1)).cast("double") /
                (lit(2L) * col("p") * col("nn")).cast("double"), 6).as("auc"))
      },
      oracle = Some {
        val chains = (1 to 4).map { k =>
          val (chain, betaF) = irlsSql(s"lcf$k", s"lc${k}_")
          (s"""lcf$k AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 < $k),
        $chain,
        lcs$k AS MATERIALIZED (
          SELECT $k AS g, (SELECT CAST(COUNT(*) AS BIGINT) FROM lcf$k) AS n_train,
                 y,
                 -(GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp)) AS neg
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4)""", s"lcs$k")
        }
        s"""
        WITH $featuresSql,
        ${chains.map(_._1).mkString(",\n        ")},
        lcu AS MATERIALIZED (
          ${chains.map(c => s"SELECT * FROM ${c._2}").mkString("\n          UNION ALL ")}),
        lcr AS MATERIALIZED (
          SELECT g, n_train, y,
                 2 * RANK() OVER (PARTITION BY g ORDER BY neg) +
                 COUNT(*) OVER (PARTITION BY g, neg) - 1 AS r2
          FROM lcu),
        lcm AS MATERIALIZED (
          SELECT g, MAX(n_train) AS n_train,
                 CAST(SUM(CASE WHEN y = 1.0 THEN r2 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
          FROM lcr GROUP BY g)
        SELECT CAST(g AS INT) AS train_folds, n_train,
               ROUND(1.0 - CAST(s2 - p * (p + 1) AS DOUBLE) /
                     CAST(2 * p * nn AS DOUBLE), 6) AS auc
        FROM lcm WHERE p > 0 AND nn > 0"""
      }
    ),

    // ----------------------------------------------------------------
    // MURPHY DECOMPOSITION — the q272 Brier score split into its three
    // named parts over the q270 decile binning (Murphy 1973):
    //   reliability  Σ nₖ(p̄ₖ−ȳₖ)²/N   how far predicted probability
    //                                   sits from observed frequency
    //   resolution   Σ nₖ(ȳₖ−ȳ)²/N    how much the bins separate the
    //                                   base rate (bigger = better)
    //   uncertainty  ȳ(1−ȳ)            the data's irreducible floor
    // with the exact identity binned_brier = rel − res + unc (gated:
    // all four numbers come from the same decimal decile frame, so the
    // identity holds to the decimal quantum — BrierSpec asserts it).
    // This is the readout that tells a pipeline WHERE a bad Brier comes
    // from: miscalibration (fix with q270-style recalibration) or no
    // resolution (fix the features). Same scale shape as q270: one
    // rank-kernel pass, a 10-row decile frame, O(1) reductions.
    "q286_brier_decomposition" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
        val eta = etaCol(beta)
        val scored = all.where(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("y"), eta.as("eta"),
            (lit(1.0) / (lit(1.0) + exp(-eta))).as("mu"),
            lit("holdout").as("g"))
        val dec = RankSelect
          .withGroupRanks(scored, "g", "eta", tieBreak = Seq("doc_id"))
          .withColumn("decile", expr(RankSelect.ntileSql(10)))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("nk"),
            sum(col("mu").cast(dt)).as("sp"),
            sum(col("y").cast(dt)).as("sy"))
          .select(col("nk"),
            (col("sp").cast("double") / col("nk").cast("double")).as("pk"),
            (col("sy").cast("double") / col("nk").cast("double")).as("yk"),
            col("sy"))
        val tot = dec.agg(sum(col("nk")).as("n"), sum(col("sy")).as("ty"))
        dec.crossJoin(broadcast(tot))
          .select(col("nk"), col("pk"), col("yk"), col("n"),
            (col("ty").cast("double") / col("n").cast("double")).as("yb"))
          .agg(
            max(col("n")).as("rn"),
            sum((col("nk").cast("double") *
              ((col("pk") - col("yk")) * (col("pk") - col("yk")))).cast(dt)).as("srel"),
            sum((col("nk").cast("double") *
              ((col("yk") - col("yb")) * (col("yk") - col("yb")))).cast(dt)).as("sres"),
            max(col("yb")).as("yb"))
          .select(col("rn").as("n"),
            round(col("srel").cast("double") / col("rn").cast("double"), 6)
              .as("reliability"),
            round(col("sres").cast("double") / col("rn").cast("double"), 6)
              .as("resolution"),
            round(col("yb") * (lit(1.0) - col("yb")), 6).as("uncertainty"),
            round(col("srel").cast("double") / col("rn").cast("double") -
              col("sres").cast("double") / col("rn").cast("double") +
              col("yb") * (lit(1.0) - col("yb")), 6).as("binned_brier"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT doc_id, y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4),
        sm AS MATERIALIZED (
          SELECT doc_id, y, eta, 1.0 / (1.0 + exp(-eta)) AS mu FROM sc),
        rk AS MATERIALIZED (
          SELECT y, mu, NTILE(10) OVER (ORDER BY eta, doc_id) AS decile FROM sm),
        db AS MATERIALIZED (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS nk,
                 SUM(CAST(mu AS DECIMAL(38,10))) AS sp,
                 SUM(CAST(y AS DECIMAL(38,10))) AS sy
          FROM rk GROUP BY decile),
        dd AS MATERIALIZED (
          SELECT nk,
                 CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) AS pk,
                 CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE) AS yk,
                 sy
          FROM db),
        tt AS MATERIALIZED (
          SELECT CAST(SUM(nk) AS BIGINT) AS n, SUM(sy) AS ty FROM dd),
        ag AS MATERIALIZED (
          SELECT MAX(n) AS rn,
                 SUM(CAST(CAST(nk AS DOUBLE)
                     * ((pk - yk) * (pk - yk)) AS DECIMAL(38,10))) AS srel,
                 SUM(CAST(CAST(nk AS DOUBLE)
                     * ((yk - yb) * (yk - yb)) AS DECIMAL(38,10))) AS sres,
                 MAX(yb) AS yb
          FROM (SELECT dd.*, tt.n,
                       CAST(tt.ty AS DOUBLE) / CAST(tt.n AS DOUBLE) AS yb
                FROM dd CROSS JOIN tt))
        SELECT rn AS n,
               ROUND(CAST(srel AS DOUBLE) / CAST(rn AS DOUBLE), 6) AS reliability,
               ROUND(CAST(sres AS DOUBLE) / CAST(rn AS DOUBLE), 6) AS resolution,
               ROUND(yb * (1.0 - yb), 6) AS uncertainty,
               ROUND(CAST(srel AS DOUBLE) / CAST(rn AS DOUBLE)
                     - CAST(sres AS DOUBLE) / CAST(rn AS DOUBLE)
                     + yb * (1.0 - yb), 6) AS binned_brier
        FROM ag"""
      }
    ),

    // ----------------------------------------------------------------
    // HOLDOUT EVALUATION — fit on folds 0-3 (doc_id % 5 ≠ 4), score the
    // unseen fold 4, and measure ranking quality as the Mann-Whitney
    // AUC from integer midranks (the q241 doubling: 2·rank + ties − 1),
    // ranked by η (monotone in μ, no exp near the ranks). The ranks
    // ride RankSelect.withGroupRanks — even a single evaluation group
    // never sorts in one task at scale.
    "q265_logit_holdout_auc" -> QueryDef(
      fn = (s, d) => {
        val all = graft.CacheLeases.lease(docFeatures(s, d).persist())
        val (beta, _) = irlsFit(all.where(col("doc_id") % 5 =!= 4))
        val scored = all.where(col("doc_id") % 5 === 4)
          .select(col("y"), etaCol(beta).as("eta"), lit("holdout").as("g"))
        val rk = RankSelect.withGroupRanks(scored, "g", "eta")
          .withColumn("r2",
            lit(2L) * col("__rk_rank") + col("__rk_ties") - lit(1L))
        rk.groupBy(col("g")).agg(
            sum(when(col("y") === 1.0, col("r2")).otherwise(lit(0L))).as("s2"),
            sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("p"),
            sum(when(col("y") =!= 1.0, 1L).otherwise(0L)).as("nn"))
          .where(col("p") > 0 && col("nn") > 0)
          .select(col("p").as("n_good"), col("nn").as("n_bad"),
            round((col("s2") - col("p") * (col("p") + 1)).cast("double") /
              (lit(2L) * col("p") * col("nn")).cast("double"), 6).as("auc"))
      },
      oracle = Some {
        val (chain, betaF) = irlsSql("ftr")
        s"""
        WITH $featuresSql,
        ftr AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 5 <> 4),
        $chain,
        sc AS MATERIALIZED (
          SELECT y,
                 GREATEST(LEAST(b_0 + b_1 * x1 + b_2 * x2 + b_3 * x3 + b_4 * x4,
                   $EtaClamp), -$EtaClamp) AS eta
          FROM f CROSS JOIN $betaF
          WHERE doc_id % 5 = 4),
        rk AS MATERIALIZED (
          SELECT y, 2 * RANK() OVER (ORDER BY eta) +
                 COUNT(*) OVER (PARTITION BY eta) - 1 AS r2
          FROM sc),
        mm AS MATERIALIZED (
          SELECT CAST(SUM(CASE WHEN y = 1.0 THEN r2 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS nn
          FROM rk)
        SELECT p AS n_good, nn AS n_bad,
               ROUND(CAST(s2 - p * (p + 1) AS DOUBLE) /
                     CAST(2 * p * nn AS DOUBLE), 6) AS auc
        FROM mm WHERE p > 0 AND nn > 0"""
      }
    )
  )
}
