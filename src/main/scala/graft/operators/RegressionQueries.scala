package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DISTRIBUTED MULTIVARIATE OLS — the model-fitting step the reference
  * prepares for but never executes: `update_ml_features.py:29-166`
  * assembles demand-forecast features and stubs `forecast_accuracy` to
  * NULL (:150), leaving the actual fit to some absent downstream
  * system. Here the fit is a first-class distributed operator.
  *
  * Shape (the only one that survives 100 TB): OLS over n rows and d
  * features needs ONLY the d²-bounded normal-equation moments
  * (XᵀX, Xᵀy) — an additive, map-side-combinable aggregation, exactly
  * like the q178 Gram matrix. So the plan is
  *
  *   rows → broadcast dim join → per-group moment sums (10 decimals,
  *   O(groups) shuffle) → closed-form 3×3 Cramer solve on the reduced
  *   side → (optionally) broadcast the O(groups) coefficients back and
  *   score every row with zero additional shuffle.
  *
  * Nothing here ever materializes X, collects rows to the driver, or
  * iterates: the fit is one pass, the apply is embarrassingly parallel.
  * The same moments also yield the diagnostics (R², RMSE) closed-form,
  * and — because moment sums are additive DECIMAL state — the fit has a
  * maintained-index twin (q207) via the q176 MV-merge pattern: a daily
  * 100 TB refresh pays O(day) to re-aggregate the delta moments, never
  * O(history), and refits from KB-scale merged state.
  *
  * Determinism contract (the q190 rules): products are IEEE-exact
  * double ops, each moment is summed as DECIMAL(38,10) (exact,
  * order-independent), and every reduced-side double expression pins
  * its parenthesization identically in the Scala plan and the DuckDB
  * oracle text.
  *
  * Model: per part brand, quantity ~ b0 + b1·discount + b2·retailprice
  * (price-elasticity-of-demand, the canonical bakery question the
  * reference's feature tables exist to answer).
  */
object RegressionQueries extends QueryModule {

  import Tables._

  private val dt = DecimalType(38, 10)

  /** Observation rows: lineitem ⋈ broadcast(part), one row per line. */
  private def olsRows(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("brand"),
        col("l_discount").as("x1"),
        col("p_retailprice").as("x2"),
        col("l_quantity").as("y"),
        col("l_orderkey").as("k"),
        col("l_linenumber").as("ln"))

  /** The 10 normal-equation moments per group — the ONLY state the fit
    * needs, shuffled as O(groups)·10 decimals with map-side combine.
    */
  private def aggMoments(rows: DataFrame, keys: Seq[String] = Seq("brand")): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("x1").cast(dt)).as("s1"),
      sum(col("x2").cast(dt)).as("s2"),
      sum(col("y").cast(dt)).as("sy"),
      sum((col("x1") * col("x1")).cast(dt)).as("s11"),
      sum((col("x2") * col("x2")).cast(dt)).as("s22"),
      sum((col("x1") * col("x2")).cast(dt)).as("s12"),
      sum((col("x1") * col("y")).cast(dt)).as("s1y"),
      sum((col("x2") * col("y")).cast(dt)).as("s2y"),
      sum((col("y") * col("y")).cast(dt)).as("syy"))

  private def D(c: String): Column = col(c).cast("double")

  private val momentCols =
    Seq("n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")

  /** Stage lineitem as 3 mtime-ordered slice files (orderkey thirds —
    * additive moment state needs no chronology, only a deterministic
    * partition the oracle's one-shot aggregate is invariant to).
    */
  private def stageLineitemSlices(s: SparkSession, d: String): String =
    graft.sources.SliceStager.stage(
      "graft_stream_li_slices",
      java.nio.file.Paths.get(d, "lineitem.parquet"),
      slices = 3,
      g => lineitem(s, d).where(pmod(col("l_orderkey"), lit(3)) === g))

  /** Closed-form 3×3 Cramer solve of the normal equations A·b = c with
    *   A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],  c = [sy,s1y,s2y].
    * Cofactor expansion along the first row, parenthesization pinned to
    * the oracle text term for term. Parameterized over the moment
    * columns so the ridge (s11+λ, s22+λ) and CV (train = total − fold)
    * variants reuse the identical pinned solve.
    */
  private def cramerCols(
      n: Column, s1: Column, s2: Column, sy: Column,
      s11: Column, s22: Column, s12: Column,
      s1y: Column, s2y: Column): (Column, Column, Column) = {
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    (det0 / det, det1 / det, det2 / det)
  }

  /** SQL mirror of [[cramerCols]] — emits (b0, b1, b2) expression text
    * over the given operand texts, same cofactor structure.
    */
  private def cramerSql(
      n: String, s1: String, s2: String, sy: String,
      s11: String, s22: String, s12: String,
      s1y: String, s2y: String): (String, String, String) = {
    val det = s"($n * ($s11 * $s22 - $s12 * $s12) - " +
      s"$s1 * ($s1 * $s22 - $s12 * $s2) + $s2 * ($s1 * $s12 - $s11 * $s2))"
    val det0 = s"($sy * ($s11 * $s22 - $s12 * $s12) - " +
      s"$s1 * ($s1y * $s22 - $s12 * $s2y) + $s2 * ($s1y * $s12 - $s11 * $s2y))"
    val det1 = s"($n * ($s1y * $s22 - $s12 * $s2y) - " +
      s"$sy * ($s1 * $s22 - $s12 * $s2) + $s2 * ($s1 * $s2y - $s1y * $s2))"
    val det2 = s"($n * ($s11 * $s2y - $s1y * $s12) - " +
      s"$s1 * ($s1 * $s2y - $s1y * $s2) + $sy * ($s1 * $s12 - $s11 * $s2))"
    (s"$det0 / $det", s"$det1 / $det", s"$det2 / $det")
  }

  private def withCoefficients(m: DataFrame): DataFrame = {
    val (b0, b1, b2) = cramerCols(
      col("n").cast("double"), D("s1"), D("s2"), D("sy"),
      D("s11"), D("s22"), D("s12"), D("s1y"), D("s2y"))
    m.withColumn("b0", b0).withColumn("b1", b1).withColumn("b2", b2)
  }

  private def fitOutput(m: DataFrame): DataFrame =
    withCoefficients(m).select(
      col("brand"), col("n"),
      round(col("b0"), 6).as("b0"),
      round(col("b1"), 6).as("b1"),
      round(col("b2"), 6).as("b2"))

  /** Shared oracle CTE text: observation rows + moments; `where` is an
    * optional row predicate (the unlearning oracle fits on the
    * surviving rows only).
    */
  private def momentsSqlWhere(where: String): String = s"""
        r AS MATERIALIZED (
          SELECT p_brand AS brand, l_discount AS x1, p_retailprice AS x2,
                 l_quantity AS y, l_orderkey AS k, l_linenumber AS ln
          FROM lineitem JOIN part ON l_partkey = p_partkey$where),
        m AS MATERIALIZED (
          SELECT brand, COUNT(*) AS n,
                 SUM(CAST(x1 AS DECIMAL(38,10))) AS s1,
                 SUM(CAST(x2 AS DECIMAL(38,10))) AS s2,
                 SUM(CAST(y AS DECIMAL(38,10))) AS sy,
                 SUM(CAST(x1 * x1 AS DECIMAL(38,10))) AS s11,
                 SUM(CAST(x2 * x2 AS DECIMAL(38,10))) AS s22,
                 SUM(CAST(x1 * x2 AS DECIMAL(38,10))) AS s12,
                 SUM(CAST(x1 * y AS DECIMAL(38,10))) AS s1y,
                 SUM(CAST(x2 * y AS DECIMAL(38,10))) AS s2y,
                 SUM(CAST(y * y AS DECIMAL(38,10))) AS syy
          FROM r GROUP BY brand)"""

  private val momentsSql = momentsSqlWhere("")

  /** Oracle mirror of [[withCoefficients]] — doubles derived from the
    * decimal moments, Cramer terms pinned to the Scala expressions.
    */
  private val coefSql = """
        c AS MATERIALIZED (
          SELECT brand, n,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                 CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
                 CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
                 CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
                 CAST(syy AS DOUBLE) AS syy
          FROM m),
        f AS MATERIALIZED (
          SELECT brand, n, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
                 (sy * (s11 * s22 - s12 * s12) -
                  s1 * (s1y * s22 - s12 * s2y) +
                  s2 * (s1y * s12 - s11 * s2y)) /
                 (nd * (s11 * s22 - s12 * s12) -
                  s1 * (s1 * s22 - s12 * s2) +
                  s2 * (s1 * s12 - s11 * s2)) AS b0,
                 (nd * (s1y * s22 - s12 * s2y) -
                  sy * (s1 * s22 - s12 * s2) +
                  s2 * (s1 * s2y - s1y * s2)) /
                 (nd * (s11 * s22 - s12 * s12) -
                  s1 * (s1 * s22 - s12 * s2) +
                  s2 * (s1 * s12 - s11 * s2)) AS b1,
                 (nd * (s11 * s2y - s1y * s12) -
                  s1 * (s1 * s2y - s1y * s2) +
                  sy * (s1 * s12 - s11 * s2)) /
                 (nd * (s11 * s22 - s12 * s12) -
                  s1 * (s1 * s22 - s12 * s2) +
                  s2 * (s1 * s12 - s11 * s2)) AS b2
          FROM c)"""

  // ------------------------------------------------------------------
  // GENERAL-d NORMAL-EQUATION SOLVER (q222) — the 3×3 Cramer solve
  // does not scale past a few features; the general path is Gaussian
  // elimination on the (d+1)² normal matrix. Determinism across two
  // engines is achieved by GENERATION: one shared step program (a DAG
  // of binary double ops) is interpreted twice — over driver-side
  // doubles on the collected O(groups·d²) moment state (the
  // q179-eigensolve discipline: reduce distributed, solve local on
  // dimension-bounded state), and as a level-batched MATERIALIZED-CTE
  // chain forming the DuckDB oracle. Both sides therefore execute the
  // IDENTICAL op sequence; nothing is hand-pinned. No pivoting: XᵀX of
  // a full-rank design is positive definite, so the pivots are
  // positive by construction.

  /** One binary double op: `name = a <op> b` over prior names. */
  private[operators] final case class EStep(name: String, op: String, a: String, b: String)

  /** Forward elimination + back substitution over the augmented
    * (d+1)×(d+2) system; entry names `a_i_j` (j = d+1 is the RHS).
    * Returns the step program; solutions land in names `b_0..b_d`.
    */
  private[operators] def eliminationProgram(d: Int): Vector[EStep] = {
    val steps = Vector.newBuilder[EStep]
    var cur = Map.empty[(Int, Int), String] // live name of entry (i, j)
    for (i <- 0 to d; j <- 0 to d + 1) cur += (i, j) -> s"a_${i}_$j"
    for (k <- 0 to d; i <- k + 1 to d) {
      val f = s"f_${i}_$k"
      steps += EStep(f, "/", cur(i -> k), cur(k -> k))
      for (j <- k + 1 to d + 1) {
        val t = s"t_${i}_${j}_$k"
        steps += EStep(t, "*", f, cur(k -> j))
        val u = s"u_${i}_${j}_$k"
        steps += EStep(u, "-", cur(i -> j), t)
        cur += (i -> j) -> u
      }
    }
    for (i <- d to 0 by -1) {
      var acc = cur(i -> (d + 1))
      for (j <- i + 1 to d) {
        val p = s"p_${i}_$j"
        steps += EStep(p, "*", cur(i -> j), s"b_$j")
        val r = s"r_${i}_$j"
        steps += EStep(r, "-", acc, p)
        acc = r
      }
      steps += EStep(s"b_$i", "/", acc, cur(i -> i))
    }
    steps.result()
  }

  /** Interpret the program over doubles (the Spark-side solve). */
  private[operators] def runProgram(steps: Vector[EStep], init: Map[String, Double]): Map[String, Double] =
    steps.foldLeft(init) { (env, s) =>
      val (a, b) = (env(s.a), env(s.b))
      env + (s.name -> (s.op match {
        case "/" => a / b
        case "*" => a * b
        case "-" => a - b
      }))
    }

  /** Emit the program as a chain of MATERIALIZED CTEs over `src` —
    * steps batched by dependency level so every expression references
    * only prior CTEs (a same-SELECT alias is illegal in SQL). `pfx`
    * namespaces the CTE names so several programs can share one WITH
    * clause (the rank-4 ALS runs three solves in one oracle).
    */
  private[operators] def programSql(
      steps: Vector[EStep], src: String, pfx: String = "e"): (String, String) = {
    var level = Map.empty[String, Int]
    val batched = steps.map { s =>
      val l = 1 + math.max(level.getOrElse(s.a, 0), level.getOrElse(s.b, 0))
      level += s.name -> l
      (l, s)
    }
    val ctes = batched.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, ss) =>
      val cols = ss.map { case (_, s) => s"(${s.a} ${s.op} ${s.b}) AS ${s.name}" }
      s"$pfx$l AS MATERIALIZED (SELECT *, ${cols.mkString(", ")} FROM ${if (l == 1) src else s"$pfx${l - 1}"})"
    }
    (ctes.mkString(",\n        "), s"$pfx${batched.map(_._1).max}")
  }

  /** Interpret the program as Spark Column expressions — the THIRD
    * interpretation (after driver doubles and DuckDB CTE text), for
    * solves that must stay DISTRIBUTED because the system count is
    * entity-grain (rank-r ALS: one r×r solve per user/item). The same
    * step DAG evaluated as one projection; shared subexpressions are
    * shared Column refs, and both engines execute the identical IEEE
    * op sequence, so results stay bit-deterministic cross-engine.
    */
  private[operators] def programColumns(
      steps: Vector[EStep], init: Map[String, Column]): Map[String, Column] =
    steps.foldLeft(init) { (env, s) =>
      env + (s.name -> (s.op match {
        case "/" => env(s.a) / env(s.b)
        case "*" => env(s.a) * env(s.b)
        case "-" => env(s.a) - env(s.b)
      }))
    }

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // OUT-OF-FOLD TARGET ENCODING — the leakage-controlled categorical
    // encoder every tabular pipeline builds before a model sees a
    // high-cardinality key: a row's brand is encoded by the mean target
    // of OTHER folds' rows of that brand (fold = (k + ln) % 5, the
    // q281 convention), so the encoding never contains the row's own
    // label; the smoothed variant shrinks rare brands toward the
    // global mean (m = 20 pseudo-observations — standard empirical-
    // Bayes smoothing). Exact arithmetic throughout: fold sums are
    // DECIMAL, out-of-fold sums are decimal SUBTRACTIONS (total −
    // own-fold, the q217 unlearning trick — never a second scan), and
    // the divisions are single IEEE ops. At 100 TB: ONE map-side-
    // combined (brand, fold)-grain aggregate, an O(brands) rollup, a
    // 1-row broadcast — the encoder table is O(brands × folds) and
    // broadcasts back to score rows with zero extra shuffle.
    "q285_target_encode_oof" -> QueryDef(
      fn = (s, d) => {
        val bf = olsRows(s, d)
          .withColumn("fold", ((col("k") + col("ln")) % 5).cast("int"))
          .groupBy(col("brand"), col("fold"))
          .agg(sum(col("y").cast(dt)).as("sy"), count(lit(1)).as("n"))
        val tot = bf.groupBy(col("brand"))
          .agg(sum(col("sy")).as("ty"), sum(col("n")).as("tn"))
        val gm = tot.agg((sum(col("ty")).cast("double") /
          sum(col("tn")).cast("double")).as("gmean"))
        val oofS = (col("ty") - col("sy")).cast("double")
        val oofN = (col("tn") - col("n")).cast("double")
        // the O(brands) rollup is broadcast EXPLICITLY (the q77 lesson:
        // leaving a provably-tiny side to AQE makes the plan — and the
        // bench's shuffle bytes — flip with runtime size estimates)
        bf.join(broadcast(tot), "brand")
          .crossJoin(broadcast(gm))
          .where(col("tn") > col("n"))
          .select(col("brand"), col("fold"), col("n"),
            round(oofS / oofN, 6).as("oof_mean"),
            round((oofS + lit(20.0) * col("gmean")) / (oofN + lit(20.0)), 6)
              .as("te_smooth"))
      },
      oracle = Some("""
        WITH te_r AS MATERIALIZED (
          SELECT p_brand AS brand, l_quantity AS y,
                 CAST((l_orderkey + l_linenumber) % 5 AS INT) AS fold
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        te_bf AS MATERIALIZED (
          SELECT brand, fold, SUM(CAST(y AS DECIMAL(38,10))) AS sy,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM te_r GROUP BY brand, fold),
        te_tot AS MATERIALIZED (
          SELECT brand, SUM(sy) AS ty, CAST(SUM(n) AS BIGINT) AS tn
          FROM te_bf GROUP BY brand),
        te_gm AS MATERIALIZED (
          SELECT CAST(SUM(ty) AS DOUBLE) / CAST(SUM(tn) AS DOUBLE) AS gmean
          FROM te_tot)
        SELECT brand, fold, n,
               ROUND(CAST(ty - sy AS DOUBLE) / CAST(tn - n AS DOUBLE), 6) AS oof_mean,
               ROUND((CAST(ty - sy AS DOUBLE) + 20.0 * gmean)
                     / (CAST(tn - n AS DOUBLE) + 20.0), 6) AS te_smooth
        FROM te_bf JOIN te_tot USING (brand) CROSS JOIN te_gm
        WHERE tn > n""")
    ),

    // ----------------------------------------------------------------
    // MULTIVARIATE OLS FIT — per-brand price-elasticity model from one
    // moment-sum pass. The shuffle carries 10 decimals + a count per
    // brand (O(groups), never O(rows)); the 3×3 solve happens on the
    // already-reduced frame. At 100 TB the plan is identical: the scan
    // dominates, the state does not grow.
    "q204_ols_fit" -> QueryDef(
      fn = (s, d) => fitOutput(aggMoments(olsRows(s, d))),
      oracle = Some(s"""
        WITH $momentsSql, $coefSql
        SELECT brand, n,
               ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2
        FROM f""")
    ),

    // ----------------------------------------------------------------
    // MODEL APPLY — the O(groups) coefficient frame broadcasts back to
    // the observation rows and every row is scored in place: predicted
    // quantity + residual with ZERO extra shuffle beyond the moment
    // pass that produced the model. This is the inference path a
    // 100 TB corpus actually runs nightly; it is a map-only stage.
    "q205_ols_score" -> QueryDef(
      fn = (s, d) => {
        val rows = olsRows(s, d)
        val coefs = withCoefficients(aggMoments(rows))
          .select(col("brand"), col("b0"), col("b1"), col("b2"))
        val pred = (col("b0") + col("x1") * col("b1")) + col("x2") * col("b2")
        rows.join(broadcast(coefs), Seq("brand"))
          .select(
            col("k").as("l_orderkey"),
            col("ln").as("l_linenumber"),
            col("brand"),
            round(pred, 6).as("pred"),
            round(col("y") - pred, 6).as("resid"))
      },
      oracle = Some(s"""
        WITH $momentsSql, $coefSql
        SELECT r.k AS l_orderkey, r.ln AS l_linenumber, r.brand,
               ROUND((b0 + x1 * b1) + x2 * b2, 6) AS pred,
               ROUND(y - ((b0 + x1 * b1) + x2 * b2), 6) AS resid
        FROM r JOIN f ON r.brand = f.brand""")
    ),

    // ----------------------------------------------------------------
    // FIT DIAGNOSTICS — R² and RMSE per brand, closed-form from the
    // SAME moments (SSE = Σy² − bᵀXᵀy, SST = Σy² − (Σy)²/n): no second
    // data pass, no residual materialization. The reference's stubbed
    // `forecast_accuracy` column (update_ml_features.py:150) is exactly
    // this number.
    "q206_ols_diagnostics" -> QueryDef(
      fn = (s, d) => {
        val f = withCoefficients(aggMoments(olsRows(s, d)))
        val n = col("n").cast("double")
        val sse = D("syy") -
          ((col("b0") * D("sy") + col("b1") * D("s1y")) + col("b2") * D("s2y"))
        val sst = D("syy") - (D("sy") * D("sy")) / n
        f.select(
          col("brand"), col("n"),
          round(lit(1.0) - sse / sst, 6).as("r2"),
          round(sqrt(greatest(sse, lit(0.0)) / n), 6).as("rmse"))
      },
      oracle = Some(s"""
        WITH $momentsSql, $coefSql
        SELECT brand, n,
               ROUND(1.0 - (syy - ((b0 * sy + b1 * s1y) + b2 * s2y)) /
                           (syy - (sy * sy) / nd), 6) AS r2,
               ROUND(SQRT(GREATEST(syy - ((b0 * sy + b1 * s1y) + b2 * s2y),
                                   0.0) / nd), 6) AS rmse
        FROM (SELECT f.*, CAST(n AS DOUBLE) AS nd FROM f)""")
    ),

    // ----------------------------------------------------------------
    // MAINTAINED MODEL STATE — the q176 MV-merge pattern applied to the
    // normal-equation moments: four ingest batches each aggregate ONLY
    // their own rows' moments (O(batch) work) and merge into the stored
    // per-brand state by decimal addition; the final fit solves from
    // the merged KB-scale table. Gated against the one-shot q204 SQL,
    // which IS the incremental ≡ recompute proof. At 100 TB: a daily
    // refresh pays O(day), the refit pays O(brands), history is never
    // re-read.
    "q207_ols_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q207_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          val rows = olsRows(s, d)
          for (b <- 0 until 4) {
            val batch = aggMoments(rows.where(col("k") % 4 === b))
            val merged =
              if (wh.exists("gold", "mv_ols_moments"))
                wh.load("gold", "mv_ols_moments").unionByName(batch)
                  .groupBy(col("brand"))
                  .agg(
                    sum(col("n")).as("n"),
                    sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
                    sum(col("sy")).as("sy"), sum(col("s11")).as("s11"),
                    sum(col("s22")).as("s22"), sum(col("s12")).as("s12"),
                    sum(col("s1y")).as("s1y"), sum(col("s2y")).as("s2y"),
                    sum(col("syy")).as("syy"))
              else batch
            wh.overwrite(merged, "gold", "mv_ols_moments")
          }
          // pin the O(brands) result so the temp warehouse can be
          // deleted before the caller materializes
          fitOutput(
            wh.load("gold", "mv_ols_moments")
              .select(col("brand"), col("n").cast("long").as("n"),
                col("s1").cast(dt).as("s1"), col("s2").cast(dt).as("s2"),
                col("sy").cast(dt).as("sy"), col("s11").cast(dt).as("s11"),
                col("s22").cast(dt).as("s22"), col("s12").cast(dt).as("s12"),
                col("s1y").cast(dt).as("s1y"), col("s2y").cast(dt).as("s2y"),
                col("syy").cast(dt).as("syy")))
            .localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(s"""
        WITH $momentsSql, $coefSql
        SELECT brand, n,
               ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2
        FROM f""")
    ),

    // ----------------------------------------------------------------
    // GENERAL-d OLS VIA GENERATED GAUSSIAN ELIMINATION — see the
    // eliminationProgram scaladoc. Five-coefficient demand model
    // (intercept, discount, retailprice, size, tax); the distributed
    // pass is ONE moment aggregation (21 decimal sums per brand); the
    // solve runs on the collected O(brands·d²) state — 25 rows × 21
    // doubles, the q179 "solve local on dimension-bounded state"
    // discipline — and the oracle executes the very same generated op
    // sequence as ~30 level-batched MATERIALIZED CTEs.
    "q222_ols_gauss_d4" -> QueryDef(
      fn = (s, d) => {
        import s.implicits._
        // spread the fact scan before the 26-decimal-column moment
        // aggregate (round 14, guide §2.6): the sf0.1 scan is 3 row
        // groups, so the whole pass ran on 3 of 32 cores (5.7 s task
        // sum on 3 tasks); one keyed exchange buys full parallelism
        // and the decimal sums are order-independent
        val rows = lineitem(s, d)
          .repartition(s.sparkContext.defaultParallelism,
            col("l_orderkey"), col("l_linenumber"))
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            lit(1.0).as("x0"), col("l_discount").as("x1"),
            col("p_retailprice").as("x2"),
            col("p_size").cast("double").as("x3"), col("l_tax").as("x4"),
            col("l_quantity").as("y"))
        def f(i: Int) = if (i == 5) col("y") else col(s"x$i")
        val moments = for { i <- 0 to 4; j <- i to 5 }
          yield sum((f(i) * f(j)).cast(dt)).cast("double").as(s"m_${i}_$j")
        val m = rows.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"), moments: _*)
        val steps = eliminationProgram(4)
        val solved = m.collect().toSeq.map { row =>
          val init = (for { i <- 0 to 4; j <- 0 to 5 } yield {
            val src = if (j == 5) s"m_${i}_5" else s"m_${math.min(i, j)}_${math.max(i, j)}"
            s"a_${i}_$j" -> row.getAs[Double](src)
          }).toMap
          val env = runProgram(steps, init)
          (row.getAs[String]("brand"), row.getAs[Long]("n"),
            env("b_0"), env("b_1"), env("b_2"), env("b_3"), env("b_4"))
        }
        solved.toDF("brand", "n", "rb0", "rb1", "rb2", "rb3", "rb4")
          .select(col("brand"), col("n"),
            round(col("rb0"), 6).as("b0"), round(col("rb1"), 6).as("b1"),
            round(col("rb2"), 6).as("b2"), round(col("rb3"), 6).as("b3"),
            round(col("rb4"), 6).as("b4"))
      },
      oracle = Some {
        val momentSql = (for { i <- 0 to 4; j <- i to 5 } yield {
          val a = if (i == 5) "y" else s"x$i"
          val b = if (j == 5) "y" else s"x$j"
          s"CAST(SUM(CAST($a * $b AS DECIMAL(38,10))) AS DOUBLE) AS m_${i}_$j"
        }).mkString(",\n                 ")
        val aliases = (for { i <- 0 to 4; j <- 0 to 5 } yield {
          val src = if (j == 5) s"m_${i}_5" else s"m_${math.min(i, j)}_${math.max(i, j)}"
          s"$src AS a_${i}_$j"
        }).mkString(", ")
        val (ctes, last) = programSql(eliminationProgram(4), "a0")
        s"""
        WITH rf AS MATERIALIZED (
          SELECT p_brand AS brand, 1.0 AS x0, l_discount AS x1,
                 p_retailprice AS x2, CAST(p_size AS DOUBLE) AS x3,
                 l_tax AS x4, l_quantity AS y
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        md AS MATERIALIZED (
          SELECT brand, COUNT(*) AS n,
                 $momentSql
          FROM rf GROUP BY brand),
        a0 AS MATERIALIZED (SELECT brand, n, $aliases FROM md),
        $ctes
        SELECT brand, n,
               ROUND(b_0, 6) AS b0, ROUND(b_1, 6) AS b1,
               ROUND(b_2, 6) AS b2, ROUND(b_3, 6) AS b3,
               ROUND(b_4, 6) AS b4
        FROM $last"""
      }
    ),

    // ----------------------------------------------------------------
    // STREAMING MODEL MAINTENANCE — q207's nightly moment refresh as
    // real micro-batches: lineitem rows arrive as 3 mtime-ordered
    // slices (orderkey thirds — moments are ADDITIVE, so unlike the
    // forecast state no arrival order is required at all) and each
    // foreachBatch aggregates ITS rows' moments and decimal-sums them
    // into the stored table; the fit re-solves from the KB-scale
    // merged state. The OLS family thereby has the same batch +
    // streaming maintenance pair as bands (q189/q202), postings
    // (q187/q203) and forecast state (q210/q212). Gated against the
    // one-shot q204 SQL.
    "q216_stream_model_maintenance" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files.createTempDirectory("graft_q216_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            val stream = s.readStream
              .schema(lineitem(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(stageLineitemSlices(s, d))
            val pt = part(s, d)
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                  val rows = batch.toDF()
                    .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
                    .select(
                      col("p_brand").as("brand"),
                      col("l_discount").as("x1"),
                      col("p_retailprice").as("x2"),
                      col("l_quantity").as("y"),
                      col("l_orderkey").as("k"),
                      col("l_linenumber").as("ln"))
                  val bm = aggMoments(rows)
                  val merged =
                    if (wh.exists("gold", "mv_stream_ols_moments"))
                      wh.load("gold", "mv_stream_ols_moments").unionByName(bm)
                        .groupBy(col("brand"))
                        .agg(
                          sum(col("n")).as("n"),
                          sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
                          sum(col("sy")).as("sy"), sum(col("s11")).as("s11"),
                          sum(col("s22")).as("s22"), sum(col("s12")).as("s12"),
                          sum(col("s1y")).as("s1y"), sum(col("s2y")).as("s2y"),
                          sum(col("syy")).as("syy"))
                    else bm
                  wh.overwrite(merged, "gold", "mv_stream_ols_moments")
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            fitOutput(
              wh.load("gold", "mv_stream_ols_moments")
                .select(col("brand"), col("n").cast("long").as("n"),
                  col("s1").cast(dt).as("s1"), col("s2").cast(dt).as("s2"),
                  col("sy").cast(dt).as("sy"), col("s11").cast(dt).as("s11"),
                  col("s22").cast(dt).as("s22"), col("s12").cast(dt).as("s12"),
                  col("s1y").cast(dt).as("s1y"), col("s2y").cast(dt).as("s2y"),
                  col("syy").cast(dt).as("syy")))
              .localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some(s"""
        WITH $momentsSql, $coefSql
        SELECT brand, n,
               ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2
        FROM f""")
    ),

    // ----------------------------------------------------------------
    // EXACT MODEL UNLEARNING — the GDPR-erasure story (q132) extended
    // to MODEL STATE: when a customer's rows must be forgotten, a
    // linear model maintained as moment sums can subtract their
    // contribution EXACTLY (decimal arithmetic has no catastrophic
    // cancellation) and refit from the corrected KB-scale state —
    // machine unlearning with a bit-exact guarantee, no retraining
    // pass over the surviving 100 TB. The erase pass aggregates ONLY
    // the erased rows (O(erased), like q132's anti-join); the gate
    // proves subtract-then-refit ≡ refit-on-survivors, which is the
    // entire compliance claim.
    "q217_model_unlearning" -> QueryDef(
      fn = (s, d) => {
        val rows = olsRows(s, d)
        val full = aggMoments(rows)
        val erased = aggMoments(rows.where(col("k") % 97 === 0))
          .select(col("brand") +: momentCols.map(c => col(c).as("e_" + c)): _*)
        def z(c: String) =
          if (c == "n") coalesce(col("e_n"), lit(0L))
          else coalesce(col("e_" + c), lit(0).cast(dt))
        val corrected = full.join(erased, Seq("brand"), "left")
          .select(col("brand") +:
            momentCols.map(c => (col(c) - z(c)).as(c)): _*)
        fitOutput(corrected.select(col("brand"), col("n").cast("long").as("n"),
          col("s1").cast(dt).as("s1"), col("s2").cast(dt).as("s2"),
          col("sy").cast(dt).as("sy"), col("s11").cast(dt).as("s11"),
          col("s22").cast(dt).as("s22"), col("s12").cast(dt).as("s12"),
          col("s1y").cast(dt).as("s1y"), col("s2y").cast(dt).as("s2y"),
          col("syy").cast(dt).as("syy")))
      },
      oracle = Some(s"""
        WITH ${momentsSqlWhere(" WHERE l_orderkey % 97 <> 0")}, $coefSql
        SELECT brand, n,
               ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2
        FROM f""")
    ),

    // ----------------------------------------------------------------
    // RIDGE FIT — the same moment pass and Cramer solve with λ added
    // to the non-intercept diagonal (A + λ·diag(0,1,1)). The
    // production point is ROBUSTNESS, not shrinkage tuning: with λ > 0
    // the system is positive definite for EVERY group, so degenerate
    // groups (constant discount, single product price — det → 0 under
    // OLS) still fit instead of exploding, with zero change to the
    // plan shape or the O(groups) state. λ = 64 (an exact power of
    // two) applies to RAW features — standardize first when the
    // penalty must be scale-equivariant.
    "q213_ridge_fit" -> QueryDef(
      fn = (s, d) => {
        val m = aggMoments(olsRows(s, d))
        val (b0, b1, b2) = cramerCols(
          col("n").cast("double"), D("s1"), D("s2"), D("sy"),
          D("s11") + lit(64.0), D("s22") + lit(64.0), D("s12"),
          D("s1y"), D("s2y"))
        m.select(col("brand"), col("n"),
          round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"))
      },
      oracle = Some {
        val (b0, b1, b2) = cramerSql("nd", "s1", "s2", "sy",
          "(s11 + 64.0)", "(s22 + 64.0)", "s12", "s1y", "s2y")
        s"""
        WITH $momentsSql,
        cr AS MATERIALIZED (
          SELECT brand, n, CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                 CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
                 CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
                 CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y
          FROM m)
        SELECT brand, n,
               ROUND($b0, 6) AS b0, ROUND($b1, 6) AS b1, ROUND($b2, 6) AS b2
        FROM cr"""
      }
    ),

    // ----------------------------------------------------------------
    // K-FOLD CROSS-VALIDATION — model selection without a second data
    // pass: per (brand, fold = orderkey % 4) moments, train moments =
    // total − fold (DECIMAL subtraction, exact), the pinned Cramer
    // solve per training complement, and the held-out fold's SSE
    // closed-form from ITS moments with the trained coefficients
    // (SSE = Σy² − 2bᵀXᵀy + bᵀXᵀXb). Everything after the one moment
    // pass is O(groups · folds) arithmetic — 4-fold CV at 100 TB costs
    // exactly one scan, the thing a naive per-fold refit pipeline pays
    // 4 scans for.
    "q214_ols_cv" -> QueryDef(
      fn = (s, d) => {
        val rows = olsRows(s, d)
          .withColumn("fold", pmod(col("k"), lit(4)).cast("int"))
        val mf = aggMoments(rows, Seq("brand", "fold"))
        val momCols = Seq("s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y", "syy")
        val tot = mf.groupBy(col("brand")).agg(
          sum(col("n")).as("tn"),
          momCols.map(c => sum(col(c)).as("t" + c)): _*)
        def trainD(c: String) = (col("t" + c) - col(c)).cast("double")
        val (b0, b1, b2) = cramerCols(
          (col("tn") - col("n")).cast("double"),
          trainD("s1"), trainD("s2"), trainD("sy"), trainD("s11"),
          trainD("s22"), trainD("s12"), trainD("s1y"), trainD("s2y"))
        def F(c: String) = col(c).cast("double")
        val nf = col("n").cast("double")
        val quad =
          col("b0") * (col("b0") * nf + col("b1") * F("s1") + col("b2") * F("s2")) +
          col("b1") * (col("b0") * F("s1") + col("b1") * F("s11") + col("b2") * F("s12")) +
          col("b2") * (col("b0") * F("s2") + col("b1") * F("s12") + col("b2") * F("s22"))
        val sse = (F("syy") - lit(2.0) *
          ((col("b0") * F("sy") + col("b1") * F("s1y")) + col("b2") * F("s2y"))) + quad
        val perFold = mf.join(tot, Seq("brand"))
          .withColumn("b0", b0).withColumn("b1", b1).withColumn("b2", b2)
          .withColumn("sse", sse)
        perFold.groupBy(col("brand"), col("tn"))
          .agg(
            max(when(col("fold") === 0, col("sse"))).as("sse0"),
            max(when(col("fold") === 1, col("sse"))).as("sse1"),
            max(when(col("fold") === 2, col("sse"))).as("sse2"),
            max(when(col("fold") === 3, col("sse"))).as("sse3"))
          .select(col("brand"), col("tn").as("n"),
            round(sqrt(((col("sse0") + col("sse1")) + (col("sse2") + col("sse3"))) /
              col("tn").cast("double")), 6).as("cv_rmse"))
      },
      oracle = Some {
        val (b0, b1, b2) = cramerSql("tnd", "t1", "t2", "ty",
          "t11", "t22", "t12", "t1y", "t2y")
        s"""
        WITH $momentsSql,
        rf AS MATERIALIZED (
          SELECT brand, x1, x2, y, k % 4 AS fold FROM r),
        mf AS MATERIALIZED (
          SELECT brand, fold, COUNT(*) AS n,
                 SUM(CAST(x1 AS DECIMAL(38,10))) AS s1,
                 SUM(CAST(x2 AS DECIMAL(38,10))) AS s2,
                 SUM(CAST(y AS DECIMAL(38,10))) AS sy,
                 SUM(CAST(x1 * x1 AS DECIMAL(38,10))) AS s11,
                 SUM(CAST(x2 * x2 AS DECIMAL(38,10))) AS s22,
                 SUM(CAST(x1 * x2 AS DECIMAL(38,10))) AS s12,
                 SUM(CAST(x1 * y AS DECIMAL(38,10))) AS s1y,
                 SUM(CAST(x2 * y AS DECIMAL(38,10))) AS s2y,
                 SUM(CAST(y * y AS DECIMAL(38,10))) AS syy
          FROM rf GROUP BY brand, fold),
        tot AS MATERIALIZED (
          SELECT brand, SUM(n) AS tn,
                 SUM(s1) AS ts1, SUM(s2) AS ts2, SUM(sy) AS tsy,
                 SUM(s11) AS ts11, SUM(s22) AS ts22, SUM(s12) AS ts12,
                 SUM(s1y) AS ts1y, SUM(s2y) AS ts2y, SUM(syy) AS tsyy
          FROM mf GROUP BY brand),
        tr AS MATERIALIZED (
          SELECT mf.brand, mf.fold,
                 CAST(mf.n AS DOUBLE) AS nf,
                 CAST(mf.s1 AS DOUBLE) AS f1, CAST(mf.s2 AS DOUBLE) AS f2,
                 CAST(mf.sy AS DOUBLE) AS fy, CAST(mf.s11 AS DOUBLE) AS f11,
                 CAST(mf.s22 AS DOUBLE) AS f22, CAST(mf.s12 AS DOUBLE) AS f12,
                 CAST(mf.s1y AS DOUBLE) AS f1y, CAST(mf.s2y AS DOUBLE) AS f2y,
                 CAST(mf.syy AS DOUBLE) AS fyy,
                 CAST((tn - mf.n) AS DOUBLE) AS tnd,
                 CAST((ts1 - mf.s1) AS DOUBLE) AS t1,
                 CAST((ts2 - mf.s2) AS DOUBLE) AS t2,
                 CAST((tsy - mf.sy) AS DOUBLE) AS ty,
                 CAST((ts11 - mf.s11) AS DOUBLE) AS t11,
                 CAST((ts22 - mf.s22) AS DOUBLE) AS t22,
                 CAST((ts12 - mf.s12) AS DOUBLE) AS t12,
                 CAST((ts1y - mf.s1y) AS DOUBLE) AS t1y,
                 CAST((ts2y - mf.s2y) AS DOUBLE) AS t2y,
                 tn
          FROM mf JOIN tot ON mf.brand = tot.brand),
        cf AS MATERIALIZED (
          SELECT brand, fold, nf, f1, f2, fy, f11, f22, f12, f1y, f2y, fyy, tn,
                 $b0 AS b0, $b1 AS b1, $b2 AS b2
          FROM tr),
        sf AS MATERIALIZED (
          SELECT brand, fold, tn,
                 (fyy - 2.0 * ((b0 * fy + b1 * f1y) + b2 * f2y)) +
                 (b0 * (b0 * nf + b1 * f1 + b2 * f2) +
                  b1 * (b0 * f1 + b1 * f11 + b2 * f12) +
                  b2 * (b0 * f2 + b1 * f12 + b2 * f22)) AS sse
          FROM cf)
        SELECT brand, CAST(tn AS BIGINT) AS n,
               ROUND(SQRT(((MAX(CASE WHEN fold = 0 THEN sse END) +
                            MAX(CASE WHEN fold = 1 THEN sse END)) +
                           (MAX(CASE WHEN fold = 2 THEN sse END) +
                            MAX(CASE WHEN fold = 3 THEN sse END))) /
                          CAST(tn AS DOUBLE)), 6) AS cv_rmse
        FROM sf GROUP BY brand, tn"""
      }
    )
  )
}
