package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DISTRIBUTED ALS MATRIX FACTORIZATION (Zhou et al. 2008,
  * "Large-scale parallel collaborative filtering for the Netflix
  * prize") — implicit-feedback recommender training over the
  * customer × part purchase matrix. The reference's dashboards rank
  * products by raw popularity (`load_to_olap.py` top-seller marts);
  * factorization is the personalization step it has no engine for.
  *
  * Why ALS (and not SGD) is THE distributed shape: with one side's
  * factors fixed, every row of the other side solves an INDEPENDENT
  * r×r ridge system from ITS OWN ratings — so a half-step is one
  * keyed equi-join (ratings ⋈ factors) + one grouped aggregation of
  * r(r+3)/2 moment sums + a closed-form solve projected over the
  * reduced frame. No iteration ever shuffles more than the ratings
  * once; factor state is entity-grain (≪ ratings) and checkpointed
  * per half-step so plan depth stays constant (the q167 BSP rule).
  *
  * Determinism contract (q204 rules): factor products are IEEE-exact
  * doubles summed as DECIMAL(38,10); the 2×2 solve pins its
  * parenthesization identically in Scala and the oracle text; the
  * deterministic item-factor init ((i % 7 + 1)/8 — exact binary
  * fractions) replaces the usual random init, and λ = 0.25 on the
  * diagonal keeps every per-entity system positive definite (the
  * q213 ridge argument — users/items with one rating still solve).
  */
object RecommenderQueries extends QueryModule {

  import Tables._

  private val dt     = DecimalType(38, 10)
  private val Lambda = 0.25

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  /** Implicit ratings: total quantity per (customer, part). */
  private def ratings(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .agg(sum(col("l_quantity").cast(dt)).cast("double").as("r"))

  /** Deterministic rank-2 item init: [1, (i % 7 + 1)/8]. */
  private def initItemFactors(r: DataFrame): DataFrame =
    r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("f1"),
        ((col("i") % 7 + 1).cast("double") / lit(8.0)).as("f2"))

  /** Cached copies of the ratings hash-partitioned by EACH solve key
    * (round 14, guide §2.4): a half-step is join → groupBy(solveKey),
    * and with the ratings in their (u, i)-grain build partitioning the
    * aggregate's partial state barely collapses (ratings per user are
    * spread over every partition, so ~one 14-decimal buffer per ROW
    * crossed the exchange — measured 30-67 MB per half-step, 160 MB
    * per rank-4 train). Partitioned by the solve key, the broadcast
    * join preserves the layout and the aggregate needs NO exchange at
    * all — the single-phase hash agg also does ~40% fewer decimal adds
    * than partial+merge. Partition count pins defaultParallelism
    * (explicit, so AQE cannot coalesce the cached copy to one core);
    * decimal sums are order-independent, so the layout cannot change a
    * value. This is Zhou et al.'s ALS block layout: ratings stored
    * twice, once by user and once by item, each half-step reading its
    * own copy.
    */
  private def keyedCopies(rat: DataFrame): (DataFrame, DataFrame) = {
    val p = rat.sparkSession.sparkContext.defaultParallelism
    (graft.CacheLeases.lease(rat.repartition(p, col("u")).persist()),
      graft.CacheLeases.lease(rat.repartition(p, col("i")).persist()))
  }

  /** One ALS half-step: solve `solveKey`'s factors given the fixed
    * `fixedKey` factors. Join ratings to the fixed side, aggregate the
    * 5 normal-equation moments per solved entity, ridge-solve 2×2
    * closed form. Output is entity-grain, localCheckpoint'ed.
    * The fixed side is entity-grain (≪ ratings) — broadcast it
    * explicitly so the join can never flip to SMJ and re-shuffle the
    * solve-key-partitioned ratings (the halfStepR4 rationale; decimal
    * moment sums are order-independent, so the hint cannot change
    * values).
    */
  private def halfStep(
      rat: DataFrame, fixed: DataFrame,
      solveKey: String, fixedKey: String): DataFrame = {
    val m = rat.join(broadcast(fixed), fixedKey)
      .groupBy(col(solveKey))
      .agg(
        sum((col("f1") * col("f1")).cast(dt)).as("s11"),
        sum((col("f1") * col("f2")).cast(dt)).as("s12"),
        sum((col("f2") * col("f2")).cast(dt)).as("s22"),
        sum((col("r") * col("f1")).cast(dt)).as("b1"),
        sum((col("r") * col("f2")).cast(dt)).as("b2"))
    val a11 = col("s11").cast("double") + lit(Lambda)
    val a12 = col("s12").cast("double")
    val a22 = col("s22").cast("double") + lit(Lambda)
    val b1  = col("b1").cast("double")
    val b2  = col("b2").cast("double")
    val det = a11 * a22 - a12 * a12
    m.select(col(solveKey),
        ((b1 * a22 - b2 * a12) / det).as("f1"),
        ((a11 * b2 - a12 * b1) / det).as("f2"))
      .localCheckpoint(true)
  }

  /** SQL mirror of [[halfStep]]: (sums CTE, solve CTE) text. */
  private def halfStepSql(
      name: String, ratSrc: String, fixedSrc: String,
      solveKey: String, fixedKey: String): String = s"""
        ${name}_s AS MATERIALIZED (
          SELECT t.$solveKey,
                 SUM(CAST(f.f1 * f.f1 AS DECIMAL(38,10))) AS s11,
                 SUM(CAST(f.f1 * f.f2 AS DECIMAL(38,10))) AS s12,
                 SUM(CAST(f.f2 * f.f2 AS DECIMAL(38,10))) AS s22,
                 SUM(CAST(t.r * f.f1 AS DECIMAL(38,10))) AS b1,
                 SUM(CAST(t.r * f.f2 AS DECIMAL(38,10))) AS b2
          FROM $ratSrc t JOIN $fixedSrc f ON t.$fixedKey = f.$fixedKey
          GROUP BY t.$solveKey),
        $name AS MATERIALIZED (
          SELECT $solveKey,
                 (CAST(b1 AS DOUBLE) * (CAST(s22 AS DOUBLE) + $Lambda) -
                  CAST(b2 AS DOUBLE) * CAST(s12 AS DOUBLE)) /
                 ((CAST(s11 AS DOUBLE) + $Lambda) * (CAST(s22 AS DOUBLE) + $Lambda) -
                  CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)) AS f1,
                 ((CAST(s11 AS DOUBLE) + $Lambda) * CAST(b2 AS DOUBLE) -
                  CAST(s12 AS DOUBLE) * CAST(b1 AS DOUBLE)) /
                 ((CAST(s11 AS DOUBLE) + $Lambda) * (CAST(s22 AS DOUBLE) + $Lambda) -
                  CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE)) AS f2
          FROM ${name}_s)"""

  private val ratingsSql = """
        rat AS MATERIALIZED (
          SELECT o_custkey AS u, l_partkey AS i,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS r
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey, l_partkey),
        q0 AS MATERIALIZED (
          SELECT i, 1.0 AS f1, CAST((i % 7) + 1 AS DOUBLE) / 8.0 AS f2
          FROM (SELECT DISTINCT i FROM rat))"""

  /** Shared train chain: q0 → u1 → q1 → u2 (three half-steps). */
  private def trainedUserFactors(s: SparkSession, d: String): DataFrame = {
    val rat = graft.CacheLeases.lease(ratings(s, d).persist())
    val (ratU, ratI) = keyedCopies(rat)
    val q0  = initItemFactors(ratI)
    val u1  = halfStep(ratU, q0, "u", "i")
    val q1  = halfStep(ratI, u1, "i", "u")
    halfStep(ratU, q1, "u", "i")
  }

  private val trainCtesSql: String = s"""$ratingsSql,
        ${halfStepSql("u1", "rat", "q0", "u", "i")},
        ${halfStepSql("q1", "rat", "u1", "i", "u")},
        ${halfStepSql("u2", "rat", "q1", "u", "i")}"""

  // ------------------------------------------------------------------
  // RANK-4 ALS (q256-q258) — the rank-2 closed-form Cramer solve does
  // not generalize; the rank-r path runs q222's GENERATED Gaussian-
  // elimination program on each entity's (r×r + λI) normal equations.
  // Crucially the solve stays DISTRIBUTED (entity count ≫ driver
  // state): the step program is interpreted as Spark Column
  // expressions over the 14 moment columns — the identical op DAG the
  // oracle executes as level-batched CTEs — so per half-step the plan
  // is still join → O(r²)-moment aggregate → projection, shuffling the
  // ratings once and nothing else. λ on the diagonal keeps every
  // system positive definite (no pivoting needed, the q222 argument).

  private val Rank = 4

  /** Deterministic rank-4 item init: exact-/8 binary fractions from
    * coprime moduli so the init matrix has full column rank.
    */
  private def initItemFactorsR4(r: DataFrame): DataFrame =
    r.select(col("i")).distinct()
      .select(col("i"), lit(1.0).as("f1"),
        ((col("i") % 7 + 1).cast("double") / lit(8.0)).as("f2"),
        ((col("i") % 5 + 1).cast("double") / lit(8.0)).as("f3"),
        ((col("i") % 3 + 1).cast("double") / lit(8.0)).as("f4"))

  private val initR4Sql = """
        r0 AS MATERIALIZED (
          SELECT i, 1.0 AS f1,
                 CAST((i % 7) + 1 AS DOUBLE) / 8.0 AS f2,
                 CAST((i % 5) + 1 AS DOUBLE) / 8.0 AS f3,
                 CAST((i % 3) + 1 AS DOUBLE) / 8.0 AS f4
          FROM (SELECT DISTINCT i FROM rat))"""

  /** One rank-4 half-step: join to the fixed side, aggregate the 14
    * normal-equation moments per solved entity (10 Gram + 4 RHS
    * decimal sums), then run the generated elimination as a single
    * distributed projection. Entity-grain output, localCheckpoint'ed.
    */
  private def halfStepR4(
      rat: DataFrame, fixed: DataFrame,
      solveKey: String, fixedKey: String): DataFrame = {
    val moments =
      (for { j <- 0 until Rank; k <- j until Rank }
        yield sum((col(s"f${j + 1}") * col(s"f${k + 1}")).cast(dt)).as(s"s_${j}_$k")) ++
        (0 until Rank).map(j => sum((col("r") * col(s"f${j + 1}")).cast(dt)).as(s"b_$j"))
    // the factor side is entity-grain (≪ ratings) — broadcast it
    // EXPLICITLY: at ×10 scale the rank-4 size estimate crosses the
    // auto-broadcast threshold and the join flips to SMJ, re-shuffling
    // the ratings every half-step (measured shuffle ×23 instead of the
    // ratings-linear ×10 the rank-2 twin shows). Decimal moment sums
    // are order-independent, so the strategy hint cannot change values.
    val m = rat.join(broadcast(fixed), fixedKey)
      .groupBy(col(solveKey))
      .agg(moments.head, moments.tail: _*)
    val init: Map[String, Column] =
      (for { i <- 0 until Rank; j <- 0 to Rank } yield {
        val c =
          if (j == Rank) col(s"b_$i").cast("double")
          else if (i == j) col(s"s_${i}_$i").cast("double") + lit(Lambda)
          else col(s"s_${math.min(i, j)}_${math.max(i, j)}").cast("double")
        s"a_${i}_$j" -> c
      }).toMap
    val env = RegressionQueries.programColumns(
      RegressionQueries.eliminationProgram(Rank - 1), init)
    m.select(col(solveKey) +:
        (1 to Rank).map(t => env(s"b_${t - 1}").as(s"f$t")): _*)
      .localCheckpoint(true)
  }

  /** SQL mirror of [[halfStepR4]]: moments CTE + a0 aliases + the
    * generated elimination chain + the factor projection, all
    * namespaced by `name`.
    */
  private def halfStepR4Sql(
      name: String, ratSrc: String, fixedSrc: String,
      solveKey: String, fixedKey: String): String = {
    val momentSql =
      ((for { j <- 0 until Rank; k <- j until Rank }
        yield s"SUM(CAST(f.f${j + 1} * f.f${k + 1} AS DECIMAL(38,10))) AS s_${j}_$k") ++
        (0 until Rank).map(j =>
          s"SUM(CAST(t.r * f.f${j + 1} AS DECIMAL(38,10))) AS b_$j"))
        .mkString(",\n                 ")
    val aliases = (for { i <- 0 until Rank; j <- 0 to Rank } yield {
      val src =
        if (j == Rank) s"CAST(b_$i AS DOUBLE)"
        else if (i == j) s"(CAST(s_${i}_$i AS DOUBLE) + $Lambda)"
        else s"CAST(s_${math.min(i, j)}_${math.max(i, j)} AS DOUBLE)"
      s"$src AS a_${i}_$j"
    }).mkString(", ")
    val (ctes, last) = RegressionQueries.programSql(
      RegressionQueries.eliminationProgram(Rank - 1), s"${name}_a0", s"${name}_e")
    s"""
        ${name}_m AS MATERIALIZED (
          SELECT t.$solveKey,
                 $momentSql
          FROM $ratSrc t JOIN $fixedSrc f ON t.$fixedKey = f.$fixedKey
          GROUP BY t.$solveKey),
        ${name}_a0 AS MATERIALIZED (SELECT $solveKey, $aliases FROM ${name}_m),
        $ctes,
        $name AS MATERIALIZED (
          SELECT $solveKey, ${(1 to Rank).map(t => s"b_${t - 1} AS f$t").mkString(", ")}
          FROM $last)"""
  }

  /** Shared rank-4 train chain: r0 → w1 → r1 → w2 (three half-steps,
    * the q232 schedule at rank 4).
    */
  private def trainedUserFactorsR4(rat: DataFrame): DataFrame = {
    val (ratU, ratI) = keyedCopies(rat)
    val r0 = initItemFactorsR4(ratI)
    val w1 = halfStepR4(ratU, r0, "u", "i")
    val r1 = halfStepR4(ratI, w1, "i", "u")
    halfStepR4(ratU, r1, "u", "i")
  }

  private val trainR4CtesSql: String = s"""$ratingsSql,
        $initR4Sql,
        ${halfStepR4Sql("w1", "rat", "r0", "u", "i")},
        ${halfStepR4Sql("r1", "rat", "w1", "i", "u")},
        ${halfStepR4Sql("w2", "rat", "r1", "u", "i")}"""

  // ------------------------------------------------------------------
  // SERVING — the candidate-generation + scoring shapes shared by the
  // refit queries (q233/q237/q257/q258) and their staged-model twins
  // (q311-q314). Parameterized only by rank and the factor frames, so
  // staged ≡ refit is a property of WHERE the factors come from, never
  // of the serve plan.

  /** Train the full three-half-step schedule and return
    * (user factors, item factors) — the item side is the second
    * half-step's output, the candidate-scoring state q233/q257 use.
    */
  private def trainFactors(rat: DataFrame, rank4: Boolean): (DataFrame, DataFrame) = {
    val (ratU, ratI) = keyedCopies(rat)
    if (rank4) {
      val r0 = initItemFactorsR4(ratI)
      val w1 = halfStepR4(ratU, r0, "u", "i")
      val r1 = halfStepR4(ratI, w1, "i", "u")
      (halfStepR4(ratU, r1, "u", "i"), r1)
    } else {
      val q0 = initItemFactors(ratI)
      val u1 = halfStep(ratU, q0, "u", "i")
      val q1 = halfStep(ratI, u1, "i", "u")
      (halfStep(ratU, q1, "u", "i"), q1)
    }
  }

  /** STAGED MODEL as a CONTENT-KEYED FIXTURE: train once PER CORPUS
    * (not per request), persist both factor tables as parquet model
    * tables under [[graft.Staging.dirFor]] (the q315 segment pattern —
    * keyed by the corpus dir's content signature, so a regenerated
    * corpus retrains and can never serve stale factors), and return
    * the factors read from the staged tables. Tables land under temp
    * names and ATOMIC_MOVE into place; `_FACTORS_READY` commits the
    * fixture, so a crashed first build retrains rather than serving a
    * partial table. Parquet round-trips IEEE doubles exactly, so
    * staged serve is bit-identical to refit serve and gates against
    * the refit oracles VERBATIM — the hash match is the staging proof.
    *
    * This is the production recommender's cost model made measurable:
    * train-once/serve-many. The FIRST q311–q314 request per corpus
    * pays the half-step training (the one-time staging cost, like
    * q315's segment build — annotated in BENCH.json's note); every
    * subsequent serve is a factor-table scan + the bounded-candidate
    * plan, zero fit jobs. Factors are entity-grain tables (users ≫
    * driver state, so unlike β they stage as DATA, never collect).
    * q321 keeps the inline train+stage+serve gate for the warm-refresh
    * path.
    */
  private def stagedFactors(
      s: SparkSession, d: String, rank4: Boolean, variant: String,
      train: => DataFrame): (DataFrame, DataFrame) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(d).toAbsolutePath.normalize
    val rk = if (rank4) "r4" else "r2"
    val stageDir = graft.Staging.dirFor(s"graft_als_${variant}_$rk", src)
    val marker = stageDir.resolve("_FACTORS_READY")
    if (!Files.exists(marker)) {
      val build = Files.createTempDirectory(stageDir, "build_")
      val (users, items) = trainFactors(train, rank4)
      users.write.mode("overwrite").parquet(build.resolve("user_factors").toString)
      items.write.mode("overwrite").parquet(build.resolve("item_factors").toString)
      Seq("user_factors", "item_factors").foreach { t =>
        val target = stageDir.resolve(t)
        graft.Staging.deleteRecursively(target) // partial from a crashed build
        Files.move(build.resolve(t), target, StandardCopyOption.ATOMIC_MOVE)
      }
      graft.Staging.deleteRecursively(build)
      graft.Staging.touchMarker(marker)
    }
    (s.read.parquet(stageDir.resolve("user_factors").toString),
      s.read.parquet(stageDir.resolve("item_factors").toString))
  }

  /** Top-3 recommendations from given factors: bounded candidate set
    * (50 most-rated items, broadcast), purchased pairs anti-joined,
    * rank-r dot product, per-user top-3 window over ≤50 rows.
    */
  private def recommendTop3(
      rat: DataFrame, userF: DataFrame, itemF: DataFrame, rank: Int): DataFrame = {
    val pop = rat.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("i").asc).limit(50)
      .join(itemF, "i")
      .select(col("i") +: (1 to rank).map(t => col(s"f$t").as(s"g$t")): _*)
    val score = (1 to rank).map(t => col(s"f$t") * col(s"g$t")).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("score").desc, col("i").asc)
    // round 14, guide §2.4/§3.1: the candidate frame (users × 50 wide
    // factor rows) used to be SMJ-shuffled by (u, i) for the purchased
    // anti-join and AGAIN by u for the top-3 window (~30-45 MB of the
    // serve bytes). Shuffle the SMALL things instead: hash the slim
    // (u, i) purchased pairs into a count-gated broadcast (the q77
    // pinBySize rule — explicit under the row cap, shuffled hash join
    // above it, so the plan stays deterministic and degrades correctly
    // at cluster scale), and pre-partition the entity-grain factor
    // frame by u so the broadcast joins preserve exactly the layout
    // the window needs — the wide candidates now never cross a wire.
    val p = rat.sparkSession.sparkContext.defaultParallelism
    val purchased = {
      val slim = rat.select(col("u"), col("i"))
      // the 250k pin cap guards WIDE embedding rows; this relation is
      // two longs per row (~25 MB hashed at 1M rows), so the cap can
      // sit 4x higher before the broadcast build cost matters — at
      // cluster-scale rating counts the shuffled-hash arm takes over
      val maxRows = sys.props.get("graft.pin.broadcast.max.rows")
        .map(_.toLong).getOrElse(250000L) * 4
      if (slim.count() <= maxRows) broadcast(slim) else slim.hint("shuffle_hash")
    }
    userF.repartition(p, col("u")).crossJoin(broadcast(pop))
      .join(purchased, Seq("u", "i"), "left_anti")
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("u").as("custkey"), col("rank"),
        col("i").as("partkey"), round(col("score"), 6).as("score"))
  }

  /** Holdout hit flags from given factors: top-3 over the bounded
    * candidates (train purchases excluded), checked per held-out user.
    */
  private def evalHits(
      tr: DataFrame, te: DataFrame,
      userF: DataFrame, itemF: DataFrame, rank: Int): DataFrame = {
    val recs = recommendTop3(tr, userF, itemF, rank)
      .select(col("custkey").as("u"), col("partkey").as("i"))
    val testUsers = te.select(col("u")).distinct()
      .join(userF.select(col("u")), Seq("u"), "left_semi")
    val hits = recs.join(te, Seq("u", "i"), "left_semi")
      .select(col("u")).distinct().withColumn("h", lit(1))
    testUsers.join(hits, Seq("u"), "left")
      .select(col("u").as("custkey"),
        coalesce(col("h"), lit(0)).as("hit"))
  }

  /** Shared oracles: each refit query and its staged twin gate against
    * the SAME text — the hash match is the staged ≡ refit proof.
    */
  private lazy val recommendOracle: Option[String] = Some(s"""
        WITH $trainCtesSql,
        pop AS MATERIALIZED (
          SELECT i, f1 AS g1, f2 AS g2 FROM (
            SELECT i FROM (
              SELECT i, COUNT(*) AS cnt FROM rat GROUP BY i)
            ORDER BY cnt DESC, i ASC LIMIT 50) JOIN q1 USING (i)),
        cands AS MATERIALIZED (
          SELECT u2.u, pop.i, u2.f1 * pop.g1 + u2.f2 * pop.g2 AS score
          FROM u2 CROSS JOIN pop
          WHERE NOT EXISTS (
            SELECT 1 FROM rat WHERE rat.u = u2.u AND rat.i = pop.i))
        SELECT u AS custkey, CAST(rank AS INTEGER) AS rank,
               i AS partkey, ROUND(score, 6) AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                ORDER BY score DESC, i ASC) AS rank FROM cands)
        WHERE rank <= 3""")

  private lazy val evalOracle: Option[String] = Some(s"""
        WITH $ratingsSql,
        tr AS MATERIALIZED (SELECT * FROM rat WHERE (u + i) % 5 <> 0),
        te AS MATERIALIZED (SELECT u, i FROM rat WHERE (u + i) % 5 = 0),
        q0t AS MATERIALIZED (
          SELECT i, 1.0 AS f1, CAST((i % 7) + 1 AS DOUBLE) / 8.0 AS f2
          FROM (SELECT DISTINCT i FROM tr)),
        ${halfStepSql("v1", "tr", "q0t", "u", "i")},
        ${halfStepSql("p1", "tr", "v1", "i", "u")},
        ${halfStepSql("v2", "tr", "p1", "u", "i")},
        pop AS MATERIALIZED (
          SELECT i, f1 AS g1, f2 AS g2 FROM (
            SELECT i FROM (
              SELECT i, COUNT(*) AS cnt FROM tr GROUP BY i)
            ORDER BY cnt DESC, i ASC LIMIT 50) JOIN p1 USING (i)),
        recs AS MATERIALIZED (
          SELECT u, i FROM (
            SELECT v2.u, pop.i,
                   ROW_NUMBER() OVER (PARTITION BY v2.u
                     ORDER BY v2.f1 * pop.g1 + v2.f2 * pop.g2 DESC,
                              pop.i ASC) AS rank
            FROM v2 CROSS JOIN pop
            WHERE NOT EXISTS (
              SELECT 1 FROM tr WHERE tr.u = v2.u AND tr.i = pop.i))
          WHERE rank <= 3),
        tu AS MATERIALIZED (
          SELECT DISTINCT te.u FROM te JOIN v2 ON v2.u = te.u),
        hits AS MATERIALIZED (
          SELECT DISTINCT r.u FROM recs r JOIN te ON te.u = r.u AND te.i = r.i)
        SELECT tu.u AS custkey,
               CAST(CASE WHEN hits.u IS NULL THEN 0 ELSE 1 END AS INTEGER) AS hit
        FROM tu LEFT JOIN hits ON hits.u = tu.u""")

  private lazy val recommendR4Oracle: Option[String] = {
    val dot = (1 to Rank).map(t => s"w2.f$t * pop.g$t").mkString(" + ")
    Some(s"""
        WITH $trainR4CtesSql,
        pop AS MATERIALIZED (
          SELECT i, ${(1 to Rank).map(t => s"f$t AS g$t").mkString(", ")} FROM (
            SELECT i FROM (
              SELECT i, COUNT(*) AS cnt FROM rat GROUP BY i)
            ORDER BY cnt DESC, i ASC LIMIT 50) JOIN r1 USING (i)),
        cands AS MATERIALIZED (
          SELECT w2.u, pop.i, $dot AS score
          FROM w2 CROSS JOIN pop
          WHERE NOT EXISTS (
            SELECT 1 FROM rat WHERE rat.u = w2.u AND rat.i = pop.i))
        SELECT u AS custkey, CAST(rank AS INTEGER) AS rank,
               i AS partkey, ROUND(score, 6) AS score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                ORDER BY score DESC, i ASC) AS rank FROM cands)
        WHERE rank <= 3""")
  }

  private lazy val evalR4Oracle: Option[String] = {
    val dot = (1 to Rank).map(t => s"v2.f$t * pop.g$t").mkString(" + ")
    Some(s"""
        WITH $ratingsSql,
        tr AS MATERIALIZED (SELECT * FROM rat WHERE (u + i) % 5 <> 0),
        te AS MATERIALIZED (SELECT u, i FROM rat WHERE (u + i) % 5 = 0),
        t0 AS MATERIALIZED (
          SELECT i, 1.0 AS f1,
                 CAST((i % 7) + 1 AS DOUBLE) / 8.0 AS f2,
                 CAST((i % 5) + 1 AS DOUBLE) / 8.0 AS f3,
                 CAST((i % 3) + 1 AS DOUBLE) / 8.0 AS f4
          FROM (SELECT DISTINCT i FROM tr)),
        ${halfStepR4Sql("v1", "tr", "t0", "u", "i")},
        ${halfStepR4Sql("p1", "tr", "v1", "i", "u")},
        ${halfStepR4Sql("v2", "tr", "p1", "u", "i")},
        pop AS MATERIALIZED (
          SELECT i, ${(1 to Rank).map(t => s"f$t AS g$t").mkString(", ")} FROM (
            SELECT i FROM (
              SELECT i, COUNT(*) AS cnt FROM tr GROUP BY i)
            ORDER BY cnt DESC, i ASC LIMIT 50) JOIN p1 USING (i)),
        recs AS MATERIALIZED (
          SELECT u, i FROM (
            SELECT v2.u, pop.i,
                   ROW_NUMBER() OVER (PARTITION BY v2.u
                     ORDER BY $dot DESC, pop.i ASC) AS rank
            FROM v2 CROSS JOIN pop
            WHERE NOT EXISTS (
              SELECT 1 FROM tr WHERE tr.u = v2.u AND tr.i = pop.i))
          WHERE rank <= 3),
        tu AS MATERIALIZED (
          SELECT DISTINCT te.u FROM te JOIN v2 ON v2.u = te.u),
        hits AS MATERIALIZED (
          SELECT DISTINCT r.u FROM recs r JOIN te ON te.u = r.u AND te.i = r.i)
        SELECT tu.u AS custkey,
               CAST(CASE WHEN hits.u IS NULL THEN 0 ELSE 1 END AS INTEGER) AS hit
        FROM tu LEFT JOIN hits ON hits.u = tu.u""")
  }

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // ALS TRAINING — three alternating half-steps (q0 → u1 → q1 → u2)
    // over the purchase matrix; output is the user factor table. Per
    // half-step the ratings shuffle ONCE on the join key and the
    // solved state is entity-grain — at 100 TB the ratings pass
    // dominates and factor state stays a rounding error next to it.
    "q232_als_train" -> QueryDef(
      fn = (s, d) =>
        trainedUserFactors(s, d)
          .select(col("u").as("custkey"),
            round(col("f1"), 6).as("f1"), round(col("f2"), 6).as("f2")),
      oracle = Some(s"""
        WITH $trainCtesSql
        SELECT u AS custkey, ROUND(f1, 6) AS f1, ROUND(f2, 6) AS f2
        FROM u2""")
    ),

    // ----------------------------------------------------------------
    // TOP-3 RECOMMENDATIONS — the candidate-generation + scoring shape
    // every production recommender serves with: a BOUNDED candidate
    // set (the 50 most-rated items — broadcastable at any corpus
    // size), already-purchased pairs removed by a keyed anti-join on
    // (u, i), dot-product scoring against the trained factors, top-3
    // per user from a window over ≤50 candidate rows. The full-
    // catalog argmax that ALS papers benchmark is deliberately NOT the
    // shape here — users × catalog is the cross join that never ships;
    // candidates bound the fanout the way bands bound dedup.
    "q233_als_recommend" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val (u2, q1) = trainFactors(rat, rank4 = false)
        recommendTop3(rat, u2, q1, rank = 2)
      },
      oracle = recommendOracle
    ),

    // ----------------------------------------------------------------
    // HOLDOUT EVALUATION — the train/eval split every model query
    // needs before it ships (the q209-backtest discipline applied to
    // the recommender): (u, i) pairs with (u + i) % 5 = 0 are held
    // out, ALS trains on the rest, and each held-out user's top-3
    // recommendations (from the bounded candidate set, train
    // purchases excluded) are checked against their held-out items.
    // Output is the per-user hit flag — the row-grain gate covers the
    // split, the training, the candidate generation, and the ranking
    // at once. Same plan shapes as q232/q233; the extra work is two
    // keyed semi-joins at holdout grain.
    "q237_als_eval" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val isTest = pmod(col("u") + col("i"), lit(5)) === 0
        val tr = graft.CacheLeases.lease(rat.where(!isTest).persist())
        val te = rat.where(isTest).select(col("u"), col("i"))
        val (u2, q1) = trainFactors(tr, rank4 = false)
        evalHits(tr, te, u2, q1, rank = 2)
      },
      oracle = evalOracle
    ),

    // ----------------------------------------------------------------
    // RANK-4 ALS TRAINING — q232's schedule with the generated-
    // elimination solver in place of the 2×2 Cramer closed form. Same
    // scale shape: per half-step the ratings shuffle once, the moment
    // aggregate carries 14 decimals per entity (r(r+3)/2 — quadratic
    // in rank, constant in rows), and the solve is a projection over
    // the reduced frame. The oracle replays the identical generated op
    // sequence per half-step as level-batched CTE chains.
    "q256_als_train_r4" -> QueryDef(
      fn = (s, d) =>
        trainedUserFactorsR4(graft.CacheLeases.lease(ratings(s, d).persist()))
          .select(col("u").as("custkey") +:
            (1 to Rank).map(t => round(col(s"f$t"), 6).as(s"f$t")): _*),
      oracle = Some(s"""
        WITH $trainR4CtesSql
        SELECT u AS custkey,
               ${(1 to Rank).map(t => s"ROUND(f$t, 6) AS f$t").mkString(", ")}
        FROM w2""")
    ),

    // ----------------------------------------------------------------
    // RANK-4 TOP-3 RECOMMENDATIONS — q233's bounded-candidate shape
    // (50 most-rated items broadcast, purchased pairs anti-joined,
    // top-3 window over ≤50 rows) scored with the rank-4 dot product.
    "q257_als_recommend_r4" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val (w2, r1) = trainFactors(rat, rank4 = true)
        recommendTop3(rat, w2, r1, rank = Rank)
      },
      oracle = recommendR4Oracle
    ),

    // ----------------------------------------------------------------
    // RANK-4 HOLDOUT EVALUATION — q237's split/train/rank/hit gate at
    // rank 4; the per-user hit flag covers the elimination solver, the
    // candidate generation, and the ranking end to end.
    "q258_als_eval_r4" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val isTest = pmod(col("u") + col("i"), lit(5)) === 0
        val tr = graft.CacheLeases.lease(rat.where(!isTest).persist())
        val te = rat.where(isTest).select(col("u"), col("i"))
        val (w2, r1) = trainFactors(tr, rank4 = true)
        evalHits(tr, te, w2, r1, rank = Rank)
      },
      oracle = evalR4Oracle
    ),

    // ----------------------------------------------------------------
    // STAGED-MODEL RECOMMEND — q233's production form (the q291 staging
    // discipline at entity grain): TRAIN ONCE, persist user+item factor
    // tables as warehouse model tables, and SERVE FROM THE TABLES — the
    // returned plan reads staged factors plus the purchase history,
    // with ZERO half-step jobs (plan-audited: no decimal moment
    // aggregates). Factors are entity-grain — they stage as data and
    // never collect to the driver, unlike the β/node-table models.
    // Parquet round-trips doubles exactly, so staged serve gates
    // against q233's oracle VERBATIM.
    "q311_als_staged_recommend" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val (uf, itf) = stagedFactors(s, d, rank4 = false, variant = "full", rat)
        recommendTop3(rat, uf, itf, rank = 2)
      },
      oracle = recommendOracle
    ),

    // ----------------------------------------------------------------
    // STAGED-MODEL EVAL — q237's holdout gate served from the staged
    // factor tables: the hit flags prove the staged tables carry the
    // complete model (split → train → stage → serve → check), and the
    // serve plan runs zero fit jobs.
    "q312_als_staged_eval" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val isTest = pmod(col("u") + col("i"), lit(5)) === 0
        val tr = graft.CacheLeases.lease(rat.where(!isTest).persist())
        val te = rat.where(isTest).select(col("u"), col("i"))
        val (uf, itf) = stagedFactors(s, d, rank4 = false, variant = "hold", tr)
        evalHits(tr, te, uf, itf, rank = 2)
      },
      oracle = evalOracle
    ),

    // ----------------------------------------------------------------
    // RANK-4 STAGED RECOMMEND — the heaviest refit chain in the bench
    // (three rank-4 half-steps re-run per q257 request) reduced to its
    // production cost: one staged-table read + the bounded-candidate
    // serve. This is where staging pays at 100 TB — recommenders are
    // train-once/serve-many, and every serve re-shuffling the ratings
    // through the moment aggregates was the r12 verdict's #1 shuffle
    // line.
    "q313_als_staged_recommend_r4" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val (uf, itf) = stagedFactors(s, d, rank4 = true, variant = "full", rat)
        recommendTop3(rat, uf, itf, rank = Rank)
      },
      oracle = recommendR4Oracle
    ),

    // ----------------------------------------------------------------
    // MAINTAINED FACTOR STATE — the warm refresh that completes the
    // maintained-state matrix for the recommender (index/forecast/
    // centroid/KM/regression/NB/quantile-sketch all have maintained
    // twins; factor tables were the gap): item factors train once on
    // the historical ratings and STAGE as a warehouse table; when a
    // new ratings slice arrives ((u + i) % 4 == 0 — new users AND new
    // interactions for existing users), the refresh runs ONE user-side
    // half-step over the full ratings against the FROZEN staged item
    // factors — the standard fold-in/warm-refresh every production
    // recommender runs nightly between full retrains. Cost: one
    // ratings shuffle + an entity-grain solve, zero item-side jobs.
    // The oracle recomputes the same math from scratch, so the hash
    // match proves the refresh used only stored state + the ratings.
    "q321_als_factor_refresh" -> QueryDef(
      fn = (s, d) => {
        val rat   = graft.CacheLeases.lease(ratings(s, d).persist())
        val isNew = pmod(col("u") + col("i"), lit(4)) === 0
        val tr    = graft.CacheLeases.lease(rat.where(!isNew).persist())
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q321_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          val (trU, trI) = keyedCopies(tr)
          val q0 = initItemFactors(trI)
          val u1 = halfStep(trU, q0, "u", "i")
          val q1 = halfStep(trI, u1, "i", "u")
          wh.overwrite(q1, "gold", "model_als_item_factors")
          val itf = wh.load("gold", "model_als_item_factors").localCheckpoint(true)
          val p = s.sparkContext.defaultParallelism
          halfStep(rat.repartition(p, col("u")), itf, "u", "i")
            .select(col("u").as("custkey"),
              round(col("f1"), 6).as("f1"), round(col("f2"), 6).as("f2"))
        } finally graft.Staging.deleteRecursively(
          java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(s"""
        WITH $ratingsSql,
        tr AS MATERIALIZED (SELECT * FROM rat WHERE (u + i) % 4 <> 0),
        q0t AS MATERIALIZED (
          SELECT i, 1.0 AS f1, CAST((i % 7) + 1 AS DOUBLE) / 8.0 AS f2
          FROM (SELECT DISTINCT i FROM tr)),
        ${halfStepSql("v1", "tr", "q0t", "u", "i")},
        ${halfStepSql("p1", "tr", "v1", "i", "u")},
        ${halfStepSql("uref", "rat", "p1", "u", "i")}
        SELECT u AS custkey, ROUND(f1, 6) AS f1, ROUND(f2, 6) AS f2
        FROM uref""")
    ),

    // ----------------------------------------------------------------
    // RANK-4 STAGED EVAL — q258's gate from staged rank-4 factors.
    "q314_als_staged_eval_r4" -> QueryDef(
      fn = (s, d) => {
        val rat = graft.CacheLeases.lease(ratings(s, d).persist())
        val isTest = pmod(col("u") + col("i"), lit(5)) === 0
        val tr = graft.CacheLeases.lease(rat.where(!isTest).persist())
        val te = rat.where(isTest).select(col("u"), col("i"))
        val (uf, itf) = stagedFactors(s, d, rank4 = true, variant = "hold", tr)
        evalHits(tr, te, uf, itf, rank = Rank)
      },
      oracle = evalR4Oracle
    )
  )
}
