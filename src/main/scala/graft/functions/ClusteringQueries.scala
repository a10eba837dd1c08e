package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DISTRIBUTED K-MEANS (Lloyd 1982, fixed-K BSP iterations) over the
  * embedding corpus — the clustering step SemDeDup-style semantic
  * curation, IVF codebook training (q45's codebook is exactly a
  * k-means fit), and cluster-balanced sampling all build on. The
  * reference has no clustering surface; its pipelines stop at joins
  * (`update_ml_features.py`), leaving model fitting to absent
  * downstream systems.
  *
  * Scale contract (the q167 BSP discipline): per iteration the K×d
  * centroid table BROADCASTS (KB-scale), the assignment is one
  * map-side pass with an aggregation-shaped argmin — min(struct(d²,
  * cid)), never a window over the corpus — and the centroid update is
  * a (cid, dim)-grain decimal mean whose partial aggregation bounds
  * the shuffle at O(parts × K × d). Centroid state localCheckpoints
  * per step so plan depth stays constant in the iteration count.
  *
  * Determinism contract: distances fold in array order over IEEE
  * doubles widened from floats (exact, both engines); centroid means
  * accumulate in DECIMAL(28,12) and narrow through FLOAT before
  * re-entering double arithmetic (the q45/q86 rule — decimal→double
  * itself is 1-ulp engine-dependent, float absorbs it); argmin ties
  * break on cid via the struct ordering.
  */
object ClusteringQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private val K     = 8
  private val Iters = 3
  private val dt    = DecimalType(28, 12)

  /** Squared euclidean distance between the row's `embedding` and the
    * joined centroid's `cvec`, folded in array order — the same
    * zip_with/aggregate shape as q86's centering norm.
    */
  private val dist2: Column = expr(
    "aggregate(zip_with(embedding, cvec, " +
      "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Deterministic seeding: the K lowest-vec_id embeddings, cid =
    * 0-based rank. The 8-row window is init-only state, not a corpus
    * operator.
    */
  private def seedCentroids(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    e.orderBy(col("vec_id")).limit(K)
      .select((row_number().over(w) - 1).as("cid"), col("embedding").as("cvec"))
  }

  /** One assignment pass: broadcast the K×d centroids, compute K
    * distances per row in place, and reduce to the per-vector argmin
    * with an aggregation (map-side combinable; carries the embedding
    * through `first` so the update needs no join back).
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", dist2)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"),
        col("embedding"))

  /** One update pass: (cid, dim)-grain decimal mean, narrowed to
    * FLOAT, re-assembled into position-ordered arrays; K×d output is
    * localCheckpoint'ed so the lineage never grows with iterations.
    */
  private def update(a: DataFrame): DataFrame =
    a.select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("v").cast("double").cast(dt)).cast("double") /
        count(lit(1))).cast("float").as("m"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), expr("transform(pm, x -> x.m)").as("cvec"))
      .localCheckpoint(true)

  // ------------------------------------------------------------------
  // K-MEANS‖ SEEDING (q259) — Bahmani et al. 2012, derandomized: the
  // lowest-id seeds (q226) are init-quality-degenerate (the first 8
  // vec_ids can all sit in one region); k-means‖ spreads seeds by
  // d²-weighted oversampling without kmeans++'s K sequential corpus
  // passes. Deterministic analog of each random choice:
  //   - the initial seed is the argmin of a multiplicative hash of
  //     vec_id (any fixed point would bias toward ingest order);
  //   - each oversampling round takes the top-2K points by the
  //     Efraimidis-Spirakis-style priority d²(x, C)·2³²/(h(x)+1) — a
  //     hash-uniform draw weighted by the squared distance to the
  //     current candidate set, exactly k-means‖'s l·d²/φ sampling with
  //     the randomness replaced by a pinned hash (priorities are IEEE
  //     doubles computed identically on both engines);
  //   - the reduction to K is k-means‖'s weighted re-clustering,
  //     derandomized to the greedy kmeans++ step: weight each
  //     candidate by the count of corpus points nearest to it, start
  //     from the heaviest, then K−1 times add the candidate maximizing
  //     w·d²(cand, chosen) — the D²-sampling argmax. (The first-cut
  //     "keep the K heaviest" reduction degenerates when the rounds
  //     cover every point — all weights 1, order collapses to id —
  //     which a spec's adversarial clumped-id layout exposes.)
  // Scale shape: per round ONE broadcast-argmin pass over the corpus
  // (the q226 assignment shape) + a 2K-row TakeOrdered; candidate
  // state is ≤ (1 + 2·2K) rows, so the greedy runs DRIVER-LOCAL on
  // bounded state (the q179 discipline) with arithmetic mirrored op
  // for op by the oracle's generated CTE chain. Hash arithmetic stays
  // in BIGINT (vec_id·2654435761 needs ids < 2⁶³/2654435761 ≈ 3.5e9 —
  // noted).

  private val OversampleRounds = 2
  private val OversampleL      = 2 * K

  /** min-d² to the current candidate set per vector (carries the
    * embedding through so rounds need no join back).
    */
  private def minDist(e: DataFrame, cands: DataFrame): DataFrame =
    e.crossJoin(broadcast(cands))
      .withColumn("d2", dist2)
      .groupBy(col("vec_id"))
      .agg(min(col("d2")).as("dmin"), first(col("embedding")).as("embedding"))

  /** The full deterministic k-means‖ seeding: K centroids, cid =
    * weight-rank.
    */
  private def seedKmeansParallel(e: DataFrame): DataFrame = {
    val c0 = e
      .withColumn("hh", pmod(col("vec_id") * lit(2654435761L), lit(4294967296L)))
      .orderBy(col("hh").asc, col("vec_id").asc).limit(1)
      .select(col("vec_id").as("cvid"), col("embedding").as("cvec"))
      .localCheckpoint(true)
    val cands = (1 to OversampleRounds).foldLeft(c0) { (c, r) =>
      val picks = minDist(e, c)
        .where(col("dmin") > 0)
        .withColumn("hh",
          pmod(col("vec_id") * lit(2246822519L) + lit(97L * r), lit(4294967296L)))
        .withColumn("pri",
          col("dmin") * lit(4294967296.0) / (col("hh") + lit(1L)).cast("double"))
        .orderBy(col("pri").desc, col("vec_id").asc).limit(OversampleL)
        .select(col("vec_id").as("cvid"), col("embedding").as("cvec"))
      c.unionByName(picks).localCheckpoint(true)
    }
    val weights = e.crossJoin(broadcast(cands))
      .withColumn("d2", dist2)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cvid"))).as("m"))
      .groupBy(col("m.cvid").as("cvid"))
      .agg(count(lit(1)).as("w"))
    // the candidate pool is ≤ 33 rows by construction — collect and run
    // the weighted kmeans++ greedy locally; d² folds in array order
    // exactly like the distributed dist2 / the oracle's list_sum
    val pool = weights.join(cands, "cvid")
      .select(col("cvid"), col("w"), col("cvec"))
      .collect()
      .map(r => (r.getAs[Long]("cvid"), r.getAs[Long]("w"),
        r.getAs[scala.collection.Seq[Float]]("cvec").toArray))
    def d2Local(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val dx = a(i).toDouble - b(i).toDouble
        acc += dx * dx
        i += 1
      }
      acc
    }
    // degenerate-corpus guard: with ≥ K geometrically distinct candidates
    // some unchosen candidate always has min-d² > 0 (so priority w·d² > 0)
    // and the argmax can never re-pick a chosen one (those score 0); with
    // fewer, the greedy WOULD silently duplicate centroids — fail loudly
    // instead (the oracle mirrors the greedy, not this precondition)
    require(pool.map(_._3.toSeq).distinct.length >= K,
      s"k-means|| candidate pool has fewer than $K distinct embeddings")
    val chosen = scala.collection.mutable.ArrayBuffer(
      pool.minBy { case (id, w, _) => (-w, id) })
    while (chosen.size < K) {
      val pick = pool
        .map { case (id, w, v) =>
          (id, w, v, w.toDouble * chosen.map(c => d2Local(v, c._3)).min)
        }
        .maxBy { case (id, _, _, p) => (p, -id) }
      chosen += ((pick._1, pick._2, pick._3))
    }
    val sess = e.sparkSession
    import sess.implicits._
    chosen.toSeq.zipWithIndex
      .map { case ((_, _, v), i) => (i, v.toSeq) }
      .toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>"))
  }

  // ------------------------------------------------------------------
  // NEAREST-CENTROID CLASSIFIER MACHINERY (q228/q229): train = one
  // (label, dim)-grain decimal-mean aggregate; apply = broadcast the
  // per-class centroids and take the aggregation-argmin. The per-class
  // (n, Σv) state is ADDITIVE — the maintained-state twin (q228)
  // merges per-batch partial sums by decimal addition, the q176/q207
  // MV pattern applied to centroid state.

  private def trainTest(e: DataFrame): (DataFrame, DataFrame) =
    (e.where(pmod(col("vec_id"), lit(5)) =!= 0),
      e.where(pmod(col("vec_id"), lit(5)) === 0))

  /** (label, pos)-grain additive state: count + decimal coordinate sum. */
  private def centroidState(train: DataFrame): DataFrame =
    train.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("double").cast(dt)).as("sv"))

  /** Fold state to float-narrowed per-class centroid arrays. */
  private def centroidsFromState(st: DataFrame): DataFrame =
    st.select(col("label"), col("pos"),
        (col("sv").cast("double") / col("n")).cast("float").as("m"))
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("clabel"), expr("transform(pm, x -> x.m)").as("cvec"))

  /** Classify the held-out vectors against the class centroids and
    * reduce to the (label, pred) confusion matrix.
    */
  private def confusion(test: DataFrame, cents: DataFrame): DataFrame =
    test.crossJoin(broadcast(cents))
      .withColumn("d2", dist2)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("clabel"))).as("m"),
        first(col("label")).as("label"))
      .groupBy(col("label"), col("m.clabel").as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Shared q228/q229 oracle: the one-shot train→classify SQL — the
    * incremental variant hash-matching it IS the merge ≡ recompute
    * proof.
    */
  private val confusionOracleSql: String = {
    val d2Sql =
      "list_sum(list_transform(list_zip(t.embedding, c.cvec), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    s"""
        WITH tr AS MATERIALIZED (
          SELECT label, embedding FROM embeddings WHERE vec_id % 5 <> 0),
        te AS MATERIALIZED (
          SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 5 = 0),
        st AS MATERIALIZED (
          SELECT label, CAST(u.i AS INT) AS pos, COUNT(*) AS n,
                 SUM(CAST(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE)
                   AS DECIMAL(28,12))) AS sv
          FROM tr, UNNEST(range(1, len(embedding) + 1)) AS u(i)
          GROUP BY label, CAST(u.i AS INT)),
        m AS MATERIALIZED (
          SELECT label, pos, CAST(CAST(sv AS DOUBLE) / n AS REAL) AS m
          FROM st),
        c AS MATERIALIZED (
          SELECT label AS clabel, list(m ORDER BY pos) AS cvec
          FROM m GROUP BY label),
        p AS MATERIALIZED (
          SELECT t.vec_id, t.label, c.clabel, $d2Sql AS d2
          FROM te t CROSS JOIN c),
        cl AS MATERIALIZED (
          SELECT vec_id, label, clabel AS pred FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, clabel ASC) AS rn FROM p) WHERE rn = 1)
        SELECT label, pred, COUNT(*) AS n FROM cl GROUP BY label, pred"""
  }

  /** Shared oracle fragments for the Lloyd-iteration queries (q226/
    * q230/q259): the e⨯c squared distance and one assignment→update
    * iteration as CTE text.
    */
  private val d2OracleSql: String =
    "list_sum(list_transform(list_zip(e.embedding, c.cvec), " +
      "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
      "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))"  +
      ")"

  private def iterOracleSql(i: Int, prev: String): String = s"""
        p$i AS MATERIALIZED (
          SELECT e.vec_id, c.cid, e.embedding, $d2OracleSql AS d2
          FROM e CROSS JOIN $prev c),
        a$i AS MATERIALIZED (
          SELECT vec_id, cid, d2, embedding FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, cid ASC) AS rn FROM p$i) WHERE rn = 1),
        m$i AS MATERIALIZED (
          SELECT cid, CAST(u.i AS INT) AS i,
                 CAST(CAST(SUM(CAST(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE)
                   AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS REAL) AS m
          FROM a$i, UNNEST(range(1, len(embedding) + 1)) AS u(i)
          GROUP BY cid, CAST(u.i AS INT)),
        c$i AS MATERIALIZED (
          SELECT cid, list(m ORDER BY i) AS cvec FROM m$i GROUP BY cid)"""

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // K-MEANS‖ SEEDED LLOYD — q226's 3 BSP iterations from the
    // deterministic k-means‖ seeds (see seedKmeansParallel): a hash-
    // argmin initial seed, 2 oversampling rounds of the top-2K points
    // by d²-weighted hash priority, and the weight-heaviest-K
    // reduction. Seeding is fully deterministic, so the whole fit
    // (seeds → 3 iterations → assignment) gates on a DuckDB oracle
    // replaying the identical chain; ClusteringSpec separately proves
    // the seeds' within-cluster SSE beats the lowest-id baseline.
    "q259_kmeans_parallel_init" -> QueryDef(
      fn = (s, d) => {
        val e = graft.CacheLeases.lease(embeddings(s, d).persist())
        val c0 = seedKmeansParallel(e)
        val cT = (1 to Iters).foldLeft(c0)((c, _) => update(assign(e, c)))
        assign(e, cT)
          .select(col("vec_id"), col("cid"), round(col("d2"), 6).as("dist2"))
      },
      oracle = Some {
        def roundSql(r: Int, prev: String): String = s"""
        dm$r AS MATERIALIZED (
          SELECT vec_id, MIN(d2) AS dmin FROM (
            SELECT e.vec_id, $d2OracleSql AS d2
            FROM e CROSS JOIN $prev c) GROUP BY vec_id),
        pk$r AS MATERIALIZED (
          SELECT e.vec_id AS cvid, e.embedding AS cvec
          FROM (SELECT vec_id, dmin,
                       (vec_id * 2246822519 + ${97L * r}) % 4294967296 AS hh
                FROM dm$r WHERE dmin > 0) t JOIN e ON e.vec_id = t.vec_id
          ORDER BY t.dmin * 4294967296.0 / CAST(hh + 1 AS DOUBLE) DESC,
                   e.vec_id ASC
          LIMIT $OversampleL),
        s$r AS MATERIALIZED (
          SELECT * FROM s${r - 1} UNION ALL SELECT * FROM pk$r)"""
        val rounds = (1 to OversampleRounds)
          .map(r => roundSql(r, if (r == 1) "s0" else s"s${r - 1}"))
          .mkString(",")
        val sN = s"s$OversampleRounds"
        val iters = (1 to Iters)
          .map(i => iterOracleSql(i, if (i == 1) "c0" else s"c${i - 1}"))
          .mkString(",")
        // the greedy w·d² selection, K−1 generated steps over the ≤33-row
        // candidate pool — the oracle-side mirror of the driver-local loop
        val d2Pair =
          "list_sum(list_transform(list_zip(c.cvec, h.cvec), " +
            "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
            "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
        val greedy = (2 to K).map { j =>
          s"""
        gd$j AS MATERIALIZED (
          SELECT c.cvid, MIN($d2Pair) AS dmin
          FROM cw c CROSS JOIN ch${j - 1} h GROUP BY c.cvid),
        gp$j AS MATERIALIZED (
          SELECT ${j - 1} AS cid, c.cvid, c.cvec
          FROM cw c JOIN gd$j d ON d.cvid = c.cvid
          ORDER BY c.w * d.dmin DESC, c.cvid ASC LIMIT 1),
        ch$j AS MATERIALIZED (
          SELECT * FROM ch${j - 1} UNION ALL SELECT * FROM gp$j)"""
        }.mkString(",")
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        s0 AS MATERIALIZED (
          SELECT vec_id AS cvid, embedding AS cvec
          FROM (SELECT *, (vec_id * 2654435761) % 4294967296 AS hh FROM e
                ORDER BY hh ASC, vec_id ASC LIMIT 1)),
        $rounds,
        wts AS MATERIALIZED (
          SELECT cvid, COUNT(*) AS w FROM (
            SELECT vec_id, cvid FROM (
              SELECT vec_id, cvid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY d2 ASC, cvid ASC) AS rn
              FROM (SELECT e.vec_id, c.cvid, $d2OracleSql AS d2
                    FROM e CROSS JOIN $sN c))
            WHERE rn = 1)
          GROUP BY cvid),
        cw AS MATERIALIZED (
          SELECT s.cvid, s.cvec, wts.w
          FROM $sN s JOIN wts ON wts.cvid = s.cvid),
        ch1 AS MATERIALIZED (
          SELECT 0 AS cid, cvid, cvec
          FROM (SELECT * FROM cw ORDER BY w DESC, cvid ASC LIMIT 1)),
        $greedy,
        c0 AS MATERIALIZED (
          SELECT CAST(cid AS INT) AS cid, cvec FROM ch$K),
        $iters,
        pf AS MATERIALIZED (
          SELECT e.vec_id, c.cid, $d2OracleSql AS d2
          FROM e CROSS JOIN c$Iters c)
        SELECT vec_id, cid, ROUND(d2, 6) AS dist2 FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2 ASC, cid ASC) AS rn FROM pf) WHERE rn = 1"""
      }
    ),

    // ----------------------------------------------------------------
    // K-MEANS LLOYD, K=8, 3 BSP iterations from lowest-vec_id seeds:
    // assignment is broadcast + aggregation-argmin, update is a
    // (cid, dim)-grain decimal mean — per iteration ONE keyed shuffle
    // of O(n) argmin rows and one of O(parts × K × d) partial means.
    // Output is the final per-vector assignment with its distance —
    // the row-grain gate proves every iteration's centroids matched.
    "q226_kmeans_lloyd" -> QueryDef(
      fn = (s, d) => {
        val e = graft.CacheLeases.lease(embeddings(s, d).persist())
        val c0 = seedCentroids(e)
        val cT = (1 to Iters).foldLeft(c0)((c, _) => update(assign(e, c)))
        assign(e, cT)
          .select(col("vec_id"), col("cid"), round(col("d2"), 6).as("dist2"))
      },
      oracle = Some {
        val iters = (1 to Iters)
          .map(i => iterOracleSql(i, if (i == 1) "c0" else s"c${i - 1}"))
          .mkString(",")
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
                 embedding AS cvec
          FROM (SELECT * FROM e ORDER BY vec_id LIMIT $K)),
        $iters,
        pf AS MATERIALIZED (
          SELECT e.vec_id, c.cid, $d2OracleSql AS d2
          FROM e CROSS JOIN c$Iters c)
        SELECT vec_id, cid, ROUND(d2, 6) AS dist2 FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2 ASC, cid ASC) AS rn FROM pf) WHERE rn = 1"""
      }
    ),

    // ----------------------------------------------------------------
    // NEAREST-CENTROID (Rocchio) CLASSIFIER — the embedding-space
    // quality/label classifier a curation pipeline trains constantly:
    // per-class centroid from the train split (vec_id % 5 ≠ 0), argmin
    // classification of the holdout, confusion matrix out. Train is
    // ONE (label, dim)-grain decimal aggregate (shuffle O(classes × d));
    // apply broadcasts the KB-scale centroid table — at 100 TB both
    // sides are one scan each.
    "q229_centroid_classifier" -> QueryDef(
      fn = (s, d) => {
        val (train, test) = trainTest(embeddings(s, d))
        confusion(test, centroidsFromState(centroidState(train)))
      },
      oracle = Some(confusionOracleSql)
    ),

    // ----------------------------------------------------------------
    // MAINTAINED CENTROID STATE — the centroid-state maintained-index
    // twin (the q176/q207 MV-merge pattern applied to q229): four
    // ingest batches each aggregate ONLY their own rows' (label, dim)
    // count+sum state (O(batch) work), merged into the stored table by
    // decimal addition; the classifier then folds centroids from the
    // merged state. Gated against q229's ONE-SHOT oracle — the hash
    // match IS the append ≡ recompute proof. At 100 TB a nightly
    // embedding ingest pays O(day) to refresh the classifier, never
    // O(history).
    "q228_centroid_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q228_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          val (train, test) = trainTest(embeddings(s, d))
          for (b <- 0 until 4) {
            val batch = centroidState(train.where(pmod(col("vec_id"), lit(4)) === b))
            val merged =
              if (wh.exists("gold", "mv_centroid_state"))
                wh.load("gold", "mv_centroid_state").unionByName(batch)
                  .groupBy(col("label"), col("pos"))
                  .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
              else batch
            wh.overwrite(merged, "gold", "mv_centroid_state")
          }
          val st = wh.load("gold", "mv_centroid_state")
            .select(col("label"), col("pos"),
              col("n").cast("long").as("n"), col("sv").cast(dt).as("sv"))
          confusion(test, centroidsFromState(st)).localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(confusionOracleSql)
    ),

    // ----------------------------------------------------------------
    // STREAMING CENTROID MAINTENANCE — q228's batch merge run as a
    // real Structured Streaming pipeline (the q216/q212 foreachBatch
    // discipline): train embeddings arrive as 3 mtime-ordered
    // micro-batch slices, each batch aggregates its OWN (label, dim)
    // count+sum partials and merges them into the stored state table;
    // the classifier folds centroids from the final state. Additive
    // state needs no arrival order, so streamed ≡ one-shot — gated
    // against q229's oracle. Completes the streaming/batch maintenance
    // symmetry for the centroid state class (bands q189/q202, postings
    // q187/q203, OLS moments q207/q216, forecast q210/q212).
    "q231_stream_centroid_maintenance" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files.createTempDirectory("graft_q231_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            val staged = graft.sources.SliceStager.stage(
              "graft_stream_centroid_slices",
              java.nio.file.Paths.get(d, "embeddings.parquet"),
              slices = 3,
              g => embeddings(s, d).where(pmod(col("vec_id"), lit(3)) === g))
            val stream = s.readStream
              .schema(embeddings(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(staged)
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                  val bm = centroidState(
                    batch.toDF().where(pmod(col("vec_id"), lit(5)) =!= 0))
                  val merged =
                    if (wh.exists("gold", "mv_stream_centroid_state"))
                      wh.load("gold", "mv_stream_centroid_state").unionByName(bm)
                        .groupBy(col("label"), col("pos"))
                        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
                    else bm
                  wh.overwrite(merged, "gold", "mv_stream_centroid_state")
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            val st = wh.load("gold", "mv_stream_centroid_state")
              .select(col("label"), col("pos"),
                col("n").cast("long").as("n"), col("sv").cast(dt).as("sv"))
            confusion(trainTest(embeddings(s, d))._2, centroidsFromState(st))
              .localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some(confusionOracleSql)
    ),

    // ----------------------------------------------------------------
    // CLUSTER QUALITY — simplified silhouette (the scalable variant:
    // distance-to-centroids only, never pairwise): per vector a = dist
    // to its own centroid, b = dist to the nearest OTHER centroid,
    // s = (b − a) / max(a, b); reported per cluster. Both distances
    // fall out of the SAME n×K frame q226's assignment already
    // computes — the sorted 8-element per-vector list gives first and
    // second nearest in one aggregate, so the metric costs one extra
    // scan over the final centroids, no pairwise pass.
    "q230_cluster_silhouette" -> QueryDef(
      fn = (s, d) => {
        val e = graft.CacheLeases.lease(embeddings(s, d).persist())
        val c0 = seedCentroids(e)
        val cT = (1 to Iters).foldLeft(c0)((c, _) => update(assign(e, c)))
        val two = e.crossJoin(broadcast(cT))
          .withColumn("dist", sqrt(dist2))
          .groupBy(col("vec_id"))
          .agg(slice(sort_array(collect_list(struct(col("dist"), col("cid")))), 1, 2).as("t2"))
          .select(col("vec_id"),
            col("t2")(0).getField("cid").as("cid"),
            col("t2")(0).getField("dist").as("a"),
            col("t2")(1).getField("dist").as("b"))
        val sil = when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b")))
        two.withColumn("sil", sil)
          .groupBy(col("cid"))
          .agg(count(lit(1)).as("n"),
            round(sum(sil.cast(DecimalType(38, 10))).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_sil"))
      },
      oracle = Some {
        val iters = (1 to Iters)
          .map(i => iterOracleSql(i, if (i == 1) "c0" else s"c${i - 1}"))
          .mkString(",")
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
                 embedding AS cvec
          FROM (SELECT * FROM e ORDER BY vec_id LIMIT $K)),
        $iters,
        pf AS MATERIALIZED (
          SELECT e.vec_id, c.cid, SQRT($d2OracleSql) AS dist
          FROM e CROSS JOIN c$Iters c),
        two AS MATERIALIZED (
          SELECT vec_id,
                 MAX(CASE WHEN rn = 1 THEN cid END) AS cid,
                 MAX(CASE WHEN rn = 1 THEN dist END) AS a,
                 MAX(CASE WHEN rn = 2 THEN dist END) AS b
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY dist ASC, cid ASC) AS rn FROM pf)
          WHERE rn <= 2 GROUP BY vec_id),
        sil AS MATERIALIZED (
          SELECT vec_id, cid,
                 CASE WHEN GREATEST(a, b) = 0.0 THEN 0.0
                      ELSE (b - a) / GREATEST(a, b) END AS sil
          FROM two)
        SELECT cid, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(sil AS DECIMAL(38,10))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 6) AS avg_sil
        FROM sil GROUP BY cid"""
      }
    )
  )
}
