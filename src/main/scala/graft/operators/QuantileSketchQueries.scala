package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A MERGEABLE QUANTILE SKETCH as maintained warehouse state — the
  * member the sketch family was missing (CMS q168 counts, HLL++ q171
  * cardinality, KMV q42/q177 distincts; percentile contracts q141
  * re-scan): a bottom-K-by-salted-hash rank sample per group.
  *
  * Why bottom-K-by-hash: the K rows whose deterministic salted hash is
  * smallest form a uniform random sample of the group that is
  *   - DETERMINISTIC (md5 — both engines derive the identical sample,
  *     so unlike GK/t-digest the STATE itself is hash-gateable),
  *   - MERGEABLE and associative (bottom-K of a union = bottom-K of
  *     the parts' bottom-Ks — every global winner survives its own
  *     batch), the q288 additive-state property with min-heap algebra,
  *   - rank-accurate to ~n·sqrt(p(1-p)/K) (a size-K SRS), which the
  *     q303 contract gate measures against an exact counting pass the
  *     way q141 gates percentile_approx.
  *
  * Scale: the build rides [[RankSelect.withGroupRanks]] on the hash
  * (value-range-histogram kernel — uniform hashes bucket evenly, no
  * task ever sorts more than ~n/1024 rows however few groups); the
  * maintained twin re-ranks only O(K × batches) stored rows per
  * refresh and never rescans history; the query sorts ≤K rows per
  * group and pays ONE exact counting pass only to GATE the contract
  * (production reads the sketch alone).
  */
object QuantileSketchQueries extends QueryModule {

  import Tables._

  /** Sketch size per group: rank error ~ n·sqrt(p(1-p)/K) ≈ 3% of n. */
  private[operators] val K = 256

  /** Contract quantiles as exact integer fractions (label, num, den). */
  private val Ps = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10))

  /** (seg, key, v): the measured relation — order totals per market
    * segment (the q99/q141 grouping, so the three quantile operators
    * stay comparable).
    */
  private def base(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderkey").as("key"),
        col("o_totalprice").as("v"))

  private val baseSql =
    """SELECT c_mktsegment AS seg, o_orderkey AS key, o_totalprice AS v
          FROM orders JOIN customer ON o_custkey = c_custkey"""

  /** The deterministic salt: 48 bits of md5 over the row key (the q160
    * epoch-shuffle pattern — identical integer on both engines).
    */
  private def hCol = conv(
    substring(md5(concat(lit("qs:"), col("key").cast("string"))), 1, 12),
    16, 10).cast("long")

  private val hSql =
    "CAST('0x' || substr(md5('qs:' || CAST(key AS VARCHAR)), 1, 12) AS BIGINT)"

  /** One group's bottom-K state rows from an arbitrary (seg, key, v)
    * slice: (seg, rk, h, key, v) ranked by (h, key) through the
    * RankSelect kernel, plus the slice's per-seg total n.
    */
  private[operators] def sketchRows(slice: DataFrame): DataFrame =
    RankSelect
      .withGroupRanks(slice.withColumn("h", hCol), "seg", "h",
        tieBreak = Seq("key"))
      .where(col("__rk_rn") <= K)
      .select(col("seg"), col("__rk_rn").as("rk"), col("h"), col("key"),
        col("v"), col("__rk_n").as("n"))

  /** Merge one slice's sketch into the stored state table: the slice
    * sketches ALONE (bottom-K + a count per seg), then the stored rows
    * re-rank over the O(K × 2)-per-seg union and counts add — shared
    * by the batch-maintained (q302) and streaming (q304) twins.
    *
    * Write-back consolidation (the r12 verdict's q302 wall item): ONE
    * kernel pass per slice — the rank kernel already carries the
    * per-seg slice count (`__rk_n` → `n`), so the batch count needs no
    * second slice scan — and ONE state table per cycle: the running
    * per-seg total rides as a constant `n` column on the bottom-K rows
    * instead of a separate counts table, halving the tiny-parquet
    * round-trips that dominated the wall (the data is O(K) per seg
    * either way).
    */
  private def mergeSketchBatch(wh: graft.etl.Warehouse, slice: DataFrame): Unit = {
    val sk = sketchRows(slice).persist()
    try {
      val state =
        if (!wh.exists("gold", "mv_qsketch_rows"))
          sk.select(col("seg"), col("h"), col("key"), col("v"),
            col("n").cast("long").as("n"))
        else {
          val stored = wh.load("gold", "mv_qsketch_rows")
          // per-seg totals: the stored n is constant per seg, the batch
          // n likewise — full outer so a seg seen by only one side keeps
          // its count
          val totals = stored.select(col("seg"), col("n")).distinct()
            .withColumnRenamed("n", "n_old")
            .join(sk.select(col("seg"), col("n").as("n_new")).distinct(),
              Seq("seg"), "full_outer")
            .select(col("seg"),
              (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
                .cast("long").as("n"))
          val w = Window.partitionBy(col("seg"))
            .orderBy(col("h").asc, col("key").asc)
          // the merge frame is O(K × 2) per seg — the bounded-state
          // window, not a fact-grain sort
          stored.drop("n")
            .unionByName(sk.select(col("seg"), col("h"), col("key"), col("v")))
            .withColumn("rk", row_number().over(w))
            .where(col("rk") <= K)
            .drop("rk")
            .join(broadcast(totals), "seg")
            .select(col("seg"), col("h"), col("key"), col("v"), col("n"))
        }
      wh.overwrite(state, "gold", "mv_qsketch_rows")
    } finally sk.unpersist(false)
  }

  /** The stored state read back in q301's gate shape. */
  private def sketchState(wh: graft.etl.Warehouse): DataFrame = {
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("h").asc, col("key").asc)
    wh.load("gold", "mv_qsketch_rows")
      .withColumn("rk", row_number().over(w))
      .select(col("seg"), col("rk").cast("long").as("rk"), col("h"),
        col("key"), col("v"), col("n"))
  }

  /** The one-shot build oracle — shared by q301 and the maintained
    * twins q302/q304, whose hash match against the SAME text is the
    * merge ≡ recompute proof (bottom-K associativity made a gate).
    */
  private lazy val buildOracle: Option[String] = Some(s"""
        WITH j AS MATERIALIZED (
          SELECT seg, key, v, $hSql AS h FROM ($baseSql)),
        rk AS MATERIALIZED (
          SELECT seg, key, v, h,
                 ROW_NUMBER() OVER (PARTITION BY seg ORDER BY h ASC, key ASC) AS rk,
                 COUNT(*) OVER (PARTITION BY seg) AS n
          FROM j)
        SELECT seg, CAST(rk AS BIGINT) AS rk, h, key, v, CAST(n AS BIGINT) AS n
        FROM rk WHERE rk <= $K""")

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // BUILD — the sketch state itself, hash-gated: per segment the K
    // rows with the smallest deterministic salted hash, ranked through
    // the RankSelect kernel (uniform hash keys bucket evenly — no
    // per-segment single-task sort), with the segment's exact count.
    "q301_quantile_sketch_build" -> QueryDef(
      fn = (s, d) => sketchRows(base(s, d)),
      oracle = buildOracle
    ),

    // ----------------------------------------------------------------
    // MAINTAINED SKETCH — the state class completed: four ingest
    // batches each sketch ONLY their own rows (bottom-K per batch +
    // a batch count), and the stored state merges by re-ranking the
    // O(K × 2) union and adding counts — never a history rescan.
    // Bottom-K is associative (a global winner wins its batch), so
    // maintained ≡ one-shot, gated against q301's oracle verbatim.
    "q302_quantile_sketch_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot =
          java.nio.file.Files.createTempDirectory("graft_q302_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          // persisted once: all four slice filters ride the cached
          // orders⋈customer relation instead of re-running the join
          // per batch (the other half of the r12 q302 wall)
          val all = graft.CacheLeases.lease(base(s, d).persist())
          for (b <- 0 until 4)
            mergeSketchBatch(wh, all.where(col("key") % 4 === b))
          sketchState(wh).localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(
          java.nio.file.Paths.get(whRoot))
      },
      oracle = buildOracle
    ),

    // ----------------------------------------------------------------
    // STREAMING SKETCH MAINTENANCE — q302's merges run as a real
    // Structured Streaming pipeline (the q231/q294 foreachBatch
    // discipline): order slices arrive as 3 mtime-ordered micro-
    // batches, each enriches against the static customer dim, sketches
    // its OWN rows and merges into the stored state. Bottom-K is
    // associative and order-free, so streamed ≡ batch-merged ≡
    // one-shot — gated against q301's oracle verbatim. Keeps the new
    // state class symmetric with every other maintained state (bands,
    // postings, moments, centroids, spans, forecasts, NB counts).
    "q304_quantile_sketch_stream" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot =
            java.nio.file.Files.createTempDirectory("graft_q304_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            val staged = graft.sources.SliceStager.stage(
              "graft_stream_qsketch_slices",
              java.nio.file.Paths.get(d, "orders.parquet"),
              slices = 3,
              g => orders(s, d).where(pmod(col("o_orderkey"), lit(3)) === g))
            val stream = s.readStream
              .schema(orders(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(staged)
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                 _: Long) =>
                  // the static dim enrich reads through the MICRO-BATCH
                  // session (each batch frame lives in a session clone)
                  mergeSketchBatch(wh, batch.toDF()
                    .join(customer(batch.sparkSession, d),
                      col("o_custkey") === col("c_custkey"))
                    .select(col("c_mktsegment").as("seg"),
                      col("o_orderkey").as("key"), col("o_totalprice").as("v")))
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            sketchState(wh).localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = buildOracle
    ),

    // ----------------------------------------------------------------
    // QUERY + CONTRACT — quantiles read from the sketch alone (sort
    // the ≤K sample by value, pick the element at ceil(p·m) — exact
    // integer arithmetic), then GATED the q141 way: one exact counting
    // pass measures each estimate's true rank interval and the oracle
    // pins every tolerance boolean TRUE with tol = 3n/√K + 1 (≈ 6σ of
    // the size-K sample's rank error — deterministic, so it never
    // flakes; ~0.19n, still sharp enough to separate adjacent
    // quartiles). Segments smaller than K are sketch-exact by
    // construction and pass with interval width 0.
    "q303_quantile_sketch_query" -> QueryDef(
      fn = (s, d) => {
        val j = graft.CacheLeases.lease(base(s, d).persist())
        val sk = sketchRows(j)
        val wVal = Window.partitionBy(col("seg"))
          .orderBy(col("v").asc, col("key").asc)
        val wSeg = Window.partitionBy(col("seg"))
        val ranked = sk
          .withColumn("vr", row_number().over(wVal))
          .withColumn("m", count(lit(1)).over(wSeg))
        val ests = Ps.map { case (lbl, num, den) =>
          ranked.where(col("vr") === expr(s"(m * $num + ${den - 1}) div $den"))
            .select(col("seg"), col("m"), col("v").as(s"est_$lbl"))
        }.reduce(_.join(_, Seq("seg", "m")))
        val aggCols = max(col("m")).as("m") +:
          Ps.flatMap { case (lbl, _, _) =>
            Seq(
              sum(when(col("v") <= col(s"est_$lbl"), 1L).otherwise(0L)).as(s"le_$lbl"),
              sum(when(col("v") < col(s"est_$lbl"), 1L).otherwise(0L)).as(s"lt_$lbl"))
          }
        val counted = j.join(broadcast(ests), "seg")
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), aggCols: _*)
        val okCols = Ps.map { case (lbl, num, den) =>
          val nD = col("n").cast("double")
          val p = lit(num.toDouble / den.toDouble)
          val tol = lit(3.0) * nD / math.sqrt(K.toDouble) + lit(1.0)
          (col(s"le_$lbl").cast("double") >= p * nD - tol &&
            (col(s"lt_$lbl") + lit(1L)).cast("double") <= p * nD + tol)
            .as(s"${lbl}_ok")
        }
        counted.select(col("seg") +: col("n") +: col("m").cast("long").as("m") +:
          okCols: _*)
      },
      oracle = Some(s"""
        SELECT c_mktsegment AS seg, COUNT(*) AS n,
               LEAST($K, COUNT(*)) AS m,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1""")
    )
  )
}
