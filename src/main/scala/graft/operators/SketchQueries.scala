package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Approximate-aggregate and skew-handling operators.
  *
  * The KMV (k-minimum-values) distinct-count sketch is chosen over HLL
  * here because its estimate is a pure function of md5 hashes — exactly
  * reproducible in the ANSI-SQL oracle, which a native HLL register
  * layout is not. A production deployment would use
  * `approx_count_distinct` (HLL++, mergeable, 1 pass); this query
  * documents the sketch mechanics and verifies them cross-engine.
  */
object SketchQueries extends QueryModule {

  import Tables._

  private val K = 64

  /** THE KMV estimator — (K−1)/u_K with the under-filled degenerate
    * branch — as one Column expression and one SQL fragment, shared by
    * q42 (single pass) and q177 (batch-merged state) so an estimator
    * change can never land in one and not the other.
    */
  private def kmvEstimate(nMin: org.apache.spark.sql.Column, hk: org.apache.spark.sql.Column) =
    when(nMin < K, nMin.cast("double"))
      .otherwise(lit((K - 1).toDouble) /
        (conv(substring(hk, 1, 8), 16, 10).cast("long").cast("double") / 4294967296.0))

  private def kmvEstimateSql(nMin: String, hk: String): String = s"""
    CASE WHEN $nMin < $K THEN CAST($nMin AS DOUBLE)
         ELSE ${(K - 1).toDouble} /
              (CAST(CAST(concat('0x', substr($hk, 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
    END"""

  /** Count-Min grid geometry: D=3 rows of W=64 counters — small enough
    * that the sf-corpus collision mass is visibly nonzero (the
    * overcount column demonstrates the one-sided error) while the grid
    * stays a fixed 192-cell state at any corpus size. Declared ABOVE
    * `rawQueries` (which bakes them into oracle SQL) so initialization
    * order stays correct even if the val ever becomes strict.
    */
  private val CmDepth = 3
  private val CmWidth = 64

  /** Fixed probe tokens: two corpus-frequent, one domain term, one
    * absent (its estimate is pure collision mass — still >= exact 0).
    */
  private val CmProbes = Seq("the", "data", "spark", "zzqxv")

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private lazy val rawQueries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // KMV distinct-count sketch vs exact COUNT(DISTINCT): estimate =
    // (k-1) / u_k where u_k is the k-th smallest hash mapped to (0,1].
    // The bottom-k aggregator truncates map-side (buffer <= K rows per
    // group per task, dedup intrinsic), so the shuffle carries
    // O(K x groups) rows — not the full distinct hash set a
    // DISTINCT + row_number() window would sort.
    "q42_kmv_distinct" -> QueryDef(
      fn = (s, d) => {
        val li = lineitem(s, d)
        val kmv = org.apache.spark.sql.functions.udaf(
          KmvAggregator.bottomKDistinct(K),
          org.apache.spark.sql.Encoders.STRING)
        val stats = li
          .select(
            col("l_returnflag"),
            md5(col("l_orderkey").cast("string").cast("binary")).as("h")
          )
          .groupBy(col("l_returnflag"))
          .agg(kmv(col("h")).as("sk"))
          .select(
            col("l_returnflag"),
            col("sk.n_min").as("n_min"),
            col("sk.hk").as("hk")
          )
        val exact = li
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        stats
          .join(exact, "l_returnflag")
          .withColumn("kmv_estimate", kmvEstimate(col("n_min"), col("hk")))
          .select(col("l_returnflag"), col("exact_distinct"), col("kmv_estimate"))
      },
      oracle = Some(s"""
        WITH hashed AS (
          SELECT DISTINCT l_returnflag, md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM hashed),
        stats AS (
          SELECT l_returnflag, COUNT(*) AS n_min,
                 MAX(CASE WHEN rn = $K THEN h END) AS hk
          FROM ranked WHERE rn <= $K GROUP BY 1),
        exact AS (
          SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
          FROM lineitem GROUP BY 1)
        SELECT s.l_returnflag, e.exact_distinct,
               ${kmvEstimateSql("s.n_min", "s.hk")} AS kmv_estimate
        FROM stats s JOIN exact e USING (l_returnflag)""")
    ),

    // ----------------------------------------------------------------
    // Salted skew join ≡ plain join: the oracle is the UNSALTED join, so
    // the check proves salting preserves join semantics exactly.
    "q43_salted_join" -> QueryDef(
      fn = (s, d) =>
        SkewJoin
          .saltedJoin(
            large = orders(s, d),
            small = customer(s, d).withColumnRenamed("c_custkey", "o_custkey"),
            keys = Seq("o_custkey"),
            buckets = 8
          )
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("key_sum")
          ),
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")
    ),

    // ----------------------------------------------------------------
    // KMV SET ALGEBRA: union-size and Jaccard estimates between two key
    // sets (orders with returned items vs orders with accepted items)
    // computed from their bottom-K signatures ALONE. Signature
    // construction is the map-side-truncated bottomKSignature aggregator
    // (shuffle O(K x 2), never O(n)); the merge/estimate stage then
    // works on two K-row arrays — constant-size regardless of corpus —
    // which is the whole point of sketch algebra at 100 TB: set overlap
    // across e.g. daily partitions without re-scanning either side.
    // Exact counts ride along to show the estimate's quality; estimates
    // are round-6 doubles (division is the only nonlinear step).
    "q118_kmv_set_algebra" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = lineitem(s, d).where(col("l_returnflag").isin("A", "R"))
        val kmvSig = org.apache.spark.sql.functions.udaf(
          KmvAggregator.bottomKSignature(K),
          org.apache.spark.sql.Encoders.STRING)
        val sigs = li
          .select(
            col("l_returnflag"),
            md5(col("l_orderkey").cast("string").cast("binary")).as("h"))
          .groupBy(col("l_returnflag"))
          .agg(kmvSig(col("h")).as("sig"))
        // From here on every input is O(K): 2 signatures -> <= 2K rows.
        val exploded = sigs.select(col("l_returnflag"), explode(col("sig")).as("h"))
        val byHash = exploded
          .groupBy(col("h"))
          .agg(countDistinct(col("l_returnflag")).as("nf"))
        // Single-partition window is deliberate: the input is <= 2K rows
        // by construction (sketch property), not data-dependent.
        val su = byHash
          .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
          .where(col("rn") <= K)
        val sketch = su.agg(
          count(lit(1)).as("union_sig_size"),
          sum(when(col("nf") === 2, 1L).otherwise(0L)).as("inter_in_sig"),
          max(col("h")).as("hk"))
        val exact = li
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_returnflag")).as("nf"))
          .agg(
            count(lit(1)).as("union_exact"),
            sum(when(col("nf") === 2, 1L).otherwise(0L)).as("inter_exact"))
        sketch
          .crossJoin(exact)
          .withColumn(
            "u",
            conv(substring(col("hk"), 1, 8), 16, 10).cast("long").cast("double") / 4294967296.0)
          .select(
            col("union_sig_size"),
            col("inter_in_sig"),
            round(col("inter_in_sig").cast("double") / col("union_sig_size"), 6)
              .as("jaccard_est"),
            when(col("union_sig_size") < K, col("union_sig_size").cast("double"))
              .otherwise(round(lit((K - 1).toDouble) / col("u"), 6))
              .as("union_est"),
            col("union_exact"),
            col("inter_exact"),
            round(col("inter_exact").cast("double") / col("union_exact"), 6)
              .as("jaccard_exact"))
      },
      oracle = Some(s"""
        WITH li AS (
          SELECT l_orderkey, l_returnflag, md5(CAST(l_orderkey AS VARCHAR)) AS h
          FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        sigs AS (
          SELECT l_returnflag, h FROM (
            SELECT DISTINCT l_returnflag, h,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
            FROM (SELECT DISTINCT l_returnflag, h FROM li))
          WHERE rn <= $K),
        by_hash AS (
          SELECT h, COUNT(DISTINCT l_returnflag) AS nf FROM sigs GROUP BY h),
        su AS (
          SELECT h, nf, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM by_hash),
        sketch AS (
          SELECT COUNT(*) AS union_sig_size,
                 CAST(SUM(CASE WHEN nf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_in_sig,
                 MAX(h) AS hk
          FROM su WHERE rn <= $K),
        exact AS (
          SELECT COUNT(*) AS union_exact,
                 CAST(SUM(CASE WHEN nf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS inter_exact
          FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS nf FROM li GROUP BY 1))
        SELECT union_sig_size, inter_in_sig,
               ROUND(CAST(inter_in_sig AS DOUBLE) / union_sig_size, 6) AS jaccard_est,
               CASE WHEN union_sig_size < $K THEN CAST(union_sig_size AS DOUBLE)
                    ELSE ROUND(${(K - 1).toDouble} /
                         (CAST(CAST(concat('0x', substr(hk, 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0), 6)
               END AS union_est,
               union_exact, inter_exact,
               ROUND(CAST(inter_exact AS DOUBLE) / union_exact, 6) AS jaccard_exact
        FROM sketch, exact""")
    ),

    // ----------------------------------------------------------------
    // HEAVY HITTERS — Misra-Gries candidate pruning + exact recount.
    // Stage 1 summarizes the token stream into m=32 counters (partial
    // aggregation: each map task keeps <= m rows, the single merged
    // summary is O(m)); every token with frequency > N/(m+1) is
    // GUARANTEED present (see MisraGriesAggregator). Stage 2 recounts
    // exactly, but only for candidate tokens — the broadcast semi-join
    // filters map-side, so the counting shuffle carries candidate rows
    // only, never the full per-token table. The final threshold
    // (freq > 1/29, i.e. cnt*29 > N) lies inside the guarantee bound
    // (1/33), so the output is EXACT and partition-order-independent —
    // which is what the oracle (plain GROUP BY + HAVING) verifies.
    // On this corpus (31-token vocabulary) the summary never evicts;
    // MisraGriesSpec exercises the eviction + merge path on a skewed
    // synthetic stream.
    "q126_heavy_hitters" -> QueryDef(
      fn = (s, d) => {
        val m = 32
        val toks = documents(s, d)
          .select(explode(split(
            graft.functions.TextFunctions.normalizeText(col("text")), " ")).as("tok"))
        val mg = org.apache.spark.sql.functions.udaf(
          MisraGriesAggregator.candidates(m),
          org.apache.spark.sql.Encoders.STRING)
        val cands = toks.agg(mg(col("tok")).as("cand"))
          .select(explode(col("cand")).as("tok"))
        val total = toks.agg(count(lit(1)).as("n_total"))
        toks
          .join(broadcast(cands), Seq("tok"))
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .where(col("cnt") * 29 > col("n_total"))
          .select(
            col("tok"), col("cnt"), col("n_total"),
            round(col("cnt").cast("double") / col("n_total"), 6).as("frac"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT u.tok
          FROM (SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
                FROM documents),
               UNNEST(w) AS u(tok)),
        tot AS (SELECT COUNT(*) AS n_total FROM toks)
        SELECT tok, COUNT(*) AS cnt, n_total,
               ROUND(CAST(COUNT(*) AS DOUBLE) / n_total, 6) AS frac
        FROM toks, tot
        GROUP BY tok, n_total
        HAVING COUNT(*) * 29 > n_total""")
    ),

    // ----------------------------------------------------------------
    // COUNT-MIN SKETCH point estimates (Cormode & Muthukrishnan '05) —
    // the third sketch family next to KMV (distinct) and Misra-Gries
    // (heavy hitters): a depth×width integer grid answering frequency
    // point queries with a one-sided (over-)estimate. Like q42, the
    // hashes are md5-derived so the oracle reproduces the grid cell by
    // cell; a production build would wrap the same grid in a typed
    // Aggregator, but the relational form IS the mergeable layout: the
    // token stream collapses to vocab grain map-side, explodes DEPTH
    // rows per vocab entry, and the grid is a (r, b)-keyed integer sum
    // — fixed D·W cells of state however large the corpus, the
    // definition of a mergeable sketch. Probes broadcast; the exact
    // side exists only to gate the ε-overestimate invariant.
    "q168_count_min" -> QueryDef(
      fn = (s, d) => {
        val (depth, width) = (CmDepth, CmWidth)
        def bucket(tok: org.apache.spark.sql.Column, r: Int) =
          conv(substring(md5(concat(lit(s"cm$r:"), tok).cast("binary")), 1, 8), 16, 10)
            .cast("long") % width
        val toks = documents(s, d)
          .select(explode(split(
            graft.functions.TextFunctions.normalizeText(col("text")), " ")).as("tok"))
          .where(col("tok") =!= "")
        // vocab grain (small): pinned because the grid build and the
        // exact probe counts both read it — one corpus pass, not two
        val vocab = graft.CacheLeases.lease(
          toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt")).persist())
        val cells = vocab
          .select(col("cnt"), explode(array((0 until depth).map { r =>
            struct(lit(r).as("r"), bucket(col("tok"), r).as("b"))
          }: _*)).as("rb"))
          .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
        val probes = s.range(1)
          .select(explode(array(CmProbes.map(lit): _*)).as("probe"))
        val est = probes
          .select(col("probe"), explode(array((0 until depth).map { r =>
            struct(lit(r).as("r"), bucket(col("probe"), r).as("b"))
          }: _*)).as("rb"))
          .select(col("probe"), col("rb.r").as("r"), col("rb.b").as("b"))
          .join(cells, Seq("r", "b"), "left")
          .groupBy(col("probe"))
          .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
        val exact = vocab
          .where(col("tok").isin(CmProbes: _*))
          .select(col("tok").as("probe"), col("cnt").as("exact_cnt"))
        est
          .join(broadcast(exact), Seq("probe"), "left")
          .select(col("probe"),
            coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
            col("cm_est"),
            (col("cm_est") - coalesce(col("exact_cnt"), lit(0L))).as("overcount"))
      },
      oracle = Some {
        val probeVals = CmProbes.map(p => s"('$p')").mkString(", ")
        def bSql(tok: String, r: String) =
          s"CAST(concat('0x', substr(md5('cm' || $r || ':' || $tok), 1, 8)) AS BIGINT) % $CmWidth"
        s"""
        WITH toks AS (
          SELECT u.tok
          FROM (SELECT string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
                FROM documents),
               UNNEST(w) AS u(tok)
          WHERE u.tok <> ''),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        cells AS (
          SELECT d.r, ${bSql("tok", "CAST(d.r AS VARCHAR)")} AS b,
                 CAST(SUM(cnt) AS BIGINT) AS c
          FROM vocab, UNNEST([0, 1, 2]) AS d(r) GROUP BY 1, 2),
        probes(probe) AS (VALUES $probeVals),
        pe AS (
          SELECT probe, d.r, ${bSql("probe", "CAST(d.r AS VARCHAR)")} AS b
          FROM probes, UNNEST([0, 1, 2]) AS d(r)),
        est AS (
          SELECT pe.probe, CAST(MIN(COALESCE(cells.c, 0)) AS BIGINT) AS cm_est
          FROM pe LEFT JOIN cells ON cells.r = pe.r AND cells.b = pe.b
          GROUP BY pe.probe)
        SELECT est.probe,
               CAST(COALESCE(vocab.cnt, 0) AS BIGINT) AS exact_cnt,
               est.cm_est,
               CAST(est.cm_est - COALESCE(vocab.cnt, 0) AS BIGINT) AS overcount
        FROM est LEFT JOIN vocab ON vocab.tok = est.probe"""
      }
    ),

    "q171_hll_distinct_contract" -> QueryDef(
      fn = q171,
      oracle = Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_distinct,
               TRUE AS within_3rsd
        FROM lineitem GROUP BY l_returnflag""")
    ),

    // ----------------------------------------------------------------
    // SKETCH-STATE MV: the q176 incremental-rollup pattern with a KMV
    // signature as the stored state — 4 batch refreshes each merge
    // their bottom-K into the warehouse table (explode ≤K rows +
    // re-aggregate, never a history rescan), and because bottom-K of a
    // union IS the bottom-K of merged bottom-Ks, the final estimate
    // equals the one-shot single-pass signature EXACTLY, which is what
    // the oracle computes. This is the daily-partition pattern at
    // 100 TB: distinct-count state that days/batches merge in O(K·
    // groups) without touching history (Agarwal et al.'s mergeable
    // summaries, stored in a table instead of an aggregation buffer).
    "q177_mv_sketch_merge" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q177_wh_").toString
        try {
        val wh = new graft.etl.Warehouse(s, whRoot)
        val kmvSig = org.apache.spark.sql.functions.udaf(
          KmvAggregator.bottomKSignature(K),
          org.apache.spark.sql.Encoders.STRING)
        for (b <- 0 until 4) {
          val part = lineitem(s, d)
            .where(col("l_orderkey") % 4 === b)
            .select(col("l_returnflag"),
              md5(col("l_orderkey").cast("string").cast("binary")).as("h"))
            .groupBy(col("l_returnflag"))
            .agg(kmvSig(col("h")).as("sig"))
          val merged =
            if (wh.exists("gold", "mv_kmv"))
              wh.load("gold", "mv_kmv").unionByName(part)
                .select(col("l_returnflag"), explode(col("sig")).as("h"))
                .groupBy(col("l_returnflag"))
                .agg(kmvSig(col("h")).as("sig"))
            else part
          wh.overwrite(merged, "gold", "mv_kmv")
        }
        // localCheckpoint pins the tiny final MV in memory so the temp
        // warehouse can be deleted before the caller materializes; the
        // finally guarantees the /tmp tree is dropped even on failure
        wh.load("gold", "mv_kmv")
          .select(col("l_returnflag"),
            size(col("sig")).cast("long").as("n_min"),
            array_max(col("sig")).as("hk"))
          .select(col("l_returnflag"), col("n_min"),
            kmvEstimate(col("n_min"), col("hk")).as("kmv_estimate"))
          .localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(s"""
        WITH hashed AS (
          SELECT DISTINCT l_returnflag, md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM hashed)
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_min,
               ${kmvEstimateSql("COUNT(*)", s"MAX(CASE WHEN rn = $K THEN h END)")} AS kmv_estimate
        FROM ranked WHERE rn <= $K GROUP BY 1""")
    )
  )

  /** q171: gate Spark's PRODUCTION distinct-count path the way q141
    * gates percentile_approx: `approx_count_distinct` (HLL++,
    * Heule et al. '13) at rsd=0.05 against the exact count, bounded at
    * 3·rsd. Deterministic because HLL registers fold by MAX — order-
    * free however partitions merge — so the boolean contract can
    * hash-match a TRUE-pinning oracle. q42's KMV documents the sketch
    * MECHANICS cross-engine; this gates the codegen'd native
    * aggregate a 100 TB job would actually call (one pass, O(2^p)
    * state, mergeable across partitions AND across days).
    */
  private def q171(s: org.apache.spark.sql.SparkSession, d: String) = {
    val rsd = 0.05
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_distinct"),
        approx_count_distinct(col("l_orderkey"), rsd).as("hll"))
      .select(
        col("l_returnflag"), col("exact_distinct"),
        (abs(col("hll") - col("exact_distinct")).cast("double") <=
          lit(3 * rsd) * col("exact_distinct").cast("double")).as("within_3rsd"))
  }

}
