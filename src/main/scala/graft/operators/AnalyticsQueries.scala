package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped-statistics and behavioral-analytics operators (round 5).
  *
  * These extend the engine past the reference's aggregate surface
  * (ref: processing/jobs/silver_to_gold.py builds only sum/avg/count
  * KPI rollups) with the statistics a training-data / product-analytics
  * pipeline runs at warehouse scale: correlation & regression, argmax-
  * per-group, exact medians, fixed-width histograms, ordered funnels,
  * and retention cohorts.
  *
  * Cross-engine exactness contracts used here (see BASELINE.md gotchas):
  *   - Sums accumulate in DECIMAL (order-independent, exact) and are
  *     cast to double only at the end on BOTH sides.
  *   - Nonlinear finals (corr, slope) are rounded to 6 decimals on both
  *     sides — the q93 rounding contract — because a DECIMAL→DOUBLE
  *     cast may differ by 1 ulp between engines.
  *   - Integer division is spelled `div` (Spark) / `//` (DuckDB); `/`
  *     promotes to double in both engines.
  */
object AnalyticsQueries extends QueryModule {

  import Tables._

  /** q174 Poisson-bootstrap geometry: B replicates; a row's multiplicity
    * in a replicate is k iff its 32-bit md5 draw falls below the k-th
    * threshold = floor(PoissonCDF(1)(k) · 2^32) — pure integer compares
    * rendered into BOTH engines from these shared values. Multiplicities
    * above 5 are truncated to 5 (CDF tail ~3.7e-3 beyond; the identical
    * truncation on both sides keeps the contract exact, and the bias is
    * orders below the CI width).
    */
  private val BootB = 32
  /** floor(CDF·2^32) for CDF(k) = e⁻¹·Σ_{i≤k} 1/i!, k = 0..4 —
    * package-private so `BootstrapSpec` audits THIS constant against an
    * independent derivation (a private copy re-hardcoded in the spec
    * would let a transposed digit slip through both engines unseen).
    */
  private[operators] val BootThresholds: Seq[Long] =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L)

  /** The q190/q196 shared Welch kernel: per-(segment, variant) DECIMAL
    * moment sums (q97's discipline — the shuffle carries two decimals
    * and a count per group), pivoted to one row per segment, closed-form
    * t from the exact sums with pinned parenthesization. Declared before
    * `rawQueries` (the round-7 initialization-order lesson).
    */
  private def welchT(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val dt = DecimalType(38, 10)
    val j = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_mktsegment").as("seg"),
        pmod(col("o_custkey"), lit(2)).as("variant"),
        col("o_totalprice").as("y"))
    val m = j.groupBy(col("seg"), col("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y").cast(dt)).as("s"),
        sum((col("y") * col("y")).cast(dt)).as("ssq"))
    def side(v: Int, c: String) = max(when(col("variant") === v, col(c))).as(s"$c$v")
    val p = m.groupBy(col("seg"))
      .agg(side(0, "n"), side(0, "s"), side(0, "ssq"),
           side(1, "n"), side(1, "s"), side(1, "ssq"))
    def nD(v: Int)  = col(s"n$v").cast("double")
    def sD(v: Int)  = col(s"s$v").cast("double")
    def qD(v: Int)  = col(s"ssq$v").cast("double")
    def mean(v: Int) = sD(v) / nD(v)
    // sample variance from the exact sums, pinned parenthesization:
    // (ssq - (s*s)/n) / (n - 1)
    def vr(v: Int) = (qD(v) - (sD(v) * sD(v)) / nD(v)) / (nD(v) - 1.0)
    p.select(
      col("seg"), col("n0"), col("n1"),
      round(mean(0), 6).as("mean0"),
      round(mean(1), 6).as("mean1"),
      round((mean(0) - mean(1)) /
        sqrt(vr(0) / nD(0) + vr(1) / nD(1)), 6).as("t_stat"))
  }

  /** SQL mirror of [[welchT]] — the q190 oracle body, shared verbatim
    * by the q196 ranking oracle.
    */
  private val welchTSql: String = """
        WITH m AS (
          SELECT c_mktsegment AS seg, o_custkey % 2 AS variant,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS s,
                 CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS ssq
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        p AS (
          SELECT seg,
                 MAX(CASE WHEN variant = 0 THEN n END) AS n0,
                 MAX(CASE WHEN variant = 0 THEN s END) AS s0,
                 MAX(CASE WHEN variant = 0 THEN ssq END) AS ssq0,
                 MAX(CASE WHEN variant = 1 THEN n END) AS n1,
                 MAX(CASE WHEN variant = 1 THEN s END) AS s1,
                 MAX(CASE WHEN variant = 1 THEN ssq END) AS ssq1
          FROM m GROUP BY seg)
        SELECT seg, n0, n1,
               ROUND(s0 / n0, 6) AS mean0,
               ROUND(s1 / n1, 6) AS mean1,
               ROUND((s0 / n0 - s1 / n1) /
                     SQRT(((ssq0 - (s0 * s0) / n0) / (n0 - 1.0)) / n0 +
                          ((ssq1 - (s1 * s1) / n1) / (n1 - 1.0)) / n1), 6) AS t_stat
        FROM p"""

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private def rawQueries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Pearson correlation + OLS slope per group from ONE map-side-
    // combinable pass: the five moment sums (Σx, Σy, Σxy, Σx², Σy²)
    // are each an exact DECIMAL aggregation, so the shuffle carries 5
    // decimals + a count per group — O(groups), never O(rows). The
    // closed-form corr/slope are computed from the sums on the reduced
    // side. This is how corr() scales to 100 TB: Spark's built-in
    // corr() is the same moment-sum shape but accumulates in double
    // (order-dependent last-ulp), which cannot hash-match a different
    // engine — hence the decimal moments + round-6 contract.
    "q97_grouped_corr" -> QueryDef(
      fn = (s, d) => {
        val li = lineitem(s, d).select(
          col("l_returnflag"),
          col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
        val dt = DecimalType(38, 10)
        li.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_obs"),
            sum(col("x").cast(dt)).as("sx"),
            sum(col("y").cast(dt)).as("sy"),
            sum((col("x") * col("y")).cast(dt)).as("sxy"),
            sum((col("x") * col("x")).cast(dt)).as("sxx"),
            sum((col("y") * col("y")).cast(dt)).as("syy"))
          .select(
            col("l_returnflag"),
            col("n_obs"),
            round(
              (col("n_obs") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (sqrt(col("n_obs") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")) *
                  sqrt(col("n_obs") * col("syy").cast("double") -
                    col("sy").cast("double") * col("sy").cast("double"))),
              6).as("corr_qty_price"),
            round(
              (col("n_obs") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("n_obs") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")),
              6).as("slope_price_per_qty"))
      },
      oracle = Some("""
        SELECT l_returnflag, n_obs,
               ROUND((n_obs * sxy - sx * sy)
                     / (SQRT(n_obs * sxx - sx * sx) * SQRT(n_obs * syy - sy * sy)), 6)
                 AS corr_qty_price,
               ROUND((n_obs * sxy - sx * sy) / (n_obs * sxx - sx * sx), 6)
                 AS slope_price_per_qty
        FROM (
          SELECT l_returnflag,
                 COUNT(*) AS n_obs,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag)"""),
    ),

    // ----------------------------------------------------------------
    // Argmax/argmin per group WITHOUT a window: max(struct(price,
    // name)) reduces lexicographically inside the aggregate, so the
    // shuffle carries ONE struct per group (partial_max combines
    // map-side — plan-asserted). Struct buffers aren't hash-map
    // mutable, so Spark plans a SortAggregate: the cost is a per-
    // partition sort by group key, still strictly cheaper at 100 TB
    // than the row_number()-over-window formulation (which the DuckDB
    // oracle uses) — that one shuffles the FULL table to rank it. The
    // struct carries the deterministic (value, tiebreak) pair the
    // whole way.
    "q98_argmax_struct" -> QueryDef(
      fn = (s, d) =>
        part(s, d)
          .groupBy(col("p_brand"))
          .agg(
            max(struct(col("p_retailprice"), col("p_name"))).as("hi"),
            min(struct(col("p_retailprice"), col("p_name"))).as("lo"),
            count(lit(1)).as("n_parts"))
          .select(
            col("p_brand"),
            col("hi.p_retailprice").as("top_price"),
            col("hi.p_name").as("top_name"),
            col("lo.p_retailprice").as("low_price"),
            col("lo.p_name").as("low_name"),
            col("n_parts")),
      oracle = Some("""
        WITH r AS (
          SELECT p_brand, p_retailprice, p_name,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_name DESC) AS rn_hi,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice ASC, p_name ASC) AS rn_lo,
                 COUNT(*) OVER (PARTITION BY p_brand) AS n
          FROM part)
        SELECT hi.p_brand,
               hi.p_retailprice AS top_price, hi.p_name AS top_name,
               lo.p_retailprice AS low_price, lo.p_name AS low_name,
               hi.n AS n_parts
        FROM (SELECT * FROM r WHERE rn_hi = 1) hi
        JOIN (SELECT * FROM r WHERE rn_lo = 1) lo ON hi.p_brand = lo.p_brand"""),
    ),

    // ----------------------------------------------------------------
    // EXACT median per group by rank selection: median = mean of the
    // values at ranks (n+1) div 2 and (n+2) div 2 (equal when n is
    // odd). Selecting a value AT a rank is tie-permutation-invariant,
    // so tie order among equal prices cannot change the answer. The
    // selection runs on [[RankSelect]]'s two-pass value-range-histogram
    // kernel — a window partitioned by the 5-value segment key would
    // sort the whole fact table in 5 tasks (the straggler/OOM shape at
    // 100 TB); the kernel's only window partitions on (segment, value
    // bucket), so per-task input is ~n/1024 regardless of group
    // cardinality. The oracle keeps the sort-based formulation: rank
    // selection is plan-independent, so the hashes agree. q141 is the
    // percentile_approx production twin (mergeable sketch, one pass).
    "q99_median_exact" -> QueryDef(
      fn = (s, d) => {
        // the kernel scans its input 3x; checkpoint the slim (seg, v)
        // join ONCE so the join runs once, not three times (q129's
        // pattern — blocks are context-cleaned when the plan drops).
        // Known audit scope: the checkpointed join shows as a scan in
        // the plan audit, which therefore guards the KERNEL's shape
        // (bounded windows, broadcast stats) — the input join here is
        // a plain broadcast dim join
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
          .localCheckpoint(true)
        RankSelect
          .selectRanks(j, "seg", "v",
            Seq("lo" -> "(n + 1) div 2", "hi" -> "(n + 2) div 2"))
          .groupBy(col("seg"))
          .agg(avg(col("v")).as("median_price"), max(col("n")).as("n_orders"))
      },
      oracle = Some("""
        SELECT seg, AVG(v) AS median_price, MAX(n_orders) AS n_orders
        FROM (
          SELECT c_mktsegment AS seg, o_totalprice AS v,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey)
        WHERE rn = (n_orders + 1) // 2 OR rn = (n_orders + 2) // 2
        GROUP BY seg"""),
    ),

    // ----------------------------------------------------------------
    // APPROXIMATE quantile grid — the PRODUCTION default the RankSelect
    // scaladoc promises as the cheap path: percentile_approx is ONE
    // pass with a mergeable Greenwald-Khanna sketch (map-side partial,
    // O(accuracy) state per group), vs the exact kernel's 3 scans — at
    // 100 TB that is the difference between one read and three. The
    // sketch's merge order varies run to run, so the approx VALUES are
    // not gate-stable; what IS exact and deterministic is the GK
    // CONTRACT: the returned element's rank is within n/accuracy of the
    // requested rank. The query therefore measures each approx value's
    // true rank interval with one exact counting pass and gates the
    // boolean contract per quantile — the oracle pins the exact group
    // sizes and expects every tolerance check to hold, so a sketch
    // regression (or a mis-set accuracy) breaks the hash match. The
    // exact twins are q99/q103 on the same groups.
    "q141_quantile_approx" -> QueryDef(
      fn = (s, d) => {
        val acc = 1000 // rank tolerance = n/acc
        val ps  = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p90" -> 0.90)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
        val approx = j
          .groupBy(col("seg"))
          .agg(
            count(lit(1)).as("n_orders"),
            percentile_approx(
              col("v"),
              array(ps.map(p => lit(p._2)): _*),
              lit(acc)).as("ap"))
        // exact rank interval of each approx value: cnt(<=) and cnt(<)
        // in one counting pass over the broadcast-joined fact
        val aggCols = max(col("n_orders")).as("n_orders") +:
          ps.zipWithIndex.flatMap { case (_, i) =>
            Seq(
              sum(when(col("v") <= col("ap")(i), 1L).otherwise(0L)).as(s"le$i"),
              sum(when(col("v") < col("ap")(i), 1L).otherwise(0L)).as(s"lt$i"))
          }
        val counted = j
          .join(broadcast(approx), "seg")
          .groupBy(col("seg"))
          .agg(aggCols.head, aggCols.tail: _*)
        val okCols = ps.zipWithIndex.map { case ((lbl, p), i) =>
          val n = col("n_orders").cast("double")
          // tolerance = 2*n/accuracy + 1: a single GK summary holds
          // rank error <= n/accuracy, but MERGING partition summaries
          // can add the parents' errors (up to 2x), and merge order
          // varies with partitioning/AQE — the gate must hold for any
          // merge order, or it flakes on plan changes rather than
          // catching sketch regressions
          val tol = lit(2.0) * n / acc + 1.0
          // the value's occupied rank interval [lt+1, le] must meet
          // [p*n - tol, p*n + tol]
          (col(s"le$i").cast("double") >= lit(p) * n - tol &&
            (col(s"lt$i") + 1).cast("double") <= lit(p) * n + tol).as(s"${lbl}_ok")
        }
        counted.select(col("seg") +: col("n_orders") +: okCols: _*)
      },
      oracle = Some("""
        SELECT c_mktsegment AS seg, COUNT(*) AS n_orders,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1"""),
    ),

    // ----------------------------------------------------------------
    // POISSON BOOTSTRAP confidence intervals (Chamandy et al., the
    // large-scale bootstrap): classical resampling draws n rows WITH
    // replacement — impossible to coordinate across a distributed
    // scan — but each row's multiplicity in a replicate is Binomial(n,
    // 1/n) ≈ Poisson(1), which each task can draw INDEPENDENTLY per
    // row. B=32 replicates explode inline (×32 pre-combine, collapsed
    // map-side to (seg, b) grain), multiplicities come from md5 bits
    // against PRECOMPUTED integer thresholds (floor(CDF·2^32) — pure
    // integer compare, no float RNG), values accumulate in DECIMAL,
    // and the one double division per replicate mean is IEEE-exact —
    // the full q158 determinism discipline. CI = min/max over the 32
    // replicate means (the rank-1/rank-B percentile bootstrap at this
    // B); point mean rides the same decimal sums.
    "q174_bootstrap_ci" -> QueryDef(
      fn = (s, d) => {
        // spread the slim joined projection BEFORE the ×B replicate
        // explode (round 14, guide §2.6): the sf0.1 orders scan is one
        // split, so the whole md5-draw + threshold pipeline ran as ONE
        // 5 s task; one keyed exchange of (seg, rid, y) buys full
        // parallelism for the B-fold expansion. Deterministic hash
        // partitioning; the (seg, b) decimal sums are order-independent.
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderkey").as("rid"),
            col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("y"))
          .repartition(s.sparkContext.defaultParallelism, col("rid"))
        val wCase = BootThresholds.zipWithIndex.foldRight(lit(BootThresholds.length)) {
          case ((t, k), acc) => when(col("h") < lit(t), lit(k)).otherwise(acc)
        }
        // one md5 yields FOUR independent 32-bit draws (128 bits / 32),
        // so the hash pass costs B/4 digests per row, not B; the outer
        // transform binds each digest once so the inner lambda only
        // slices it
        val reps = j
          .select(col("seg"), col("y"), explode(expr(
            s"""flatten(transform(
                  transform(sequence(0, ${BootB / 4 - 1}), g ->
                    named_struct('g', g,
                      'm', md5(concat('bs', CAST(g AS STRING), ':', CAST(rid AS STRING))))),
                  s -> transform(sequence(0, 3), i ->
                    named_struct('b', s.g * 4 + i,
                      'h', CAST(conv(substr(s.m, 1 + 8 * i, 8), 16, 10) AS BIGINT)))))""")).as("r"))
          .select(col("seg"), col("y"), col("r.b").as("b"), col("r.h").as("h"))
          .withColumn("w", wCase)
          .groupBy(col("seg"), col("b"))
          .agg(sum(col("y") * col("w")).as("swy"), sum(col("w")).as("sw"))
          // a replicate that drew zero total weight (possible only for
          // near-empty groups) carries no mean — engines disagree on
          // double 0/0, so the guard is part of the contract
          .where(col("sw") > 0)
          .select(col("seg"),
            (col("swy").cast("double") / col("sw").cast("double")).as("bmean"))
        val point = j
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            (sum(col("y")).cast("double") / count(lit(1)).cast("double")).as("mean"))
        point
          .join(reps.groupBy(col("seg"))
            .agg(min(col("bmean")).as("ci_lo"), max(col("bmean")).as("ci_hi")), Seq("seg"))
          .select(col("seg"), col("n"), col("mean"), col("ci_lo"), col("ci_hi"))
      },
      oracle = Some {
        val wCase = "CASE " + BootThresholds.zipWithIndex
          .map { case (t, k) => s"WHEN h < $t THEN $k" }
          .mkString(" ") + s" ELSE ${BootThresholds.length} END"
        s"""
        WITH j AS (
          SELECT c_mktsegment AS seg, o_orderkey AS rid,
                 CAST(o_totalprice AS DECIMAL(28,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ex AS (
          SELECT seg, y, b,
                 CAST(concat('0x', substr(md5('bs' || CAST(b // 4 AS VARCHAR) || ':' || CAST(rid AS VARCHAR)), 1 + 8 * (b % 4), 8)) AS BIGINT) AS h
          FROM j, UNNEST(range(0, $BootB)) AS u(b)),
        reps AS (
          SELECT seg, b,
                 CAST(SUM(y * ($wCase)) AS DOUBLE) / CAST(SUM($wCase) AS DOUBLE) AS bmean
          FROM ex GROUP BY seg, b
          HAVING SUM($wCase) > 0),
        point AS (
          SELECT seg, COUNT(*) AS n,
                 CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
          FROM j GROUP BY seg)
        SELECT p.seg, p.n, p.mean,
               MIN(r.bmean) AS ci_lo, MAX(r.bmean) AS ci_hi
        FROM point p JOIN reps r ON r.seg = p.seg
        GROUP BY p.seg, p.n, p.mean"""
      }
    ),

    // ----------------------------------------------------------------
    // WEIGHTED median — order price weighted by the order's lineitem
    // count, per market segment: the weighted order statistic
    // (token-weighted length percentiles are the corpus-side twin).
    // Runs through RankSelect.selectWeightedRank: the q99/q103 bucket
    // histogram with COUNT replaced by SUM(weight), so the fact never
    // sorts — only the crossing bucket's rows (~W/B of the weight
    // mass) reach the (seg, bucket)-partitioned window, and integer
    // weights keep every cumulative exact cross-engine.
    "q172_weighted_median" -> QueryDef(
      fn = (s, d) => {
        val wts = lineitem(s, d)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("wt"))
        // checkpoint the slim join once — the kernel's scans then read
        // materialized (seg, v, wt) blocks, not the join (q103's note)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(wts, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"), col("wt"))
          .localCheckpoint(true)
        RankSelect
          .selectWeightedRank(j, "seg", "v", "wt", "(wtot + 1) div 2")
          .select(col("seg"), col("wtot").as("total_weight"), col("v").as("w_median"))
      },
      oracle = Some("""
        WITH wts AS (
          SELECT l_orderkey, COUNT(*) AS wt FROM lineitem GROUP BY 1),
        j AS (
          SELECT c_mktsegment AS seg, o_totalprice AS v, wt
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN wts ON o_orderkey = l_orderkey),
        c AS (
          SELECT seg, v,
                 SUM(wt) OVER (PARTITION BY seg ORDER BY v) AS cw,
                 SUM(wt) OVER (PARTITION BY seg) AS tw
          FROM j)
        SELECT seg,
               CAST(MAX(tw) AS BIGINT) AS total_weight,
               MIN(v) AS w_median
        FROM c WHERE cw >= (tw + 1) // 2 GROUP BY seg"""),
    ),

    // ----------------------------------------------------------------
    // WEIGHTED approximate quantiles — q172's production cheap-path
    // twin, completing the q99↔q141 symmetry for the weighted order
    // statistic: integer weights expand inline (sequence explode —
    // bounded here by lineitems-per-order; the pattern holds whenever
    // weights are small integers, the token-count corpus case) and the
    // replicated stream feeds ONE mergeable percentile_approx pass.
    // The sketch's merge order varies run to run, so like q141 the
    // gate is the GK CONTRACT, restated in weight mass: the returned
    // value's weighted-rank interval [Σw(<v)+1, Σw(<=v)] must meet
    // p·W ± (2W/acc + 1) — merge-order-safe, plan-change-safe, and
    // still failing loudly on a sketch or accuracy regression. One
    // exact weighted counting pass measures the interval; the oracle
    // pins exact per-group weight mass and expects every check true.
    "q186_weighted_quantile_approx" -> QueryDef(
      fn = (s, d) => {
        val acc = 1000 // weighted rank tolerance = W/acc per summary
        val ps  = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p90" -> 0.90)
        val wts = lineitem(s, d)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("wt"))
        // checkpoint the slim weighted join once — read by the sketch
        // pass and the counting pass (q172's note)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(wts, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"), col("wt"))
          .localCheckpoint(true)
        val approx = j
          .select(col("seg"), col("v"), explode(expr("sequence(1, wt)")).as("rep"))
          .groupBy(col("seg"))
          .agg(percentile_approx(
            col("v"), array(ps.map(p => lit(p._2)): _*), lit(acc)).as("ap"))
        val aggCols = sum(col("wt")).as("total_weight") +:
          ps.zipWithIndex.flatMap { case (_, i) =>
            Seq(
              sum(when(col("v") <= col("ap")(i), col("wt")).otherwise(0L)).as(s"le$i"),
              sum(when(col("v") < col("ap")(i), col("wt")).otherwise(0L)).as(s"lt$i"))
          }
        val counted = j
          .join(broadcast(approx), "seg")
          .groupBy(col("seg"))
          .agg(aggCols.head, aggCols.tail: _*)
        val okCols = ps.zipWithIndex.map { case ((lbl, p), i) =>
          val w   = col("total_weight").cast("double")
          val tol = lit(2.0) * w / acc + 1.0 // q141's merge-order-safe bound
          (col(s"le$i").cast("double") >= lit(p) * w - tol &&
            (col(s"lt$i") + 1).cast("double") <= lit(p) * w + tol).as(s"${lbl}_ok")
        }
        counted.select(col("seg") +: col("total_weight") +: okCols: _*)
      },
      oracle = Some("""
        WITH wts AS (
          SELECT l_orderkey, COUNT(*) AS wt FROM lineitem GROUP BY 1)
        SELECT c_mktsegment AS seg,
               CAST(SUM(wt) AS BIGINT) AS total_weight,
               TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN wts ON o_orderkey = l_orderkey
        GROUP BY 1"""),
    ),

    // ----------------------------------------------------------------
    // WINSORIZED MEAN (10%/90%) — the robust location statistic a
    // corpus quality rollup uses when heavy tails poison the plain
    // mean. Winsorizing clamps VALUES to [p10, p90] rather than
    // dropping ranks, which makes it tie-permutation-invariant (a
    // trimmed mean's "drop k rows" is not, when ties straddle the
    // cut): the cut values come from ONE RankSelect histogram pass
    // (both ranks located in the same per-group histogram — no
    // segment-keyed window ever sorts the fact), broadcast back as
    // per-group scalars, and the clamped sum accumulates in DECIMAL so
    // the mean is one exact division. Same q99/q103 kernel trade,
    // extended from "pick a value" to "aggregate around the picked
    // values".
    "q188_winsorized_mean" -> QueryDef(
      fn = (s, d) => {
        // checkpoint the slim join once — read by the kernel's scans
        // and the clamped-aggregate pass (q99's note)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
          .localCheckpoint(true)
        val bounds = RankSelect
          .selectRanks(j, "seg", "v", Seq(
            "lo" -> "(n + 9) div 10",
            "hi" -> "(9 * n + 9) div 10"))
          .groupBy(col("seg"))
          .agg(
            max(col("n")).as("n_orders"),
            max(when(col("label") === "lo", col("v"))).as("p10"),
            max(when(col("label") === "hi", col("v"))).as("p90"))
        j.join(broadcast(bounds), "seg")
          .select(col("seg"), col("n_orders"), col("p10"), col("p90"),
            greatest(col("p10"), least(col("p90"), col("v"))).as("w"))
          .groupBy(col("seg"))
          .agg(
            max(col("n_orders")).as("n_orders"),
            max(col("p10")).as("p10"),
            max(col("p90")).as("p90"),
            (sum(col("w").cast(DecimalType(28, 2))).cast("double") /
              max(col("n_orders")).cast("double")).as("winsor_mean"))
      },
      oracle = Some("""
        WITH r AS (
          SELECT c_mktsegment AS seg, o_totalprice AS v,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM orders JOIN customer ON o_custkey = c_custkey),
        b AS (
          SELECT seg, MAX(n) AS n_orders,
                 MAX(CASE WHEN rn = (n + 9) // 10 THEN v END) AS p10,
                 MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90
          FROM r GROUP BY seg)
        SELECT b.seg, b.n_orders, b.p10, b.p90,
               CAST(SUM(CAST(GREATEST(b.p10, LEAST(b.p90, r.v)) AS DECIMAL(28,2))) AS DOUBLE)
                 / CAST(b.n_orders AS DOUBLE) AS winsor_mean
        FROM r JOIN b ON b.seg = r.seg
        GROUP BY b.seg, b.n_orders, b.p10, b.p90"""),
    ),

    // ----------------------------------------------------------------
    // WELCH'S t-STATISTIC per group — the A/B-experiment readout
    // operator (unequal variances, unequal n): two variants (customer
    // key parity — the deterministic stand-in for an assignment
    // column), per-variant moment sums in DECIMAL (q97's discipline:
    // the shuffle carries 2 decimals + a count per (group, variant) —
    // O(groups), never O(rows); double accumulation would be
    // order-dependent in the last ulp and could never hash-match), and
    // the closed-form t from the collected sums with identical
    // parenthesization on both engines (+,*,/,sqrt are IEEE-exact).
    // The t-statistic — not a p-value — is the gated number: the
    // p-value needs the t CDF (libm territory, 1-ulp engine drift);
    // production thresholds on |t| are equivalent and exact.
    "q190_ab_welch_t" -> QueryDef(
      fn = (s, d) => welchT(s, d),
      oracle = Some(welchTSql),
    ),

    // ----------------------------------------------------------------
    // EXACT TWO-SAMPLE KOLMOGOROV-SMIRNOV — distribution drift as the
    // exact sup-norm statistic, complementing q161's bucketed
    // chi-square (which can miss shape changes inside a bucket) and
    // q190's mean test (which misses variance/shape entirely). The
    // statistic is kept INTEGER until the last division:
    // D·n0·n1 = max over pooled distinct values of
    // |cum0·n1 − cum1·n0| — counts and products are exact longs, so
    // the gate needs no float story at all; the 1.36·sqrt((n0+n1)/
    // (n0·n1)) 95% critical value is one pinned sqrt.
    //
    // Scale shape (the RankSelect philosophy — no per-group sort of
    // row-grain data): collapse to (seg, value) counts first; 64
    // range buckets give bucket-grain offsets via a 64-row window;
    // the exact within-bucket sweep windows over (seg, bucket) —
    // fine-grained partitions, never one ordered pass per segment.
    "q219_ks_drift" -> QueryDef(
      fn = (s, d) => {
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            pmod(col("o_custkey"), lit(2)).as("variant"),
            col("o_totalprice").as("y"))
        val atY = j.groupBy(col("seg"), col("y"))
          .agg(
            sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
        val mm = atY.groupBy(col("seg"))
          .agg(min(col("y")).as("mn"), max(col("y")).as("mx"),
            sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
        val withB = atY.join(broadcast(mm), Seq("seg"))
          .withColumn("b",
            when(col("mx") > col("mn"),
              least(floor((col("y") - col("mn")) * 64.0 / (col("mx") - col("mn")))
                .cast("int"), lit(63)))
            .otherwise(lit(0)))
        val bt = withB.groupBy(col("seg"), col("b"))
          .agg(sum(col("c0")).as("bt0"), sum(col("c1")).as("bt1"))
        val wB = Window.partitionBy(col("seg")).orderBy(col("b"))
        val off = bt
          .withColumn("o0", sum(col("bt0")).over(wB) - col("bt0"))
          .withColumn("o1", sum(col("bt1")).over(wB) - col("bt1"))
          .select(col("seg"), col("b"), col("o0"), col("o1"))
        val wIn = Window.partitionBy(col("seg"), col("b")).orderBy(col("y"))
        val swept = withB.join(off, Seq("seg", "b"))
          .withColumn("in0", sum(col("c0")).over(wIn))
          .withColumn("in1", sum(col("c1")).over(wIn))
          .withColumn("dnum",
            abs((col("o0") + col("in0")) * col("n1") -
              (col("o1") + col("in1")) * col("n0")))
        val ks = col("d_num").cast("double") /
          (col("n0").cast("double") * col("n1").cast("double"))
        val crit = lit(1.36) * sqrt((col("n0") + col("n1")).cast("double") /
          (col("n0").cast("double") * col("n1").cast("double")))
        swept.groupBy(col("seg"), col("n0"), col("n1"))
          .agg(max(col("dnum")).as("d_num"))
          .select(col("seg"), col("n0"), col("n1"), col("d_num"),
            round(ks, 6).as("ks"),
            (ks > crit).as("significant"))
      },
      oracle = Some("""
        WITH j AS MATERIALIZED (
          SELECT c_mktsegment AS seg, o_custkey % 2 AS variant,
                 o_totalprice AS y
          FROM orders JOIN customer ON o_custkey = c_custkey),
        aty AS MATERIALIZED (
          SELECT seg, y,
                 SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
                 SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
          FROM j GROUP BY seg, y),
        mm AS MATERIALIZED (
          SELECT seg, MIN(y) AS mn, MAX(y) AS mx,
                 CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
          FROM aty GROUP BY seg),
        wb AS MATERIALIZED (
          SELECT aty.seg, y, c0, c1, n0, n1,
                 CASE WHEN mx > mn THEN
                   LEAST(CAST(FLOOR((y - mn) * 64.0 / (mx - mn)) AS INTEGER), 63)
                 ELSE 0 END AS b
          FROM aty JOIN mm ON aty.seg = mm.seg),
        bt AS MATERIALIZED (
          SELECT seg, b, SUM(c0) AS bt0, SUM(c1) AS bt1
          FROM wb GROUP BY seg, b),
        off AS MATERIALIZED (
          SELECT seg, b,
                 SUM(bt0) OVER (PARTITION BY seg ORDER BY b) - bt0 AS o0,
                 SUM(bt1) OVER (PARTITION BY seg ORDER BY b) - bt1 AS o1
          FROM bt),
        swept AS MATERIALIZED (
          SELECT wb.seg, n0, n1,
                 ABS((o0 + SUM(c0) OVER (PARTITION BY wb.seg, wb.b ORDER BY y)) * n1 -
                     (o1 + SUM(c1) OVER (PARTITION BY wb.seg, wb.b ORDER BY y)) * n0)
                   AS dnum
          FROM wb JOIN off ON wb.seg = off.seg AND wb.b = off.b)
        SELECT seg, n0, n1, CAST(MAX(dnum) AS BIGINT) AS d_num,
               ROUND(CAST(MAX(dnum) AS DOUBLE) /
                     (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6) AS ks,
               CAST(MAX(dnum) AS DOUBLE) /
                 (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) >
                 1.36 * SQRT(CAST(n0 + n1 AS DOUBLE) /
                   (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))) AS significant
        FROM swept GROUP BY seg, n0, n1"""),
    ),

    // ----------------------------------------------------------------
    // SPEARMAN RANK CORRELATION — monotone association where q97's
    // Pearson sees only linear: does a segment's daily ORDER VOLUME
    // move with its daily REVENUE in rank space? Exactness contract:
    // ties get midranks, and the classic (2·rank + ties − 1) doubling
    // keeps every rank an INTEGER (correlation is scale-invariant, so
    // doubled ranks give the identical ρ); Pearson over the integer
    // ranks then runs on exact DECIMAL moment sums with the q97 pinned
    // closed form. Shape: the corpus collapses to the day grain first,
    // so the rank windows order O(days) rows per group — never the
    // fact table.
    "q221_spearman_corr" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 10)
        val daily = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(col("o_totalprice").cast(dt)).as("rev"))
          .select(col("seg"), col("day"), col("x"),
            col("rev").cast("double").as("y"))
        def ranked2(c: String) =
          lit(2) * rank().over(Window.partitionBy(col("seg")).orderBy(col(c))) +
            count(lit(1)).over(Window.partitionBy(col("seg"), col(c))) - lit(1)
        val r = daily
          .withColumn("rx", ranked2("x"))
          .withColumn("ry", ranked2("y"))
        val m = r.groupBy(col("seg")).agg(
          count(lit(1)).as("n"),
          sum(col("rx").cast(dt)).as("sx"),
          sum(col("ry").cast(dt)).as("sy"),
          sum((col("rx") * col("ry")).cast(dt)).as("sxy"),
          sum((col("rx") * col("rx")).cast(dt)).as("sxx"),
          sum((col("ry") * col("ry")).cast(dt)).as("syy"))
        def D(c: String) = col(c).cast("double")
        val n = col("n").cast("double")
        m.select(col("seg"), col("n").as("n_days"),
          round((n * D("sxy") - D("sx") * D("sy")) /
            sqrt((n * D("sxx") - D("sx") * D("sx")) *
                 (n * D("syy") - D("sy") * D("sy"))), 6).as("rho"))
      },
      oracle = Some("""
        WITH daily AS MATERIALIZED (
          SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
                 COUNT(*) AS x,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        rk AS MATERIALIZED (
          SELECT seg,
                 2 * RANK() OVER (PARTITION BY seg ORDER BY x) +
                   COUNT(*) OVER (PARTITION BY seg, x) - 1 AS rx,
                 2 * RANK() OVER (PARTITION BY seg ORDER BY y) +
                   COUNT(*) OVER (PARTITION BY seg, y) - 1 AS ry
          FROM daily),
        m AS MATERIALIZED (
          SELECT seg, COUNT(*) AS n,
                 SUM(CAST(rx AS DECIMAL(38,10))) AS sx,
                 SUM(CAST(ry AS DECIMAL(38,10))) AS sy,
                 SUM(CAST(rx * ry AS DECIMAL(38,10))) AS sxy,
                 SUM(CAST(rx * rx AS DECIMAL(38,10))) AS sxx,
                 SUM(CAST(ry * ry AS DECIMAL(38,10))) AS syy
          FROM rk GROUP BY seg)
        SELECT seg, n AS n_days,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                       CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
        FROM m"""),
    ),

    // ----------------------------------------------------------------
    // |t|-RANKED SIGNIFICANCE ORDERING — q190 made decision-complete
    // without a t-table: segments ranked by |t| descending (most
    // significant experiment effect first) with the sign read out as
    // the winning variant. The t CDF is libm territory (why q190 gates
    // the statistic, not the p-value), but |t| ORDERING needs no CDF —
    // for the shared Welch statistic the CDF is monotone in |t| at
    // comparable dof, so this IS the p-value ordering a dashboard
    // sorts by. Determinism: the rank keys off the ROUND(…,6) t that
    // q190 already proves bit-identical cross-engine, tie-broken on
    // seg — never off the raw double. Same O(groups) shuffle; the rank
    // window runs over a 5-row frame.
    "q196_ab_significance_rank" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = welchT(s, d)
        val w = Window.orderBy(abs(col("t_stat")).desc, col("seg").asc)
        t.select(
          row_number().over(w).as("sig_rank"),
          col("seg"), col("n0"), col("n1"),
          round(col("mean0") - col("mean1"), 6).as("mean_diff"),
          abs(col("t_stat")).as("abs_t"),
          when(col("t_stat") > 0, lit("variant0"))
            .when(col("t_stat") < 0, lit("variant1"))
            .otherwise(lit("tie")).as("leader"))
      },
      oracle = Some(s"""
        WITH t AS ($welchTSql)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY ABS(t_stat) DESC, seg ASC) AS INTEGER) AS sig_rank,
               seg, n0, n1,
               ROUND(mean0 - mean1, 6) AS mean_diff,
               ABS(t_stat) AS abs_t,
               CASE WHEN t_stat > 0 THEN 'variant0'
                    WHEN t_stat < 0 THEN 'variant1'
                    ELSE 'tie' END AS leader
        FROM t"""),
    ),

    // ----------------------------------------------------------------
    // CHI-SQUARE INDEPENDENCE TEST — the categorical-outcome member of
    // the experimentation family (q190/q196 cover a continuous metric):
    // per segment, is conversion to a high-value order independent of
    // the assigned variant? For a 2x2 contingency table the statistic
    // has the exact closed form chi2 = N(ad-bc)^2 / ((a+b)(c+d)(a+c)
    // (b+d)) — pure integer products and ONE division, no expected-
    // value intermediates, no libm. The products are computed in
    // DECIMAL(38,0) (exact; DuckDB promotes to HUGEINT — also exact)
    // and cast to double only for the final division; at gate scale
    // every integer is far below 2^53, so the casts are value-exact on
    // both engines and the rounded statistic is bit-identical. The
    // decision flag needs no CDF either: chi2_0.95(1 dof) = 3.841 is a
    // CONSTANT, so significant = chi2 > 3.841 ships in the readout —
    // the same decision-completeness q196 adds for the t family.
    // Shuffle: one (seg, variant, outcome)-combined aggregate,
    // O(segments) out.
    "q198_ab_chi_square" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 0)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(
            col("c_mktsegment").as("seg"),
            pmod(col("o_custkey"), lit(2)).as("variant"),
            (col("o_totalprice") > 150000).as("hi"))
        val p = j.groupBy(col("seg")).agg(
          sum(when(col("variant") === 0 && col("hi"), 1L).otherwise(0L)).as("a"),
          sum(when(col("variant") === 0 && not(col("hi")), 1L).otherwise(0L)).as("b"),
          sum(when(col("variant") === 1 && col("hi"), 1L).otherwise(0L)).as("c"),
          sum(when(col("variant") === 1 && not(col("hi")), 1L).otherwise(0L)).as("d"))
        def dc(c: org.apache.spark.sql.Column) = c.cast(dt)
        val det  = dc(col("a")) * dc(col("d")) - dc(col("b")) * dc(col("c"))
        val num  = dc(col("a") + col("b") + col("c") + col("d")) * det * det
        val den  = dc(col("a") + col("b")) * dc(col("c") + col("d")) *
          dc(col("a") + col("c")) * dc(col("b") + col("d"))
        val chi2 = num.cast("double") / den.cast("double")
        p.select(
          col("seg"), col("a"), col("b"), col("c"), col("d"),
          round(chi2, 6).as("chi2"),
          (chi2 > 3.841).as("significant_95"))
      },
      oracle = Some("""
        WITH j AS (
          SELECT c_mktsegment AS seg, o_custkey % 2 AS variant,
                 o_totalprice > 150000 AS hi
          FROM orders JOIN customer ON o_custkey = c_custkey),
        p AS (
          SELECT seg,
                 CAST(SUM(CASE WHEN variant = 0 AND hi THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN variant = 0 AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN variant = 1 AND hi THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN variant = 1 AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM j GROUP BY seg),
        x AS (
          SELECT seg, a, b, c, d,
                 CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c) AS DOUBLE)
                   / CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE) AS chi2
          FROM p)
        SELECT seg, a, b, c, d,
               ROUND(chi2, 6) AS chi2,
               chi2 > 3.841 AS significant_95
        FROM x"""),
    ),

    // ----------------------------------------------------------------
    // Fixed-width histogram: bucket ids come from constant edges
    // (FLOOR(v / width), capped), so binning is a zero-extra-pass
    // projection feeding one hash aggregate — the whole histogram is
    // O(buckets) out of the shuffle regardless of input size. Constant
    // edges (not data-dependent min/max) are what make it one pass.
    "q100_histogram" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .withColumn(
            "bucket",
            least(lit(19), floor(col("o_totalprice") / 30000.0)).cast("int"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(28, 2))).cast("double")
              .as("total_price"))
          .withColumn("bucket_lo", (col("bucket") * 30000.0).cast("double")),
      oracle = Some("""
        SELECT bucket,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price,
               CAST(bucket * 30000.0 AS DOUBLE) AS bucket_lo
        FROM (
          SELECT CAST(LEAST(19, FLOOR(o_totalprice / 30000.0)) AS INTEGER) AS bucket,
                 o_totalprice
          FROM orders)
        GROUP BY bucket"""),
    ),

    // ----------------------------------------------------------------
    // Ordered conversion funnel (signup → first view after signup →
    // first purchase after that view). Three user-keyed conditional-min
    // aggregations chained by joins on the SAME key: every stage is
    // user-grain, so the shuffles are O(users), the stage outputs are
    // tiny relative to the event log, and AQE broadcasts them back
    // against the log. No sort of the raw events is ever needed —
    // sequencing is expressed by the ts >= prev-stage predicate, not
    // by ordering.
    "q101_funnel" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
        val v1 = ev.filter(col("event_type") === "view")
          .join(s1, "user_id")
          .filter(col("ts") >= col("signup_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("first_view_ts"))
        val p1 = ev.filter(col("event_type") === "purchase")
          .join(v1, "user_id")
          .filter(col("ts") >= col("first_view_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase_ts"))
        s1.join(v1, Seq("user_id"), "left")
          .join(p1, Seq("user_id"), "left")
          .select(
            col("user_id"),
            col("signup_ts"),
            col("first_view_ts"),
            col("first_purchase_ts"),
            col("first_view_ts").isNotNull.cast("int").as("reached_view"),
            col("first_purchase_ts").isNotNull.cast("int").as("reached_purchase"))
      },
      oracle = Some("""
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS signup_ts
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
        v1 AS (
          SELECT e.user_id, MIN(e.ts) AS first_view_ts
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'view' AND e.ts >= s1.signup_ts
          GROUP BY e.user_id),
        p1 AS (
          SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
          FROM events e JOIN v1 ON e.user_id = v1.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= v1.first_view_ts
          GROUP BY e.user_id)
        SELECT s1.user_id, s1.signup_ts, v1.first_view_ts, p1.first_purchase_ts,
               CAST(CASE WHEN v1.user_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                 AS reached_view,
               CAST(CASE WHEN p1.user_id IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                 AS reached_purchase
        FROM s1
        LEFT JOIN v1 ON s1.user_id = v1.user_id
        LEFT JOIN p1 ON s1.user_id = p1.user_id"""),
    ),

    // ----------------------------------------------------------------
    // Exact quantile grid (p25/p50/p75/p90) by NEAREST-RANK selection:
    // rank_p = ceil(p·n), all-integer, no interpolation — so the cell
    // values are actual data values, exact cross-engine. All four
    // quantiles ride ONE [[RankSelect]] histogram pass (the kernel
    // locates all requested ranks from the same per-group histogram and
    // rescans only their buckets), then pivot out via conditional
    // aggregation — no window ever partitions on the 5-value segment
    // key. Same trade and same oracle shape as q99.
    "q103_quantile_grid" -> QueryDef(
      fn = (s, d) => {
        // checkpoint the slim join once — the kernel's 3 scans then
        // read materialized (seg, v) blocks, not the join (q99's note)
        val j = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
          .localCheckpoint(true)
        RankSelect
          .selectRanks(j, "seg", "v", Seq(
            "p25" -> "(n + 3) div 4",
            "p50" -> "(n + 1) div 2",
            "p75" -> "(3 * n + 3) div 4",
            "p90" -> "(9 * n + 9) div 10"))
          .groupBy(col("seg"))
          .agg(
            max(col("n")).as("n_orders"),
            max(when(col("label") === "p25", col("v"))).as("p25"),
            max(when(col("label") === "p50", col("v"))).as("p50"),
            max(when(col("label") === "p75", col("v"))).as("p75"),
            max(when(col("label") === "p90", col("v"))).as("p90"))
      },
      oracle = Some("""
        SELECT seg,
               MAX(n) AS n_orders,
               MAX(CASE WHEN rn = (n + 3) // 4     THEN v END) AS p25,
               MAX(CASE WHEN rn = (n + 1) // 2     THEN v END) AS p50,
               MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS p75,
               MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90
        FROM (
          SELECT c_mktsegment AS seg, o_totalprice AS v,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM orders JOIN customer ON o_custkey = c_custkey)
        GROUP BY seg"""),
    ),

    // ----------------------------------------------------------------
    // Trailing-7-day distinct active users per day (the W-DAU metric):
    // activity is first reduced to the (user, day) grain — O(users x
    // days), a massive cut at log scale — then a tiny day-grid
    // dimension range-joins it (day BETWEEN grid-6 AND grid) and a
    // count-distinct finishes per grid day. The fact table is scanned
    // once; the 7x row amplification happens on the already-reduced
    // grain, and the day grid broadcasts.
    "q104_trailing_active" -> QueryDef(
      fn = (s, d) => {
        val act = events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"))
          .distinct()
        val grid = act.select(col("day").as("grid_day")).distinct()
        act
          .join(
            broadcast(grid),
            col("day") >= date_sub(col("grid_day"), 6) && col("day") <= col("grid_day"))
          .groupBy(col("grid_day"))
          .agg(countDistinct(col("user_id")).as("active_7d"))
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        grid AS (SELECT DISTINCT day AS grid_day FROM act)
        SELECT grid_day, COUNT(DISTINCT user_id) AS active_7d
        FROM act JOIN grid
          ON act.day >= grid.grid_day - 6 AND act.day <= grid.grid_day
        GROUP BY grid_day"""),
    ),

    // ----------------------------------------------------------------
    // Time-series resample to an hourly grid with forward fill: each
    // user's span explodes into hour rows (sequence + explode — linear
    // in grid cells), the per-hour closing value reduces via
    // max(struct(ts, event_id, value)) (deterministic: (ts, event_id)
    // is unique), and gaps forward-fill with last(ignoreNulls) over a
    // user-partitioned window. Every stage is keyed by user; the grid
    // explode is the only row amplification and it is the OUTPUT grain.
    "q105_resample_ffill" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val hourly = ev
          .withColumn("hour", date_trunc("hour", col("ts")))
          .groupBy(col("user_id"), col("hour"))
          .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
          .select(col("user_id"), col("hour"), col("m.value").as("hour_value"))
        val span = ev
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
          .select(
            col("user_id"),
            explode(expr(
              "sequence(date_trunc('hour', t0), date_trunc('hour', t1), interval 1 hour)"))
              .as("hour"))
        span
          .join(hourly, Seq("user_id", "hour"), "left")
          .select(
            col("user_id"),
            col("hour"),
            last(col("hour_value"), ignoreNulls = true)
              .over(Window.partitionBy(col("user_id")).orderBy(col("hour").asc)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("filled_value"),
            col("hour_value").isNull.cast("int").as("is_gap"))
      },
      oracle = Some("""
        WITH hourly AS (
          SELECT user_id, hour, value AS hour_value FROM (
            SELECT user_id, DATE_TRUNC('hour', ts) AS hour, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, DATE_TRUNC('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1),
        span AS (
          SELECT user_id,
                 UNNEST(generate_series(DATE_TRUNC('hour', MIN(ts)),
                                        DATE_TRUNC('hour', MAX(ts)),
                                        INTERVAL 1 HOUR)) AS hour
          FROM events GROUP BY user_id)
        SELECT s.user_id, s.hour,
               LAST_VALUE(h.hour_value IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.hour ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
               CAST(CASE WHEN h.hour_value IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
        FROM span s
        LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour"""),
    ),

    // ----------------------------------------------------------------
    // Distributed sweep-line: max concurrent sessions per day, WITHOUT
    // a global sort. Sessions (q40's 30-min-gap rule) emit +1/-1
    // deltas; the sweep is HIERARCHICAL — the delta-grain cumulative
    // sum partitions on (day, hour), so per-task input is one hour of
    // deltas, then per-hour (offset, max) pairs reconcile inside the
    // day with a prefix sum over ≤24 rows/day (bounded by the
    // calendar, not the data: prefix-sum decomposition is exact at any
    // grain cut). The cross-midnight correction — sessions already
    // open at a day's 00:00 — arrives as an O(spanned-days) explode
    // counted per day. max(day) = greatest(opening, opening + max
    // running). The naive formulation is one global ORDER BY ts
    // (SinglePartition — the classic scale-killer); a flat per-day
    // sweep fixes that but still serializes one task per calendar day,
    // which saturates when within-day volume grows — the hour split
    // removes that ceiling too (and generalizes to minute grain if an
    // hour of deltas ever outgrows a task).
    "q106_concurrency_sweep" -> QueryDef(
      fn = (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val sess = events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn(
            "new_session",
            when(
              col("prev_ts").isNull ||
                (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000,
              1).otherwise(0))
          .withColumn(
            "session_seq",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
        val deltas = sess
          .select(col("s_start").as("ts"), lit(1).as("delta"))
          .unionAll(sess.select(col("s_end").as("ts"), lit(-1).as("delta")))
          .withColumn("day", col("ts").cast("date"))
          .withColumn("hr", date_trunc("hour", col("ts")))
        // level 1: within-hour running sum — the only window that sees
        // delta-grain rows, partitioned on (day, hour)
        val hourly = deltas
          .withColumn(
            "running_h",
            sum(col("delta")).over(
              Window.partitionBy(col("day"), col("hr"))
                .orderBy(col("ts").asc, col("delta").desc)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("day"), col("hr"))
          .agg(
            max(col("running_h")).as("max_running_h"),
            sum(col("delta")).as("h_total"))
        // level 2: per-day prefix of the hour totals (≤24 rows/day)
        // shifts each hour's within-hour max to its day-relative level
        val swept = hourly
          .withColumn(
            "h_offset",
            coalesce(
              sum(col("h_total")).over(
                Window.partitionBy(col("day"))
                  .orderBy(col("hr").asc)
                  .rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .groupBy(col("day"))
          .agg(max(col("h_offset") + col("max_running_h")).as("max_running"))
        val opening = sess
          .filter(col("s_end").cast("date") > col("s_start").cast("date"))
          .select(explode(expr(
            "sequence(date_add(cast(s_start as date), 1), cast(s_end as date), interval 1 day)"))
            .as("day"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("opening"))
        swept
          .join(opening, Seq("day"), "left")
          .select(
            col("day"),
            coalesce(col("opening"), lit(0L)).as("open_at_midnight"),
            greatest(
              coalesce(col("opening"), lit(0L)),
              coalesce(col("opening"), lit(0L)) + col("max_running"))
              .as("max_concurrent"))
      },
      oracle = Some("""
        WITH sess AS (
          SELECT user_id, session_seq, MIN(ts) AS s_start, MAX(ts) AS s_end
          FROM (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
              SELECT user_id, event_id, ts,
                     CASE WHEN prev_ts IS NULL
                            OR DATE_DIFF('microsecond', prev_ts, ts) > 30 * 60 * 1000000
                          THEN 1 ELSE 0 END AS new_session
              FROM (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
                FROM events)))
          GROUP BY user_id, session_seq),
        deltas AS (
          SELECT s_start AS ts, 1 AS delta, CAST(s_start AS DATE) AS day FROM sess
          UNION ALL
          SELECT s_end AS ts, -1 AS delta, CAST(s_end AS DATE) AS day FROM sess),
        swept AS (
          SELECT day, CAST(MAX(running) AS BIGINT) AS max_running FROM (
            SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY ts ASC, delta DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
            FROM deltas)
          GROUP BY day),
        opening AS (
          SELECT day, COUNT(*) AS cnt FROM (
            SELECT CAST(UNNEST(generate_series(CAST(s_start AS DATE) + 1,
                                               CAST(s_end AS DATE),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM sess
            WHERE CAST(s_end AS DATE) > CAST(s_start AS DATE))
          GROUP BY day)
        SELECT s.day,
               COALESCE(o.cnt, 0) AS open_at_midnight,
               GREATEST(COALESCE(o.cnt, 0), COALESCE(o.cnt, 0) + s.max_running)
                 AS max_concurrent
        FROM swept s LEFT JOIN opening o ON s.day = o.day"""),
    ),

    // ----------------------------------------------------------------
    // Ordered event sequences per user: sort_array(collect_list(struct
    // (ts, event_id, type))) assembles each user's deterministic
    // timeline inside one hash aggregate (no window, no per-user sort
    // pass), and higher-order functions slice/transform the head
    // without ever re-exploding. The sequence column serializes to a
    // '|'-joined string — sequence features hash cross-engine as
    // scalars. Contract: group state is bounded by per-user activity
    // (true of session-scale analytics); unbounded histories belong in
    // q13's windowed rank world instead.
    "q111_event_sequences" -> QueryDef(
      fn = (s, d) =>
        events(s, d)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
              .as("seq"))
          .select(
            col("user_id"),
            col("n_events"),
            col("n_types"),
            concat_ws("|", expr("transform(slice(seq, 1, 10), x -> x.event_type)"))
              .as("first10")),
      oracle = Some("""
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_types,
               array_to_string((list(event_type ORDER BY ts ASC, event_id ASC))[1:10], '|')
                 AS first10
        FROM events GROUP BY user_id"""),
    ),

    // ----------------------------------------------------------------
    // Event-type transition matrix (the Markov-chain view of user
    // behavior): lag() pairs each event with its predecessor inside a
    // user-partitioned window, then one hash aggregate counts the
    // (prev → next) cells; the share divides by the prev-row total via
    // a second tiny aggregation joined back (25 cells — broadcast).
    // Exact: share = BIGINT / BIGINT in double, identical operands on
    // both engines.
    "q112_event_transitions" -> QueryDef(
      fn = (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val pairs = events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
          .where(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("prev_type")).agg(sum(col("n")).as("total"))
        pairs
          .join(totals, "prev_type")
          .select(
            col("prev_type"), col("next_type"), col("n"),
            (col("n").cast("double") / col("total").cast("double")).as("share"))
      },
      oracle = Some("""
        WITH pairs AS (
          SELECT prev_type, event_type AS next_type, COUNT(*) AS n
          FROM (
            SELECT event_type,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                     AS prev_type
            FROM events)
          WHERE prev_type IS NOT NULL
          GROUP BY 1, 2),
        totals AS (
          SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total FROM pairs GROUP BY 1)
        SELECT p.prev_type, p.next_type, p.n,
               CAST(p.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        FROM pairs p JOIN totals t ON p.prev_type = t.prev_type"""),
    ),

    // ----------------------------------------------------------------
    // Retention cohorts: cohort = ISO week of a user's first event;
    // cell (cohort_week, week_offset) counts distinct users active
    // that many weeks later. Two user-keyed aggregations plus one
    // cohort-grain count-distinct: the first-seen table is O(users)
    // and joins back to the log on its key. Both engines truncate
    // weeks to Monday, and the offset is an exact integer because
    // Monday-to-Monday day differences are multiples of 7.
    "q102_retention_cohort" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("ts"))
        val first = ev
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("first_ts"))
          .select(
            col("user_id"),
            date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
        ev.join(first, "user_id")
          .withColumn(
            "week_offset",
            expr("datediff(cast(date_trunc('week', ts) as date), cohort_week) div 7")
              .cast("int"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
      },
      oracle = Some("""
        SELECT f.cohort_week,
               CAST(DATE_DIFF('day', f.cohort_week,
                              CAST(DATE_TRUNC('week', e.ts) AS DATE)) // 7 AS INTEGER)
                 AS week_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e
        JOIN (SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
              FROM events GROUP BY user_id) f
          ON e.user_id = f.user_id
        GROUP BY 1, 2"""),
    ),

    // ----------------------------------------------------------------
    // ASSOCIATION RULES (market-basket): support / confidence / lift
    // for brand pairs co-occurring in an order. Pair generation is a
    // self-join of the DISTINCT (order, brand) table on the order key
    // with b1 < b2 — both sides shuffle ONCE on the same key and the
    // per-order pair count is bounded by (brands-per-order choose 2),
    // so the blow-up is basket-bounded, not O(n^2). The brand-count
    // table is O(#brands) and BROADCAST onto the pair table twice; the
    // corpus total rides a 1-row cross join. All counts are integers;
    // the three ratios are round-6 doubles.
    "q116_assoc_rules" -> QueryDef(
      fn = (s, d) => {
        val ob = lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
          .distinct()
        val total = ob.agg(countDistinct(col("o")).as("total"))
        val bc = ob.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
        val pairs = ob.as("a")
          .join(ob.as("c"), col("a.o") === col("c.o") && col("a.b") < col("c.b"))
          .groupBy(col("a.b").as("b1"), col("c.b").as("b2"))
          .agg(count(lit(1)).as("pair_cnt"))
          .where(col("pair_cnt") >= 3)
        pairs
          .join(broadcast(bc.select(col("b").as("b1"), col("cnt").as("b1_cnt"))), "b1")
          .join(broadcast(bc.select(col("b").as("b2"), col("cnt").as("b2_cnt"))), "b2")
          .crossJoin(broadcast(total))
          .select(
            col("b1"), col("b2"), col("pair_cnt"),
            round(col("pair_cnt").cast("double") / col("total"), 6).as("support"),
            round(col("pair_cnt").cast("double") / col("b1_cnt"), 6).as("confidence"),
            round(col("pair_cnt").cast("double") * col("total") / (col("b1_cnt") * col("b2_cnt")), 6)
              .as("lift"))
      },
      oracle = Some("""
        WITH ob AS (
          SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        n AS (SELECT COUNT(DISTINCT o) AS total FROM ob),
        bc AS (SELECT b, COUNT(*) AS cnt FROM ob GROUP BY 1),
        pairs AS (
          SELECT a.b AS b1, c.b AS b2, COUNT(*) AS pair_cnt
          FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
          GROUP BY 1, 2)
        SELECT b1, b2, pair_cnt,
               ROUND(CAST(pair_cnt AS DOUBLE) / total, 6) AS support,
               ROUND(CAST(pair_cnt AS DOUBLE) / b1c.cnt, 6) AS confidence,
               ROUND(CAST(pair_cnt AS DOUBLE) * total / (b1c.cnt * b2c.cnt), 6) AS lift
        FROM pairs, n, bc b1c, bc b2c
        WHERE b1c.b = pairs.b1 AND b2c.b = pairs.b2 AND pair_cnt >= 3"""),
    ),

    // ----------------------------------------------------------------
    // PARTIAL-AGGREGATE ROLLUP MERGE: build per-(day, type) partials
    // (count / decimal sum / min / max), then MERGE the partials into
    // per-type totals — the algebraic re-aggregation contract behind
    // every incremental warehouse rollup (daily partials land once;
    // month/total views re-aggregate O(days) partial rows, never the
    // raw events). The oracle aggregates the SAME two-level shape, and
    // hash-equality to a direct aggregate holds because count/sum/min/
    // max are algebraic and the sums accumulate in DECIMAL (order-
    // independent). avg is derived sum/count at the END — avg-of-avgs
    // is the classic incremental-rollup bug this query's shape rules
    // out by construction.
    "q120_rollup_merge" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 10)
        val daily = events(s, d)
          .groupBy(
            date_trunc("day", col("ts")).as("day"),
            col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(dt)).as("s"),
            min(col("value")).as("mn"),
            max(col("value")).as("mx"))
        daily
          .groupBy(col("event_type"))
          .agg(
            sum(col("cnt")).as("n_events"),
            count(lit(1)).as("n_days"),
            round(sum(col("s")).cast("double"), 6).as("total_value"),
            min(col("mn")).as("min_value"),
            max(col("mx")).as("max_value"),
            round(sum(col("s")).cast("double") / sum(col("cnt")), 6).as("avg_value"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
                 COUNT(*) AS cnt, SUM(CAST(value AS DECIMAL(38, 10))) AS s,
                 MIN(value) AS mn, MAX(value) AS mx
          FROM events GROUP BY 1, 2)
        SELECT event_type,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               COUNT(*) AS n_days,
               ROUND(CAST(SUM(s) AS DOUBLE), 6) AS total_value,
               MIN(mn) AS min_value, MAX(mx) AS max_value,
               ROUND(CAST(SUM(s) AS DOUBLE) / SUM(cnt), 6) AS avg_value
        FROM daily GROUP BY 1"""),
    ),

    // ----------------------------------------------------------------
    // Z-ORDER LAYOUT KEY — the interleaved-bit (Morton) sort key that
    // multi-dimensional data layout clusters on: files written sorted
    // by zkey are simultaneously range-prunable on BOTH dimensions,
    // which is how a 100 TB table serves point/range filters on two
    // keys from one physical order (repartitionByRange(zkey) +
    // sortWithinPartitions(zkey) on the write path). The key is pure
    // integer bit arithmetic — codegen'd projection, zero shuffle
    // before the profiling aggregate. The per-bucket profile PROVES
    // the locality property the layout exists for: dropping 6 low
    // z-bits leaves 5 high bits of each dimension fixed, so x/y spans
    // inside any bucket are <= 7 (vs ~255 under a hash layout).
    "q125_zorder_layout" -> QueryDef(
      fn = (s, d) => {
        val x = (col("l_partkey") % 256).cast("int")
        val y = (col("l_suppkey") % 256).cast("int")
        val z = (0 until 8).map { i =>
          shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i + 1) +
            shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i)
        }.reduce(_ + _)
        lineitem(s, d)
          .select(z.as("zkey"), x.as("xb"), y.as("yb"))
          .groupBy(shiftright(col("zkey"), 6).as("zbucket"))
          .agg(
            count(lit(1)).as("n"),
            min(col("zkey")).as("z_min"),
            max(col("zkey")).as("z_max"),
            (max(col("xb")) - min(col("xb"))).as("x_span"),
            (max(col("yb")) - min(col("yb"))).as("y_span"))
      },
      oracle = Some {
        val xs = "CAST(l_partkey % 256 AS INTEGER)"
        val ys = "CAST(l_suppkey % 256 AS INTEGER)"
        val zs = (0 until 8).map { i =>
          s"((((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i}))"
        }.mkString(" + ")
        s"""
        WITH b AS (SELECT $xs AS x, $ys AS y FROM lineitem),
        z AS (SELECT ($zs) AS zkey, x AS xb, y AS yb FROM b)
        SELECT zkey >> 6 AS zbucket, COUNT(*) AS n,
               MIN(zkey) AS z_min, MAX(zkey) AS z_max,
               MAX(xb) - MIN(xb) AS x_span, MAX(yb) - MIN(yb) AS y_span
        FROM z GROUP BY 1"""
      }
    ),

    // ----------------------------------------------------------------
    // MAD OUTLIER DETECTION — median absolute deviation, the robust
    // alternative to the z-score (q76): one extreme value shifts a
    // mean/stddev threshold but not a median one. Two rank-selection
    // median passes on [[RankSelect]]'s histogram kernel (no window
    // ever partitions on the 5-value event-type key); the tiny
    // per-type medians broadcast back onto the fact. The deviation
    // table feeds the second median AND the final aggregate, so it is
    // eagerly localCheckpoint'ed once — lineage is cut, the blocks are
    // released by the context cleaner when the plan is dropped, and the
    // events scan runs once instead of three times. Every derived
    // number is exact double arithmetic on identical inputs, so the
    // outlier flags are bit-identical cross-engine.
    "q129_mad_anomaly" -> QueryDef(
      fn = (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type").as("et"), col("value").as("v"))
          .localCheckpoint(true) // read 4x below (3 kernel scans + dev build)
        def median(in: org.apache.spark.sql.DataFrame, c: String) =
          RankSelect
            .selectRanks(in, "et", c,
              Seq("lo" -> "(n + 1) div 2", "hi" -> "(n + 2) div 2"))
            .groupBy(col("et"))
            .agg(avg(col(c)).as(s"med_$c"))
        val med = median(e, "v")
        val dev = e.join(broadcast(med), Seq("et"))
          .withColumn("ad", abs(col("v") - col("med_v")))
          .localCheckpoint(true) // read 4x: 3 kernel scans + the final agg
        val mad = median(dev.select(col("et"), col("ad")), "ad")
        dev
          .join(broadcast(mad), Seq("et"))
          .groupBy(col("et"))
          .agg(
            count(lit(1)).as("n_events"),
            max(col("med_v")).as("median_value"),
            max(col("med_ad")).as("mad"),
            sum(when(col("ad") > col("med_ad") * 3.0, 1L).otherwise(0L)).as("n_outliers"))
          .withColumnRenamed("et", "event_type")
      },
      oracle = Some("""
        WITH e AS (SELECT event_type AS et, value AS v FROM events),
        m1 AS (
          SELECT et, AVG(v) AS med_v FROM (
            SELECT et, v,
                   ROW_NUMBER() OVER (PARTITION BY et ORDER BY v ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY et) AS n
            FROM e)
          WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY et),
        dev AS (
          SELECT e.et, v, med_v, ABS(v - med_v) AS ad
          FROM e JOIN m1 ON e.et = m1.et),
        m2 AS (
          SELECT et, AVG(ad) AS med_ad FROM (
            SELECT et, ad,
                   ROW_NUMBER() OVER (PARTITION BY et ORDER BY ad ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY et) AS n
            FROM dev)
          WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY et)
        SELECT dev.et AS event_type, COUNT(*) AS n_events,
               MAX(med_v) AS median_value, MAX(med_ad) AS mad,
               CAST(SUM(CASE WHEN ad > med_ad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN m2 ON dev.et = m2.et
        GROUP BY dev.et"""),
    ),

    // ----------------------------------------------------------------
    // KEY-SKEW PROFILE — the diagnostic a shuffle planner wants before
    // picking a join strategy: per event type, how concentrated is the
    // user-key distribution (top-key share, Shannon entropy). Two
    // keyed aggregations, O(type x user) shuffle. Entropy terms are
    // summed in DECIMAL (order-independent) because a double sum of
    // thousands of ln terms would hash-differ on partition order; the
    // round-6 final absorbs the per-term 1-ulp libm difference.
    "q130_key_skew_profile" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 18)
        val cnt = Tables.events(s, d)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        cnt
          .groupBy(col("event_type"))
          .agg(
            sum(col("c")).as("n_events"),
            count(lit(1)).as("n_users"),
            max(col("c")).as("top_key"),
            sum((col("c").cast("double") * log(col("c").cast("double"))).cast(dt))
              .as("s_clnc"))
          .select(
            col("event_type"), col("n_events"), col("n_users"),
            round(col("top_key").cast("double") / col("n_events"), 6).as("top_share"),
            // H = ln(n) - (1/n) * sum(c * ln c)
            round(
              log(col("n_events").cast("double")) -
                col("s_clnc").cast("double") / col("n_events"), 6).as("entropy"))
      },
      oracle = Some("""
        WITH cnt AS (
          SELECT event_type, user_id, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        agg AS (
          SELECT event_type,
                 CAST(SUM(c) AS BIGINT) AS n_events,
                 COUNT(*) AS n_users,
                 CAST(MAX(c) AS BIGINT) AS top_key,
                 SUM(CAST(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)) AS DECIMAL(38, 18))) AS s_clnc
          FROM cnt GROUP BY 1)
        SELECT event_type, n_events, n_users,
               ROUND(CAST(top_key AS DOUBLE) / n_events, 6) AS top_share,
               ROUND(LN(CAST(n_events AS DOUBLE)) - CAST(s_clnc AS DOUBLE) / n_events, 6) AS entropy
        FROM agg"""),
    ),

    // ----------------------------------------------------------------
    // LAST-TOUCH ATTRIBUTION — every purchase credited to the user's
    // most recent PRIOR view, the marketing-analytics join that naive
    // implementations write as a per-purchase subquery (quadratic).
    // Here it is one user-partitioned window with a strictly-prior
    // frame and last(ignoreNulls) carry-forward — each user's timeline
    // is scanned once, purchases simply read the carried value. Gap
    // seconds compare floor-epoch integers, exact cross-engine.
    "q133_attribution" -> QueryDef(
      fn = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
          .withColumn("attr_view_id",
            last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
          .withColumn("attr_view_ts",
            last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          .select(
            col("event_id").as("purchase_id"),
            col("user_id"),
            col("attr_view_id"),
            (col("ts").cast("long") - col("attr_view_ts").cast("long")).as("gap_seconds"))
      },
      oracle = Some("""
        SELECT purchase_id, user_id, attr_view_id, gap_seconds FROM (
          SELECT event_id AS purchase_id, user_id, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
                   OVER w AS attr_view_id,
                 CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) -
                 CAST(FLOOR(epoch(LAST_VALUE(CASE WHEN event_type = 'view'
                       THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS) OVER w)) AS BIGINT)
                   AS gap_seconds
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        WHERE event_type = 'purchase'"""),
    ),

    // ----------------------------------------------------------------
    // CUSUM CHANGEPOINT — the day each event type's daily volume most
    // diverges from its own mean, via the classic cumulative-sum
    // statistic. Everything runs on the REDUCED daily table (O(types x
    // days)): per-type mean from unbounded windows, deviations
    // accumulated in DECIMAL (a windowed double sum is evaluated
    // left-to-right by Spark but as a segment tree by DuckDB — decimal
    // addition is order-independent, sidestepping that), argmax by the
    // (|cusum|, day) struct.
    "q135_cusum_changepoint" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 12)
        val wType = Window.partitionBy(col("event_type"))
        val wRun = Window.partitionBy(col("event_type"))
          .orderBy(col("day").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("n_days", count(lit(1)).over(wType))
          .withColumn("mean", sum(col("cnt")).over(wType).cast("double") / col("n_days"))
          .withColumn("cusum",
            sum(col("cnt").cast(dt) - col("mean").cast(dt)).over(wRun))
          .withColumn("abs_c", abs(col("cusum")).cast("double"))
          .groupBy(col("event_type"))
          .agg(
            max(col("n_days")).as("n_days"),
            max(struct(col("abs_c"), col("day"))).as("m"))
          .select(
            col("event_type"), col("n_days"),
            col("m.day").as("changepoint_day"),
            round(col("m.abs_c"), 6).as("peak_cusum"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        dm AS (
          SELECT event_type, day, cnt,
                 COUNT(*) OVER (PARTITION BY event_type) AS n_days,
                 CAST(CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE) /
                      COUNT(*) OVER (PARTITION BY event_type) AS DECIMAL(38, 12)) AS mean_dec
          FROM daily),
        cu AS (
          SELECT event_type, day, n_days,
                 ABS(SUM(CAST(cnt AS DECIMAL(38, 12)) - mean_dec)
                     OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS abs_dec
          FROM dm),
        sel AS (
          SELECT event_type, day, n_days, CAST(abs_dec AS DOUBLE) AS abs_c,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY CAST(abs_dec AS DOUBLE) DESC, day DESC) AS rn
          FROM cu)
        SELECT event_type, n_days, day AS changepoint_day, ROUND(abs_c, 6) AS peak_cusum
        FROM sel WHERE rn = 1"""),
    ),

    // ----------------------------------------------------------------
    // INTERVAL OVERLAP JOIN — the bucket-decomposed range join (the
    // batch analog of Flink's interval join; the genomics/session
    // overlap kernel): for every user session (q40's 30-min-gap
    // intervals), how many OTHER sessions overlap it in time? q106's
    // sweep-line answers "how many concurrent at instant t"; this is
    // the pairwise JOIN — who overlaps whom — which a naive engine
    // writes as a quadratic theta-join. The distributed shape: explode
    // each interval to the hour buckets it spans, equi-join on bucket
    // (pair volume = real overlap density, never sessions²), and count
    // each overlapping pair EXACTLY ONCE by keeping it only in the
    // bucket of max(start_a, start_b) — an hour both intervals
    // provably contain. Per-bucket skew (one hot hour) is the
    // documented salting case; bucket width trades fan-out (long
    // intervals explode more) against per-bucket pair volume.
    "q165_interval_overlap" -> QueryDef(
      fn = (s, d) => {
        val byUser = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val HourUs = 3600L * 1000000
        val sessions = Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000, 1)
              .otherwise(0))
          .withColumn("session_seq",
            sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            min(unix_micros(col("ts"))).as("s_us"),
            max(unix_micros(col("ts"))).as("e_us"))
          .persist() // both join sides + the final left join
        graft.CacheLeases.lease(sessions)
        val spans = sessions.select(col("user_id"), col("session_seq"),
          col("s_us"), col("e_us"),
          explode(expr(s"sequence(s_us div $HourUs, e_us div $HourUs)")).as("bucket"))
        val n = spans.as("a")
          .join(spans.as("b"),
            col("a.bucket") === col("b.bucket") &&
              (col("a.user_id") =!= col("b.user_id") ||
                col("a.session_seq") =!= col("b.session_seq")) &&
              col("a.s_us") <= col("b.e_us") && col("b.s_us") <= col("a.e_us") &&
              col("a.bucket") === expr(s"greatest(a.s_us, b.s_us) div $HourUs"))
          .groupBy(col("a.user_id").as("user_id"), col("a.session_seq").as("session_seq"))
          .agg(count(lit(1)).as("n_overlap"))
        sessions
          .join(n, Seq("user_id", "session_seq"), "left")
          .select(
            col("user_id"),
            col("session_seq").cast("long").as("session_seq"),
            timestamp_micros(col("s_us")).as("session_start"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      oracle = Some("""
        WITH sess AS (
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
          FROM (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
              SELECT user_id, event_id, ts,
                     CASE WHEN prev_ts IS NULL
                            OR DATE_DIFF('microsecond', prev_ts, ts) > 30 * 60 * 1000000
                          THEN 1 ELSE 0 END AS new_session
              FROM (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
                FROM events)))
          GROUP BY user_id, session_seq),
        ov AS (
          SELECT a.user_id, a.session_seq, COUNT(*) AS n_overlap
          FROM sess a
          JOIN sess b ON (a.user_id <> b.user_id OR a.session_seq <> b.session_seq)
                     AND a.s_us <= b.e_us AND b.s_us <= a.e_us
          GROUP BY a.user_id, a.session_seq)
        SELECT s.user_id, s.session_seq,
               make_timestamp(s.s_us) AS session_start,
               CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap
        FROM sess s
        LEFT JOIN ov ON ov.user_id = s.user_id AND ov.session_seq = s.session_seq""")
    ),

    // ----------------------------------------------------------------
    // ROBUST ANOMALY DAYS (median/MAD, Iglewicz & Hoaglin 1993) — the
    // monitor that survives the outliers it hunts: per segment, the
    // 5 most deviant daily order-volume days by MODIFIED z-score
    // 0.6745·(x−med)/MAD, flagged anomalous above the classic 3.5 cut.
    // Mean/stddev monitors (q161's drift shape) move WITH a spike;
    // median and MAD do not. q129 is the SUMMARY twin (outlier counts
    // per event type); this is the report a pager needs — WHICH days,
    // scored, with the zero-MAD degenerate case handled instead of
    // silently dividing by zero. Exactness: the day-grain values are
    // INTEGER counts, both medians come from the RankSelect kernel in
    // doubled form (med2 = lo+hi rank values, mad4 = lo+hi of the
    // 2×deviations), so the 3.5-MAD flag is a pure BIGINT comparison
    // (13490·dev2 > 35000·mad4) and the reported score divides exact
    // integers. Shape: one fact-grain aggregate to day grain, then
    // RankSelect's histogram kernel twice (bounded per-task input,
    // no global sort), then a day-grain top-5 window per segment.
    "q246_mad_anomalies" -> QueryDef(
      fn = (s, d) => {
        val daily = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("v"))
          .localCheckpoint(true)
        val mid = Seq("lo" -> "(n + 1) div 2", "hi" -> "(n + 2) div 2")
        val med = RankSelect.selectRanks(daily.select(col("seg"), col("v")), "seg", "v", mid)
          .groupBy(col("seg")).agg(sum(col("v")).as("med2"))
        val dev = daily.join(broadcast(med), "seg")
          .withColumn("dev2", abs(lit(2) * col("v") - col("med2")))
          .localCheckpoint(true)
        val mad = RankSelect.selectRanks(dev.select(col("seg"), col("dev2")), "seg", "dev2", mid)
          .groupBy(col("seg")).agg(sum(col("dev2")).as("mad4"))
        // zero-MAD degenerate case (over half the days share the median
        // count — real at small scale): no dispersion estimate exists,
        // so the score is NULL and ANY deviation from the median flags
        val wTop = Window.partitionBy(col("seg"))
          .orderBy(col("dev2").desc, col("day").asc)
        dev.join(broadcast(mad), "seg")
          .withColumn("rk", row_number().over(wTop))
          .where(col("rk") <= 5)
          .select(col("seg"), col("day"), col("v").as("n_orders"),
            when(col("mad4") > 0,
              round(lit(0.6745) * (col("dev2").cast("double") / lit(2.0)) /
                (col("mad4").cast("double") / lit(4.0)), 6)).as("score"),
            when(col("mad4") > 0,
              lit(13490) * col("dev2") > lit(35000) * col("mad4"))
              .otherwise(col("dev2") > 0).as("is_anomaly"))
      },
      oracle = Some("""
        WITH daily AS MATERIALIZED (
          SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        rk1 AS MATERIALIZED (
          SELECT seg, v,
                 ROW_NUMBER() OVER (PARTITION BY seg ORDER BY v ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY seg) AS n
          FROM daily),
        med AS MATERIALIZED (
          SELECT seg,
                 CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END) +
                      SUM(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END) AS BIGINT) AS med2
          FROM rk1 GROUP BY seg),
        dv AS MATERIALIZED (
          SELECT d.seg, d.day, d.v, ABS(2 * d.v - m.med2) AS dev2
          FROM daily d JOIN med m ON d.seg = m.seg),
        rk2 AS MATERIALIZED (
          SELECT seg, dev2,
                 ROW_NUMBER() OVER (PARTITION BY seg ORDER BY dev2 ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY seg) AS n
          FROM dv),
        mad AS MATERIALIZED (
          SELECT seg,
                 CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END) +
                      SUM(CASE WHEN rn = (n + 2) // 2 THEN dev2 ELSE 0 END) AS BIGINT) AS mad4
          FROM rk2 GROUP BY seg)
        SELECT seg, day, n_orders, score, is_anomaly FROM (
          SELECT dv.seg, dv.day, dv.v AS n_orders,
                 CASE WHEN ma.mad4 > 0 THEN
                   ROUND(0.6745 * (CAST(dv.dev2 AS DOUBLE) / 2.0) /
                         (CAST(ma.mad4 AS DOUBLE) / 4.0), 6)
                 END AS score,
                 CASE WHEN ma.mad4 > 0 THEN 13490 * dv.dev2 > 35000 * ma.mad4
                      ELSE dv.dev2 > 0 END AS is_anomaly,
                 ROW_NUMBER() OVER (PARTITION BY dv.seg
                   ORDER BY dv.dev2 DESC, dv.day ASC) AS rk
          FROM dv JOIN mad ma ON ma.seg = dv.seg) t
        WHERE rk <= 5""")
    ),

    // ----------------------------------------------------------------
    // THEIL-SEN ROBUST TREND (Sen 1968) — the median of all pairwise
    // slopes over each segment's last-120-day order volume: the trend
    // estimate with a 29% breakdown point where q97's OLS slope is
    // dragged by a single spike day (exactly the days q246 flags).
    // The pair set is CALENDAR²-bounded BY CONSTRUCTION (≤ C(120,2) =
    // 7140 pairs per segment at any corpus size — the q208 discipline
    // applied quadratically), so the slope-rank window orders a fixed-
    // size frame while only the day-grain aggregate sees the corpus.
    // Exactness: y is an integer count, x an integer day offset, so
    // each slope is ONE IEEE-exact division; the median picks values
    // at ranks (value-at-rank is tie-safe) and averages at most two
    // doubles — one exact add and halving.
    "q247_theil_sen" -> QueryDef(
      fn = (s, d) => {
        val daily = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("y"))
        val mx = daily.agg(max(col("day")).as("mxd"))
        val recent = daily.crossJoin(broadcast(mx))
          .where(col("day") > date_sub(col("mxd"), 120))
          .select(col("seg"),
            datediff(col("day"), col("mxd")).as("x"), col("y"))
          .localCheckpoint(true)
        // the 120-day frame is ≤ segments × 120 rows at ANY corpus
        // size — broadcast the right side of the pair join outright
        val pairs = recent.as("a").join(broadcast(recent.as("b")),
          col("a.seg") === col("b.seg") && col("a.x") < col("b.x"))
          .select(col("a.seg").as("seg"),
            ((col("b.y") - col("a.y")).cast("double") /
              (col("b.x") - col("a.x")).cast("double")).as("slope"))
        val wSeg = Window.partitionBy(col("seg"))
        pairs
          .withColumn("rn", row_number().over(wSeg.orderBy(col("slope").asc)))
          .withColumn("np", count(lit(1)).over(wSeg))
          .where(col("rn") === expr("(np + 1) div 2") ||
            col("rn") === expr("(np + 2) div 2"))
          .groupBy(col("seg"))
          .agg(round(avg(col("slope")), 6).as("slope_per_day"),
            max(col("np")).as("n_pairs"))
      },
      oracle = Some("""
        WITH daily AS MATERIALIZED (
          SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        mx AS (SELECT MAX(day) AS mxd FROM daily),
        recent AS MATERIALIZED (
          SELECT seg, DATEDIFF('day', mxd, day) AS x, y
          FROM daily CROSS JOIN mx
          WHERE day > mxd - INTERVAL 120 DAY),
        pairs AS MATERIALIZED (
          SELECT a.seg,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
          FROM recent a JOIN recent b ON a.seg = b.seg AND a.x < b.x),
        rk AS MATERIALIZED (
          SELECT seg, slope,
                 ROW_NUMBER() OVER (PARTITION BY seg ORDER BY slope ASC) AS rn,
                 COUNT(*) OVER (PARTITION BY seg) AS np
          FROM pairs)
        SELECT seg, ROUND(AVG(slope), 6) AS slope_per_day,
               CAST(MAX(np) AS BIGINT) AS n_pairs
        FROM rk
        WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
        GROUP BY seg""")
    ),

    // ----------------------------------------------------------------
    // GINI CONCENTRATION of customer order volume per segment — the
    // "do 20% of customers drive 80% of volume?" number, from the
    // rank-sum identity G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over
    // ascending-sorted per-customer counts. Tie-safe BY ALGEBRA: tied
    // x values contribute the same Σ i·x₍ᵢ₎ whatever order the window
    // numbers them, so cross-engine ROW_NUMBER tie divergence cannot
    // leak into the result. Everything is BIGINT until one final
    // IEEE-exact division (rank sums stay < 2⁵³ to ~10⁸ customers per
    // segment; DECIMAL territory beyond — documented, not needed at
    // gated scale). Shape: one fact-grain aggregate, then — because
    // per-customer order COUNTS are discrete and bounded — a VALUE-
    // grain aggregate (one row per (segment, distinct count), dozens
    // of rows however big the corpus) whose sorted-array fold applies
    // the tie-block identity Σ rn·x over ranks cum+1..cum+t = x·(t·cum
    // + t(t+1)/2) directly. No rank window AT ALL: the round-9 per-
    // segment single-task customer sort is gone, and the only state
    // past the fact aggregate is bounded by the distinct-value count.
    "q248_gini" -> QueryDef(
      fn = (s, d) => {
        val pc = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("cust"))
          .agg(count(lit(1)).as("x"))
        val vc = pc.groupBy(col("seg"), col("x")).agg(count(lit(1)).as("t"))
        vc.groupBy(col("seg"))
          .agg(sort_array(collect_list(struct(col("x"), col("t")))).as("a"))
          .select(col("seg"), expr("""
            aggregate(a, named_struct('cum', 0L, 'sx', 0L, 'srx', 0L),
              (acc, e) -> named_struct(
                'cum', acc.cum + e.t,
                'sx',  acc.sx + e.x * e.t,
                'srx', acc.srx + e.x * (e.t * acc.cum + (e.t * (e.t + 1)) div 2)))""").as("m"))
          .select(col("seg"), col("m.cum").as("n"), col("m.sx").as("sx"),
            col("m.srx").as("srx"))
          .select(col("seg"), col("n").as("n_cust"), col("sx").as("total_orders"),
            round((lit(2L) * col("srx") - (col("n") + 1) * col("sx")).cast("double") /
              (col("n") * col("sx")).cast("double"), 6).as("gini"))
      },
      oracle = Some("""
        WITH pc AS MATERIALIZED (
          SELECT c_mktsegment AS seg, o_custkey AS cust,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        rk AS MATERIALIZED (
          SELECT seg, x,
                 ROW_NUMBER() OVER (PARTITION BY seg
                   ORDER BY x ASC, cust ASC) AS rn
          FROM pc),
        m AS MATERIALIZED (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(rn * x) AS BIGINT) AS srx
          FROM rk GROUP BY seg)
        SELECT seg, n AS n_cust, sx AS total_orders,
               ROUND(CAST(2 * srx - (n + 1) * sx AS DOUBLE) /
                     CAST(n * sx AS DOUBLE), 6) AS gini
        FROM m""")
    ),

    // ----------------------------------------------------------------
    // RFM SEGMENTATION (Recency / Frequency / Monetary quintiles) —
    // the classic retail customer segmentation, built SCALE-HONEST:
    // the naive formulation is a global ntile (one sort of every
    // customer on a single partition, three times); instead the four
    // quintile BOUNDARIES per metric come from the RankSelect
    // histogram kernel (bounded per-task input, no global sort) and
    // broadcast back, so scoring is map-only. Scores are value-based
    // ("1 + #boundaries strictly below"), which is tie-deterministic
    // cross-engine where positional ntile is not. Output is the
    // (r, f, m, label) cell census — the table a lifecycle-marketing
    // dashboard reads directly.
    "q249_rfm" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 4)
        val mx = orders(s, d).agg(max(col("o_orderdate").cast("date")).as("mxd"))
        val pc = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .crossJoin(broadcast(mx))
          .groupBy(col("o_custkey").as("cust"))
          .agg(min(datediff(col("mxd"), col("o_orderdate").cast("date"))).as("r"),
            count(lit(1)).as("f"),
            sum(col("o_totalprice").cast(dt)).as("m"))
          .localCheckpoint(true) // 3 kernel scans + the scoring pass
        val ranks = (1 to 4).map(i => s"b$i" -> s"($i * n) div 5")
        def bounds(c: String) = {
          val bAggs = (1 to 4).map(i =>
            max(when(col("label") === s"b$i", col(c))).as(s"${c}_b$i"))
          broadcast(
            RankSelect.selectRanks(pc.select(lit("all").as("g"), col(c)), "g", c, ranks)
              .groupBy(col("g"))
              .agg(bAggs.head, bAggs.tail: _*)
              .drop("g"))
        }
        def score(c: String) = (1 to 4)
          .map(i => when(col(c) > col(s"${c}_b$i"), 1).otherwise(0))
          .reduce(_ + _) + lit(1)
        val scored = pc
          .crossJoin(bounds("r")) // 1-row broadcasts
          .crossJoin(bounds("f"))
          .crossJoin(bounds("m"))
          .select(col("cust"),
            (lit(6) - score("r")).as("r_score"), // recent = small r = high score
            score("f").as("f_score"), score("m").as("m_score"))
        scored
          .withColumn("label",
            when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
              .when(col("r_score") <= 2 && (col("f_score") >= 4 || col("m_score") >= 4), "at_risk")
              .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
              .otherwise("regular"))
          .groupBy(col("r_score"), col("f_score"), col("m_score"), col("label"))
          .agg(count(lit(1)).as("n_cust"))
      },
      oracle = Some("""
        WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
        pc AS MATERIALIZED (
          SELECT o_custkey AS cust,
                 MIN(DATEDIFF('day', CAST(o_orderdate AS DATE), mxd)) AS r,
                 CAST(COUNT(*) AS BIGINT) AS f,
                 SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS m
          FROM orders JOIN customer ON o_custkey = c_custkey
          CROSS JOIN mx
          GROUP BY o_custkey),
        rr AS MATERIALIZED (
          SELECT r AS v, ROW_NUMBER() OVER (ORDER BY r) AS rn,
                 COUNT(*) OVER () AS n FROM pc),
        rf AS MATERIALIZED (
          SELECT f AS v, ROW_NUMBER() OVER (ORDER BY f) AS rn,
                 COUNT(*) OVER () AS n FROM pc),
        rm AS MATERIALIZED (
          SELECT m AS v, ROW_NUMBER() OVER (ORDER BY m) AS rn,
                 COUNT(*) OVER () AS n FROM pc),
        rb AS (SELECT MAX(CASE WHEN rn = (1*n)//5 THEN v END) AS b1,
                      MAX(CASE WHEN rn = (2*n)//5 THEN v END) AS b2,
                      MAX(CASE WHEN rn = (3*n)//5 THEN v END) AS b3,
                      MAX(CASE WHEN rn = (4*n)//5 THEN v END) AS b4 FROM rr),
        fb AS (SELECT MAX(CASE WHEN rn = (1*n)//5 THEN v END) AS b1,
                      MAX(CASE WHEN rn = (2*n)//5 THEN v END) AS b2,
                      MAX(CASE WHEN rn = (3*n)//5 THEN v END) AS b3,
                      MAX(CASE WHEN rn = (4*n)//5 THEN v END) AS b4 FROM rf),
        mb AS (SELECT MAX(CASE WHEN rn = (1*n)//5 THEN v END) AS b1,
                      MAX(CASE WHEN rn = (2*n)//5 THEN v END) AS b2,
                      MAX(CASE WHEN rn = (3*n)//5 THEN v END) AS b3,
                      MAX(CASE WHEN rn = (4*n)//5 THEN v END) AS b4 FROM rm),
        sc AS MATERIALIZED (
          SELECT cust,
                 6 - (1 + (CASE WHEN r > rb.b1 THEN 1 ELSE 0 END) +
                          (CASE WHEN r > rb.b2 THEN 1 ELSE 0 END) +
                          (CASE WHEN r > rb.b3 THEN 1 ELSE 0 END) +
                          (CASE WHEN r > rb.b4 THEN 1 ELSE 0 END)) AS r_score,
                 1 + (CASE WHEN f > fb.b1 THEN 1 ELSE 0 END) +
                     (CASE WHEN f > fb.b2 THEN 1 ELSE 0 END) +
                     (CASE WHEN f > fb.b3 THEN 1 ELSE 0 END) +
                     (CASE WHEN f > fb.b4 THEN 1 ELSE 0 END) AS f_score,
                 1 + (CASE WHEN m > mb.b1 THEN 1 ELSE 0 END) +
                     (CASE WHEN m > mb.b2 THEN 1 ELSE 0 END) +
                     (CASE WHEN m > mb.b3 THEN 1 ELSE 0 END) +
                     (CASE WHEN m > mb.b4 THEN 1 ELSE 0 END) AS m_score
          FROM pc CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb)
        SELECT CAST(r_score AS INTEGER) AS r_score,
               CAST(f_score AS INTEGER) AS f_score,
               CAST(m_score AS INTEGER) AS m_score,
               CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
                    WHEN r_score <= 2 AND (f_score >= 4 OR m_score >= 4) THEN 'at_risk'
                    WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
                    ELSE 'regular' END AS label,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM sc
        GROUP BY 1, 2, 3, 4""")
    )
  )
}
