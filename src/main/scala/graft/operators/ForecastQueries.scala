package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TIME-SERIES FORECASTING — Holt's linear-trend method (double
  * exponential smoothing), the missing last mile of the reference's
  * demand-forecast pipeline: `update_ml_features.py:29-166` assembles
  * the features and q204-q207 fit the cross-sectional model, but a
  * bakery plans PRODUCTION against a forecast, and the reference's
  * `forecast_accuracy` column ships NULL (:150). q209's backtest MAE
  * is that number.
  *
  * Why this shape at 100 TB: a level/trend recursion is inherently
  * sequential IN TIME, so the only scalable plan is
  *
  *   row grain → (group, day) DECIMAL pre-aggregation   [the only
  *     corpus-sized shuffle — O(groups·days), and days are bounded by
  *     the CALENDAR, not the corpus]
  *   → per-group date-ordered array (O(days) each)
  *   → one sequential fold per group, all groups in parallel.
  *
  * A 100 TB corpus has more ROWS per day, never more days: the fold
  * arrays stay exactly as long as the calendar, so the recursion cost
  * is invariant while the pre-aggregation tracks the scan. This is the
  * same state-bounding argument as the Gram/moment families, applied
  * to the time axis.
  *
  * Determinism: smoothing weights are binary fractions (α = 0.5,
  * β = 0.25) and the recursion is +,* only — every step is an
  * IEEE-exact double op with parenthesization pinned between the Spark
  * fold and the oracle. The ORACLE side is a recursive CTE rather than
  * a list fold: DuckDB 1.0's `list(... ORDER BY)` merges thread-local
  * partials nondeterministically, and `list_reduce` itself returns
  * wrong results on sliced/filtered list buffers (both observed here —
  * byte-identical input arrays, drifting fold output), while the
  * recursive CTE replays the recursion row by row and is bit-stable.
  * The backtest's 28-term error sum is NOT a fold at all: each |error|
  * is cast to DECIMAL(38,10) and summed exactly, so no order pinning
  * is needed on either side.
  *
  * Convention: the fold seeds level = first observation, trend = 0
  * (the zero-trend init variant of Holt), and smooths over OBSERVED
  * days — gaps in the calendar advance the recursion by one step, not
  * by elapsed days. Both conventions are mirrored in the oracle.
  */
object ForecastQueries extends QueryModule {

  import Tables._

  private val dt = DecimalType(38, 10)
  private val H  = 28

  /** (segment, day) daily revenue — the corpus-sized pre-aggregation.
    * Decimal sums so the daily totals are exact and order-independent.
    */
  private def dailyRevenue(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(
        col("c_mktsegment").as("seg"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast(dt)).as("rev"))
      .select(col("seg"), col("day"), col("rev").cast("double").as("y"))

  /** Date-ordered per-group element array for the fold: struct fields
    * (l, b, y) so the accumulator and the elements share one type. The
    * first element IS the initial state (l = y₀, b = 0).
    */
  private val elemsExpr =
    """transform(sort_array(collect_list(named_struct('day', day, 'y', y))),
       d -> named_struct('l', d.y, 'b', cast(0 as double), 'y', d.y))"""

  /** One Holt step, text-pinned to the oracle's recursive-CTE step: the
    * new level is written out twice (lambdas bind no intermediates) so
    * the parenthesization is identical everywhere.
    */
  private def holtFold(arr: String, init: String): String =
    s"""aggregate($arr, $init,
        (acc, e) -> named_struct(
          'l', 0.5 * e.y + 0.5 * (acc.l + acc.b),
          'b', 0.25 * ((0.5 * e.y + 0.5 * (acc.l + acc.b)) - acc.l) + 0.75 * acc.b,
          'y', e.y))"""

  private val dailySql = """
        daily AS MATERIALIZED (
          SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        ranked AS MATERIALIZED (
          SELECT seg, y,
                 CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY day)
                      AS INTEGER) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY seg) AS INTEGER) AS cnt
          FROM daily),
        nd AS MATERIALIZED (
          SELECT seg, COUNT(*) AS n_days FROM daily GROUP BY seg)"""

  /** Recursive-CTE replay of the Holt recursion over `ranked`, bounded
    * by `bound` (SQL text over r: the last rn to consume).
    */
  private def holtStepSql(bound: String) = s"""
        step AS (
          SELECT seg, rn, cnt, y AS l, CAST(0 AS DOUBLE) AS b
          FROM ranked WHERE rn = 1
          UNION ALL
          SELECT r.seg, r.rn, r.cnt,
                 0.5 * r.y + 0.5 * (s.l + s.b) AS l,
                 0.25 * ((0.5 * r.y + 0.5 * (s.l + s.b)) - s.l) + 0.75 * s.b AS b
          FROM step s JOIN ranked r
            ON r.seg = s.seg AND r.rn = s.rn + 1 AND r.rn <= $bound),
        fit AS MATERIALIZED (
          SELECT seg, arg_max(l, rn) AS l, arg_max(b, rn) AS b
          FROM step GROUP BY seg)"""

  /** Stage orders as 3 mtime-ordered slice files cut on CALENDAR
    * terciles of the observed date range — chronological arrival with
    * day-aligned boundaries, the precondition for continued folding.
    */
  private def stageOrderSlices(s: SparkSession, d: String): String =
    graft.sources.SliceStager.stage(
      "graft_stream_order_slices",
      java.nio.file.Paths.get(d, "orders.parquet"),
      slices = 3,
      g => {
        val o = orders(s, d)
          .withColumn("day", col("o_orderdate").cast("date"))
        val mm = o.agg(min(col("day")), max(col("day"))).head()
        val lo = mm.getDate(0).toLocalDate
        val hi = mm.getDate(1).toLocalDate
        val span = java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1
        val c1 = java.sql.Date.valueOf(lo.plusDays(span / 3))
        val c2 = java.sql.Date.valueOf(lo.plusDays(2 * span / 3))
        val cond = g match {
          case 0 => col("day") < lit(c1)
          case 1 => col("day") >= lit(c1) && col("day") < lit(c2)
          case _ => col("day") >= lit(c2)
        }
        o.where(cond).drop("day")
      })

  /** Merge one ingest batch's per-group day aggregate into the stored
    * Holt state: continue the fold from (level, trend) where state
    * exists, seed from the batch's own head where it doesn't, pass
    * state through untouched for groups with no new days. `batch` must
    * carry (seg, n_new, elems) with elems date-sorted.
    */
  private def mergeHoltState(
      wh: graft.etl.Warehouse, batch: DataFrame): DataFrame =
    if (wh.exists("gold", "mv_holt_state")) {
      val st = wh.load("gold", "mv_holt_state")
        .select(col("seg"), col("n_days").as("n_prev"),
          col("l").as("pl"), col("b").as("pb"))
      batch.join(st, Seq("seg"), "full")
        .withColumn("fit",
          when(col("elems").isNull,
            expr("named_struct('l', pl, 'b', pb, 'y', pl)"))
          .when(col("pl").isNotNull,
            expr(holtFold("elems",
              "named_struct('l', pl, 'b', pb, 'y', pl)")))
          .otherwise(expr(holtFold(
            "slice(elems, 2, cardinality(elems) - 1)",
            "element_at(elems, 1)"))))
        .select(col("seg"),
          (coalesce(col("n_prev"), lit(0L)) +
            coalesce(col("n_new"), lit(0L))).as("n_days"),
          col("fit.l").as("l"), col("fit.b").as("b"))
    } else
      batch.withColumn("fit",
        expr(holtFold("slice(elems, 2, cardinality(elems) - 1)",
          "element_at(elems, 1)")))
        .select(col("seg"), col("n_new").as("n_days"),
          col("fit.l").as("l"), col("fit.b").as("b"))

  /** Read the stored state out in q208's output contract. */
  private def holtStateReport(wh: graft.etl.Warehouse): DataFrame =
    wh.load("gold", "mv_holt_state")
      .select(
        col("seg"), col("n_days"),
        round(col("l"), 6).as("level"),
        round(col("b"), 6).as("trend"),
        round(col("l") + lit(1.0) * col("b"), 6).as("fc_1"),
        round(col("l") + lit(7.0) * col("b"), 6).as("fc_7"),
        round(col("l") + lit(28.0) * col("b"), 6).as("fc_28"))

  /** Pinned 7-day init mean over the head of the element array —
    * matches the oracle's ((((((y1+y2)+y3)+y4)+y5)+y6)+y7)/7.0 because
    * the fold's 0.0 + y1 is bit-exact y1.
    */
  private val hwMeanTxt =
    "(aggregate(slice(elems, 1, 7), cast(0 as double), (a, e) -> a + e.y) / 7.0)"

  /** Holt-Winters additive fold over elements 8..n: the accumulator
    * carries (l, b, s1..s7) with the seasonal slots rotating one
    * position per step (s1 is always the CURRENT position's seasonal).
    * The new level is written out three times — lambdas bind no
    * intermediates — so the text pins the arithmetic exactly.
    */
  private val hwFoldTxt = s"""
    aggregate(slice(elems, 8, cardinality(elems) - 7),
      named_struct('l', $hwMeanTxt, 'b', cast(0 as double),
        's1', element_at(elems, 1).y - $hwMeanTxt,
        's2', element_at(elems, 2).y - $hwMeanTxt,
        's3', element_at(elems, 3).y - $hwMeanTxt,
        's4', element_at(elems, 4).y - $hwMeanTxt,
        's5', element_at(elems, 5).y - $hwMeanTxt,
        's6', element_at(elems, 6).y - $hwMeanTxt,
        's7', element_at(elems, 7).y - $hwMeanTxt),
      (acc, e) -> named_struct(
        'l', 0.5 * (e.y - acc.s1) + 0.5 * (acc.l + acc.b),
        'b', 0.25 * ((0.5 * (e.y - acc.s1) + 0.5 * (acc.l + acc.b)) - acc.l) + 0.75 * acc.b,
        's1', acc.s2, 's2', acc.s3, 's3', acc.s4, 's4', acc.s5,
        's5', acc.s6, 's6', acc.s7,
        's7', 0.25 * (e.y - (0.5 * (e.y - acc.s1) + 0.5 * (acc.l + acc.b))) + 0.75 * acc.s1))"""

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // HOLT-WINTERS (additive, period 7) — the bakery forecaster: a
    // weekly demand rhythm is THE structure in retail food sales, and
    // q52's seasonality indices only describe it; this fits it jointly
    // with level and trend. Same scalable shape as q208 (day-grain
    // pre-aggregation, per-group sequential fold — the 7 seasonal
    // slots ride the fold accumulator and rotate one position per
    // step), same determinism contract (α=0.5, β=γ=0.25 binary
    // fractions, +,* only). Seasonality indexes OBSERVED-day position
    // mod 7 — with a dense daily series that IS the weekday; under
    // gaps it is the documented convention, mirrored in the oracle's
    // recursive CTE which threads the 7 slots as rotating columns.
    // Init: l = mean of the first 7 observations, b = 0, sᵢ = yᵢ − l̄.
    "q218_holt_winters" -> QueryDef(
      fn = (s, d) => {
        val ser = dailyRevenue(s, d)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_days"), expr(elemsExpr).as("elems"))
        ser
          .withColumn("fit", expr(hwFoldTxt))
          .select(
            col("seg"), col("n_days"),
            round(col("fit.l"), 6).as("level"),
            round(col("fit.b"), 6).as("trend"),
            round(col("fit.s1"), 6).as("s_next"),
            round((col("fit.l") + lit(1.0) * col("fit.b")) + col("fit.s1"), 6).as("fc_1"),
            round((col("fit.l") + lit(7.0) * col("fit.b")) + col("fit.s7"), 6).as("fc_7"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql,
        first7 AS MATERIALIZED (
          SELECT seg,
                 MAX(CASE WHEN rn = 1 THEN y END) AS y1,
                 MAX(CASE WHEN rn = 2 THEN y END) AS y2,
                 MAX(CASE WHEN rn = 3 THEN y END) AS y3,
                 MAX(CASE WHEN rn = 4 THEN y END) AS y4,
                 MAX(CASE WHEN rn = 5 THEN y END) AS y5,
                 MAX(CASE WHEN rn = 6 THEN y END) AS y6,
                 MAX(CASE WHEN rn = 7 THEN y END) AS y7
          FROM ranked WHERE rn <= 7 GROUP BY seg),
        step AS (
          SELECT seg, 7 AS rn,
                 ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS l,
                 CAST(0 AS DOUBLE) AS b,
                 y1 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s1,
                 y2 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s2,
                 y3 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s3,
                 y4 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s4,
                 y5 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s5,
                 y6 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s6,
                 y7 - ((((((y1 + y2) + y3) + y4) + y5) + y6) + y7) / 7.0 AS s7
          FROM first7
          UNION ALL
          SELECT r.seg, r.rn,
                 0.5 * (r.y - s.s1) + 0.5 * (s.l + s.b) AS l,
                 0.25 * ((0.5 * (r.y - s.s1) + 0.5 * (s.l + s.b)) - s.l) + 0.75 * s.b AS b,
                 s.s2 AS s1, s.s3 AS s2, s.s4 AS s3, s.s5 AS s4,
                 s.s6 AS s5, s.s7 AS s6,
                 0.25 * (r.y - (0.5 * (r.y - s.s1) + 0.5 * (s.l + s.b))) + 0.75 * s.s1 AS s7
          FROM step s JOIN ranked r ON r.seg = s.seg AND r.rn = s.rn + 1),
        fit AS MATERIALIZED (
          SELECT seg, arg_max(l, rn) AS l, arg_max(b, rn) AS b,
                 arg_max(s1, rn) AS s1, arg_max(s7, rn) AS s7
          FROM step GROUP BY seg)
        SELECT nd.seg, nd.n_days,
               ROUND(f.l, 6) AS level, ROUND(f.b, 6) AS trend,
               ROUND(f.s1, 6) AS s_next,
               ROUND((f.l + 1.0 * f.b) + f.s1, 6) AS fc_1,
               ROUND((f.l + 7.0 * f.b) + f.s7, 6) AS fc_7
        FROM nd JOIN fit f ON nd.seg = f.seg""")
    ),

    // ----------------------------------------------------------------
    // HOLT FIT + FORECAST — terminal level/trend per segment and the
    // 1-, 7- and 28-step-ahead revenue forecasts (level + h·trend).
    // The Spark fold consumes elements 2..n with element 1 as the seed
    // state; the oracle replays the identical recursion as a recursive
    // CTE and reads the terminal state with arg_max(·, rn).
    "q208_holt_forecast" -> QueryDef(
      fn = (s, d) => {
        val ser = dailyRevenue(s, d)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_days"), expr(elemsExpr).as("elems"))
        ser
          .withColumn("fit",
            expr(holtFold("slice(elems, 2, cardinality(elems) - 1)",
              "element_at(elems, 1)")))
          .select(
            col("seg"), col("n_days"),
            round(col("fit.l"), 6).as("level"),
            round(col("fit.b"), 6).as("trend"),
            round(col("fit.l") + lit(1.0) * col("fit.b"), 6).as("fc_1"),
            round(col("fit.l") + lit(7.0) * col("fit.b"), 6).as("fc_7"),
            round(col("fit.l") + lit(28.0) * col("fit.b"), 6).as("fc_28"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql, ${holtStepSql("r.cnt")}
        SELECT nd.seg, nd.n_days,
               ROUND(f.l, 6) AS level, ROUND(f.b, 6) AS trend,
               ROUND(f.l + 1.0 * f.b, 6) AS fc_1,
               ROUND(f.l + 7.0 * f.b, 6) AS fc_7,
               ROUND(f.l + 28.0 * f.b, 6) AS fc_28
        FROM nd JOIN fit f ON nd.seg = f.seg""")
    ),

    // ----------------------------------------------------------------
    // FORECAST BACKTEST — hold out the last 28 observed days, fit on
    // the prefix, forecast h = 1..28, and report the mean absolute
    // error: the `forecast_accuracy` number the reference never
    // computes. The O(groups) fit broadcasts onto the holdout rows and
    // the |error| terms are DECIMAL-summed — a keyed aggregation, not
    // a fold, so it needs no order pinning and no array state.
    "q209_forecast_backtest" -> QueryDef(
      fn = (s, d) => {
        val bySeg = Window.partitionBy("seg")
        val ranked = dailyRevenue(s, d)
          .withColumn("rn", row_number().over(bySeg.orderBy("day")))
          .withColumn("cnt", count(lit(1)).over(bySeg))
        val fit = ranked.where(col("rn") <= col("cnt") - H)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_train"), expr(elemsExpr).as("elems"))
          .withColumn("fit",
            expr(holtFold("slice(elems, 2, cardinality(elems) - 1)",
              "element_at(elems, 1)")))
          .select(col("seg"), col("n_train"),
            col("fit.l").as("l"), col("fit.b").as("b"))
        ranked.where(col("rn") > col("cnt") - H)
          .join(broadcast(fit), Seq("seg"))
          .select(col("seg"), col("n_train"), col("l"), col("b"),
            abs(col("y") -
              (col("l") + (col("rn") - (col("cnt") - H)) * col("b")))
              .cast(dt).as("ae"))
          .groupBy(col("seg"), col("n_train"), col("l"), col("b"))
          .agg(sum(col("ae")).as("sae"))
          .select(
            col("seg"), col("n_train"),
            round(col("l"), 6).as("level"),
            round(col("b"), 6).as("trend"),
            round(col("sae").cast("double") / lit(H.toDouble), 6).as("mae"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql, ${holtStepSql("r.cnt - 28")},
        err AS MATERIALIZED (
          SELECT r.seg,
                 CAST(SUM(CAST(ABS(r.y -
                        (f.l + (r.rn - (r.cnt - 28)) * f.b))
                      AS DECIMAL(38,10))) AS DOUBLE) AS sae
          FROM ranked r JOIN fit f ON r.seg = f.seg
          WHERE r.rn > r.cnt - 28
          GROUP BY r.seg)
        SELECT nd.seg, nd.n_days - 28 AS n_train,
               ROUND(f.l, 6) AS level, ROUND(f.b, 6) AS trend,
               ROUND(e.sae / 28.0, 6) AS mae
        FROM nd JOIN fit f ON nd.seg = f.seg JOIN err e ON nd.seg = e.seg""")
    ),

    // ----------------------------------------------------------------
    // MAINTAINED FORECAST STATE — the maintained-index twin for
    // SEQUENTIAL state, the one state class the additive MV pattern
    // (q176/q193/q207) cannot cover: a Holt fold is not commutative,
    // but a left fold is CONTINUABLE — fold(s, a ++ b) =
    // fold(fold(s, a), b) — so the stored per-group (level, trend)
    // pair plus the day cursor IS the whole state. Four chronological
    // ingest batches each fold ONLY their own days, seeded from the
    // stored state; a nightly 100 TB refresh pays O(new days) per
    // group, never a history re-fold. Gated against the one-shot q208
    // SQL — the incremental ≡ recompute proof by left-fold identity.
    "q210_holt_incremental" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q210_wh_").toString
        try {
          val wh = new graft.etl.Warehouse(s, whRoot)
          val bySeg = Window.partitionBy("seg")
          val ranked = dailyRevenue(s, d)
            .withColumn("rn", row_number().over(bySeg.orderBy("day")))
            .withColumn("cnt", count(lit(1)).over(bySeg))
          for (bi <- 0 until 4) {
            // chronological quartiles per group — ingest order, the
            // only order a sequential state can absorb
            val batch = ranked
              .where(col("rn") > col("cnt") * bi / 4 &&
                col("rn") <= col("cnt") * (bi + 1) / 4)
              .groupBy(col("seg"))
              .agg(count(lit(1)).as("n_new"), expr(elemsExpr).as("elems"))
            wh.overwrite(mergeHoltState(wh, batch), "gold", "mv_holt_state")
          }
          holtStateReport(wh).localCheckpoint(true)
        } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql, ${holtStepSql("r.cnt")}
        SELECT nd.seg, nd.n_days,
               ROUND(f.l, 6) AS level, ROUND(f.b, 6) AS trend,
               ROUND(f.l + 1.0 * f.b, 6) AS fc_1,
               ROUND(f.l + 7.0 * f.b, 6) AS fc_7,
               ROUND(f.l + 28.0 * f.b, 6) AS fc_28
        FROM nd JOIN fit f ON nd.seg = f.seg""")
    ),

    // ----------------------------------------------------------------
    // STREAMING FORECAST MAINTENANCE — q210's nightly state refresh
    // made CONTINUOUS, completing the streaming/batch symmetry the
    // band index (q189/q202) and ANN postings (q187/q203) already
    // have: orders arrive as 3 real micro-batches (a file source over
    // mtime-ordered calendar-tercile slices, maxFilesPerTrigger=1) and
    // each batch's foreachBatch aggregates ITS OWN days and continues
    // the stored fold. Slices cut on DAY boundaries, so no day is ever
    // split across batches and per-group day order is preserved —
    // exactly the precondition under which the left-fold identity
    // makes 3 continued folds ≡ the one-shot recursion the oracle
    // runs. Per arrival the cost is O(batch) aggregation + an
    // O(groups) state merge; history is never re-read.
    "q212_stream_forecast_maintenance" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files.createTempDirectory("graft_q212_wh_").toString
          val wh = new graft.etl.Warehouse(s, whRoot)
          try {
            val stream = s.readStream
              .schema(orders(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(stageOrderSlices(s, d))
            val cust = customer(s, d)
            val q = stream.writeStream
              .foreachBatch {
                (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
                  val dailyB = batch.toDF()
                    .join(cust, col("o_custkey") === col("c_custkey"))
                    .groupBy(
                      col("c_mktsegment").as("seg"),
                      col("o_orderdate").cast("date").as("day"))
                    .agg(sum(col("o_totalprice").cast(dt)).as("rev"))
                    .select(col("seg"), col("day"),
                      col("rev").cast("double").as("y"))
                    .groupBy(col("seg"))
                    .agg(count(lit(1)).as("n_new"), expr(elemsExpr).as("elems"))
                  wh.overwrite(mergeHoltState(wh, dailyB), "gold", "mv_holt_state")
                  ()
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            holtStateReport(wh).localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql, ${holtStepSql("r.cnt")}
        SELECT nd.seg, nd.n_days,
               ROUND(f.l, 6) AS level, ROUND(f.b, 6) AS trend,
               ROUND(f.l + 1.0 * f.b, 6) AS fc_1,
               ROUND(f.l + 7.0 * f.b, 6) AS fc_7,
               ROUND(f.l + 28.0 * f.b, 6) AS fc_28
        FROM nd JOIN fit f ON nd.seg = f.seg""")
    ),

    // ----------------------------------------------------------------
    // CONFORMAL FORECAST INTERVAL — the q209 backtest's 28 calibration
    // residuals turned into a distribution-free interval: radius = the
    // 27th smallest |residual| (split-conformal at ⌈(n+1)·0.9⌉ = 27 of
    // n = 28, ≈90% coverage), band = fc ± radius for the first
    // out-of-sample step (h = 29 from the train fit). The radius is an
    // EXACT order statistic over 28 doubles that are bit-identical in
    // both engines (pinned residual arithmetic), so sorting and
    // indexing them is deterministic — no approximate quantile needed
    // at this grain, the calibration set is O(H) per group by
    // construction.
    "q211_forecast_interval" -> QueryDef(
      fn = (s, d) => {
        val bySeg = Window.partitionBy("seg")
        val ranked = dailyRevenue(s, d)
          .withColumn("rn", row_number().over(bySeg.orderBy("day")))
          .withColumn("cnt", count(lit(1)).over(bySeg))
        val fit = ranked.where(col("rn") <= col("cnt") - H)
          .groupBy(col("seg"))
          .agg(expr(elemsExpr).as("elems"))
          .withColumn("fit",
            expr(holtFold("slice(elems, 2, cardinality(elems) - 1)",
              "element_at(elems, 1)")))
          .select(col("seg"), col("fit.l").as("l"), col("fit.b").as("b"))
        ranked.where(col("rn") > col("cnt") - H)
          .join(broadcast(fit), Seq("seg"))
          .select(col("seg"), col("l"), col("b"),
            abs(col("y") -
              (col("l") + (col("rn") - (col("cnt") - H)) * col("b"))).as("ar"))
          .groupBy(col("seg"), col("l"), col("b"))
          .agg(element_at(sort_array(collect_list(col("ar"))), 27).as("radius"))
          .select(
            col("seg"), lit(H).as("n_cal"),
            round(col("radius"), 6).as("radius"),
            round(col("l") + lit(29.0) * col("b"), 6).as("fc_next"),
            round((col("l") + lit(29.0) * col("b")) - col("radius"), 6).as("lo"),
            round((col("l") + lit(29.0) * col("b")) + col("radius"), 6).as("hi"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $dailySql, ${holtStepSql("r.cnt - 28")},
        cal AS MATERIALIZED (
          SELECT r.seg, f.l, f.b,
                 list_sort(list(ABS(r.y -
                   (f.l + (r.rn - (r.cnt - 28)) * f.b))))[27] AS radius
          FROM ranked r JOIN fit f ON r.seg = f.seg
          WHERE r.rn > r.cnt - 28
          GROUP BY r.seg, f.l, f.b)
        SELECT seg, 28 AS n_cal,
               ROUND(radius, 6) AS radius,
               ROUND(l + 29.0 * b, 6) AS fc_next,
               ROUND((l + 29.0 * b) - radius, 6) AS lo,
               ROUND((l + 29.0 * b) + radius, 6) AS hi
        FROM cal""")
    )
  )
}
