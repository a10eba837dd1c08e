package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Window-function coverage (SURVEY.md §2.5 W1-W5) over the events/orders
  * test tables, each with a DuckDB oracle.
  *
  * Every window partitions by a real key (user_id / event_type) — the
  * reference's *global* `Window.orderBy(id)` surrogate-key windows
  * (silver_to_gold.py:158) are deliberately NOT reproduced for fact-scale
  * data: a global window is a single-partition shuffle, which dies at
  * 100 TB. Dimension-scale key minting lives in [[Scd2.applyChanges]].
  *
  * Moving sums/averages keep the accumulator in DECIMAL inside the frame
  * and only divide at the end, so results hash-match DuckDB bit-for-bit.
  */
object WindowQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // RANK-KERNEL DISPATCH, HIGH-CARDINALITY ARM — the round-11
    // withGroupRanks contract made code: group cardinality is counted
    // first, and ABOVE the threshold the call dispatches to the plain
    // per-group window (parallelism across many groups is free; the
    // kernel's O(groups·B) offsets broadcast would OOM). This gates
    // that arm end-to-end against the DuckDB windows on the customer
    // key (150/1500 groups at the gated scales — the threshold is
    // pinned to 64 so BOTH corpora exercise the window arm
    // deterministically, and the spec separately proves both arms are
    // value-identical at the crossover).
    "q269_rank_dispatch_window" -> QueryDef(
      fn = (s, d) => {
        val src = orders(s, d).select(
          col("o_custkey").as("cust"), col("o_orderkey").as("ok"),
          col("o_totalprice").as("v"))
        RankSelect.withGroupRanks(src, "cust", "v",
            tieBreak = Seq("ok"), maxKernelGroups = 64L)
          .select(col("cust"), col("ok"), col("__rk_rn").as("rn"),
            col("__rk_rank").as("rnk"), col("__rk_ties").as("ties"),
            col("__rk_n").as("n"))
      },
      oracle = Some("""
        SELECT o_custkey AS cust, o_orderkey AS ok,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice) AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey, o_totalprice) AS BIGINT) AS ties,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
        FROM orders""")
    ),
    // ----------------------------------------------------------------
    // W1: row_number for per-key sequence numbers (transaction_sequence,
    // silver_to_gold.py:315). First 3 events per user.
    "q13_window_rownum" -> QueryDef(
      fn = (s, d) => {
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        events(s, d)
          .withColumn("seq", row_number().over(w))
          .where(col("seq") <= 3)
          .select(col("user_id"), col("seq"), col("event_id"), col("event_type"))
      },
      oracle = Some("""
        SELECT user_id, CAST(seq AS INTEGER) AS seq, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS seq
          FROM events
        ) WHERE seq <= 3""")
    ),

    // ----------------------------------------------------------------
    // W2: lead() next-event lookahead -> gap between consecutive events
    // (operational-hours sessionization, bronze_to_silver.py:193-201).
    // Gap computed in exact microseconds then one IEEE division.
    "q14_window_lead" -> QueryDef(
      fn = (s, d) => {
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        events(s, d)
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .where(col("next_ts").isNotNull)
          .withColumn(
            "gap_hours",
            (unix_micros(col("next_ts")) - unix_micros(col("ts"))) / 3.6e9
          )
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_gaps"),
            sum((unix_micros(col("next_ts")) - unix_micros(col("ts"))))
              .as("total_gap_micros")
          )
      },
      oracle = Some("""
        SELECT user_id, COUNT(*) AS n_gaps,
               CAST(SUM(gap_micros) AS BIGINT) AS total_gap_micros
        FROM (
          SELECT user_id,
                 DATE_DIFF('microsecond', ts,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS gap_micros
          FROM events
        ) WHERE gap_micros IS NOT NULL
        GROUP BY user_id""")
    ),

    // ----------------------------------------------------------------
    // W3: trailing 8-row moving average of daily totals per event_type
    // (update_ml_features.py:66-71 rowsBetween(-7,0)) + W5 trend class.
    "q15_window_moving_avg" -> QueryDef(
      fn = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast(DecimalType(28, 2))).as("daily_total"))
        val w = Window
          .partitionBy(col("event_type"))
          .orderBy(col("day"))
          .rowsBetween(-7, 0)
        daily
          .withColumn(
            "moving_avg",
            sum(col("daily_total")).over(w).cast("double") /
              count(col("daily_total")).over(w)
          )
          .withColumn("daily_total", col("daily_total").cast("double"))
          .withColumn(
            "trend",
            when(col("daily_total") > col("moving_avg"), "increasing")
              .when(col("daily_total") < col("moving_avg"), "decreasing")
              .otherwise("stable")
          )
      },
      oracle = Some("""
        SELECT event_type, day,
               CAST(daily_total AS DOUBLE) AS daily_total,
               CAST(SUM(daily_total) OVER w AS DOUBLE) / COUNT(daily_total) OVER w AS moving_avg,
               CASE WHEN CAST(daily_total AS DOUBLE) > CAST(SUM(daily_total) OVER w AS DOUBLE) / COUNT(daily_total) OVER w THEN 'increasing'
                    WHEN CAST(daily_total AS DOUBLE) < CAST(SUM(daily_total) OVER w AS DOUBLE) / COUNT(daily_total) OVER w THEN 'decreasing'
                    ELSE 'stable' END AS trend
        FROM (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 SUM(CAST(value AS DECIMAL(28,2))) AS daily_total
          FROM events GROUP BY event_type, CAST(ts AS DATE)
        )
        WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)""")
    ),

    // ----------------------------------------------------------------
    // W4: cumulative sum (running operational hours,
    // update_ml_features.py:190-200). Running decimal total per type.
    "q16_window_cumsum" -> QueryDef(
      fn = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(col("value").cast(DecimalType(28, 2))).as("daily_total"))
        val w = Window
          .partitionBy(col("event_type"))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        daily
          .withColumn("running_total", sum(col("daily_total")).over(w).cast("double"))
          .drop("daily_total")
      },
      oracle = Some("""
        SELECT event_type, day,
               CAST(SUM(daily_total) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 SUM(CAST(value AS DECIMAL(28,2))) AS daily_total
          FROM events GROUP BY event_type, CAST(ts AS DATE)
        )""")
    ),

    // ----------------------------------------------------------------
    // W6: date-RANGE frames — trailing 7/30 *calendar-day* sums over a
    // day-number ordering (update_ml_features.py:52-63's
    // sales_last_7_days / sales_last_30_days). A ROWS frame silently
    // miscounts across date gaps; RANGE over the day number is the
    // correct operator and a distinct physical frame type from
    // q15/q16's ROWS frames. Accumulators stay DECIMAL inside the
    // frame; cast to double at the end (oracle parity).
    "q54_window_range_frame" -> QueryDef(
      fn = (s, d) => {
        val daily = lineitem(s, d)
          .where(col("l_partkey") % 10 === 0)
          .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("ship_date"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("units"))
          .withColumn("day_num",
            datediff(col("ship_date"), to_date(lit("1970-01-01"))))
        val w7 = Window
          .partitionBy(col("l_partkey")).orderBy(col("day_num"))
          .rangeBetween(-6, 0)
        val w30 = Window
          .partitionBy(col("l_partkey")).orderBy(col("day_num"))
          .rangeBetween(-29, 0)
        daily
          .withColumn("units_7d", sum(col("units")).over(w7).cast("double"))
          .withColumn("units_30d", sum(col("units")).over(w30).cast("double"))
          .select(
            col("l_partkey"), col("ship_date"),
            col("units").cast("double").as("units_d"),
            col("units_7d"), col("units_30d"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_date,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS units,
                 CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day_num
          FROM lineitem WHERE l_partkey % 10 = 0
          GROUP BY l_partkey, CAST(l_shipdate AS DATE)
        )
        SELECT l_partkey, ship_date,
               CAST(units AS DOUBLE) AS units_d,
               CAST(SUM(units) OVER (PARTITION BY l_partkey ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS units_7d,
               CAST(SUM(units) OVER (PARTITION BY l_partkey ORDER BY day_num
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS units_30d
        FROM daily""")
    ),

    // ----------------------------------------------------------------
    // W7: rank-family windows — ntile quartiles, percent_rank,
    // cume_dist (the distributional stats a data-quality report puts on
    // every numeric column). Partitioned by return flag — never a
    // global ordering at fact scale — with a unique (units, orderkey)
    // sort so every rank is deterministic.
    "q55_window_rank_dist" -> QueryDef(
      fn = (s, d) => {
        val perOrder = lineitem(s, d)
          .where(col("l_orderkey") % 7 === 0)
          .groupBy(col("l_returnflag"), col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("units"))
        val w = Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("units"), col("l_orderkey"))
        perOrder.select(
          col("l_returnflag"), col("l_orderkey"),
          col("units").cast("double").as("units_d"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume_d"))
      },
      oracle = Some("""
        WITH per_order AS (
          SELECT l_returnflag, l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS units
          FROM lineitem WHERE l_orderkey % 7 = 0
          GROUP BY l_returnflag, l_orderkey)
        SELECT l_returnflag, l_orderkey,
               CAST(units AS DOUBLE) AS units_d,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume_d
        FROM per_order
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY units, l_orderkey)""")
    ),

    // ----------------------------------------------------------------
    // W8: first_value / last_value / nth_value with an explicit
    // whole-partition frame (the default RANGE ... CURRENT ROW frame
    // makes last_value return the current row — the classic trap; both
    // engines are given the same UNBOUNDED frame). Per user: first,
    // latest, and second event values by time.
    "q63_first_last_value" -> QueryDef(
      fn = (s, d) => {
        val ev = events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val wFull = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ev.select(
            col("user_id"), col("event_id"),
            first(col("value")).over(wFull).as("first_v"),
            last(col("value")).over(wFull).as("last_v"),
            nth_value(col("value"), 2).over(wFull).as("second_v"))
      },
      oracle = Some("""
        SELECT user_id, event_id,
               FIRST_VALUE(value) OVER w AS first_v,
               LAST_VALUE(value) OVER w AS last_v,
               NTH_VALUE(value, 2) OVER w AS second_v
        FROM (SELECT user_id, ts, event_id, value FROM events
              WHERE event_type = 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")
    ),

    // ----------------------------------------------------------------
    // Rolling z-score anomaly detection: each event scored against the
    // trailing 100 events of its type (frame EXCLUDES the current row,
    // so an outlier can't mask itself), flagged at |z| > 3 once >= 30
    // prior observations exist. Values are quantized ONCE by
    // floor(value * 1024) — floor is tie-free and exact in both
    // engines, unlike a decimal cast's rounding — so every moment sum
    // is pure int64 arithmetic (|vq| < 2^20, vq^2 < 2^40, x100 frame
    // < 2^47) regardless of how each engine orders its sliding-frame
    // aggregation, and z (scale-invariant, so computed on the
    // quantized values) derives deterministically from exact integers.
    "q76_anomaly_zscore" -> QueryDef(
      fn = (s, d) => {
        val w = Window
          .partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-100, -1)
        events(s, d)
          .select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .withColumn("vq", floor(col("value") * 1024.0))
          .withColumn("n", count(col("vq")).over(w))
          .withColumn("s1", sum(col("vq")).over(w))
          .withColumn("s2", sum(col("vq") * col("vq")).over(w))
          .where(col("n") >= 30)
          .withColumn("mean", col("s1").cast("double") / col("n"))
          .withColumn("variance",
            col("s2").cast("double") / col("n") - col("mean") * col("mean"))
          .where(col("variance") > 0)
          .withColumn("z", (col("vq") - col("mean")) / sqrt(col("variance")))
          .where(abs(col("z")) > 3)
          .select(col("event_id"), col("event_type"), col("value"), col("z"))
      },
      oracle = Some("""
        WITH scored AS (
          SELECT event_id, event_type, value,
                 CAST(floor(value * 1024.0) AS BIGINT) AS vq,
                 COUNT(*) OVER w AS n,
                 CAST(SUM(CAST(floor(value * 1024.0) AS BIGINT)) OVER w AS BIGINT) AS s1,
                 CAST(SUM(CAST(floor(value * 1024.0) AS BIGINT)
                        * CAST(floor(value * 1024.0) AS BIGINT)) OVER w AS BIGINT) AS s2
          FROM events
          WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
        m AS (
          SELECT *, CAST(s1 AS DOUBLE) / n AS mean,
                 CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS variance
          FROM scored WHERE n >= 30)
        SELECT event_id, event_type, value,
               (vq - mean) / sqrt(variance) AS z
        FROM m
        WHERE variance > 0 AND abs((vq - mean) / sqrt(variance)) > 3""")
    ),

    // ----------------------------------------------------------------
    // EWMA SMOOTHING — exponentially-weighted moving average per user,
    // the standard recency-weighted smoother (monitoring, per-entity
    // rate estimation). Decay is fixed at 1/2 and the tail truncated at
    // 10 terms, which makes the computation CROSS-ENGINE EXACT where a
    // general α would not be: the weights 2^9..2^0 are integers, each
    // lagged value accumulates in DECIMAL, and the one double division
    // at the end is IEEE-exact — no pow(), no float summation-order
    // drift (the same determinism discipline as q85's rational-form
    // BM25). Truncation error vs the infinite EWMA is ≤2^-10 of the
    // value scale — below any monitoring signal's noise floor.
    //
    // Shape: ONE partitioned-window pass (10 LAGs share a single
    // (user, ts) sort), per-user sequential / parallel across users —
    // identical scale behavior to the q15/q16 trailing family; state
    // per row is 10 lags regardless of history length, which is the
    // point of EWMA-with-truncation at 100 TB.
    "q158_ewma" -> QueryDef(
      fn = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val K = 10
        val terms = (0 until K).map { k =>
          val weight = 1L << (K - 1 - k)
          val v = if (k == 0) col("value") else lag(col("value"), k).over(w)
          (coalesce(v.cast(DecimalType(28, 2)) * lit(weight), lit(0).cast(DecimalType(28, 2))),
            when(v.isNotNull, lit(weight)).otherwise(lit(0L)))
        }
        val num   = terms.map(_._1).reduce(_ + _)
        val denom = terms.map(_._2).reduce(_ + _)
        events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("ewma", num.cast("double") / denom.cast("double"))
          .select(col("user_id"), col("event_id"), col("ewma"))
      },
      oracle = Some {
        val K = 10
        val terms = (0 until K).map { k =>
          val weight = 1L << (K - 1 - k)
          val v = if (k == 0) "value"
                  else s"LAG(value, $k) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"
          (s"COALESCE(CAST($v AS DECIMAL(28,2)) * $weight, CAST(0 AS DECIMAL(28,2)))",
            s"CASE WHEN $v IS NOT NULL THEN $weight ELSE 0 END")
        }
        val num   = terms.map(_._1).mkString(" + ")
        val denom = terms.map(_._2).mkString(" + ")
        s"""
        SELECT user_id, event_id,
               CAST($num AS DOUBLE) / CAST($denom AS DOUBLE) AS ewma
        FROM events"""
      }
    )
  )
}
