package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVIVAL ANALYSIS — the Kaplan-Meier product-limit estimator
  * (Kaplan & Meier 1958) over customer lifetimes: the churn/retention
  * curve every subscription and repeat-purchase business reads, which
  * the reference's retention cohort mart (`load_to_olap.py` cohort
  * counts; our q102) only approximates by calendar buckets. KM
  * handles CENSORING correctly: customers still active at the end of
  * the observation window contribute to the at-risk denominators
  * without ever counting as churned.
  *
  * Scale contract (the q208 calendar-bound discipline): the corpus
  * collapses to customer grain in one aggregate, then to (segment,
  * duration-day) grain in a second — at 100 TB more customers mean
  * more rows per DURATION DAY, never more steps, so the per-segment
  * sequential product runs over a calendar-bounded array while the
  * scans pay the data size. At-risk counts are one descending
  * cumulative window over the day-grain frame.
  *
  * Determinism contract: everything is integer until the survival
  * product; each factor (1 − d/n) is an IEEE-exact division and the
  * product folds in duration order on both engines (Spark: one
  * `aggregate` lambda over the date-sorted array, emitting the
  * running product per step via array_append; DuckDB: a recursive
  * CTE threading the same product step by step — DuckDB 1.0's
  * ordered-list folds are unreliable, the ForecastQueries finding).
  */
object SurvivalQueries extends QueryModule {

  import Tables._

  /** Churn horizon: no order in the final 60 days ⇒ churn observed. */
  private val HorizonDays = 60

  /** (segment, duration)-grain life table: churn events d, censorings
    * c, at-risk n (descending cumulative), step index rn.
    */
  private def lifeTable(s: SparkSession, d: String): DataFrame = {
    val perCust = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("cust"), col("c_mktsegment").as("seg"))
      .agg(min(col("o_orderdate").cast("date")).as("f"),
        max(col("o_orderdate").cast("date")).as("l"))
    val horizon = perCust.agg(date_sub(max(col("l")), HorizonDays).as("cutoff"))
    val spans = perCust.crossJoin(broadcast(horizon))
      .select(col("seg"), datediff(col("l"), col("f")).as("dur"),
        when(col("l") <= col("cutoff"), 1).otherwise(0).as("event"))
    val byDay = spans.groupBy(col("seg"), col("dur"))
      .agg(sum(col("event")).as("d"),
        sum(lit(1) - col("event")).as("c"))
    val wRisk = Window.partitionBy(col("seg")).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wStep = Window.partitionBy(col("seg")).orderBy(col("dur").asc)
    byDay
      .withColumn("n", sum(col("d") + col("c")).over(wRisk))
      .withColumn("rn", row_number().over(wStep))
  }

  /** Shared life-table SQL (CTEs `lt` with seg, dur, d, c, n, rn). */
  private val lifeTableSql: String = s"""
        pc AS MATERIALIZED (
          SELECT o_custkey AS cust, c_mktsegment AS seg,
                 MIN(CAST(o_orderdate AS DATE)) AS f,
                 MAX(CAST(o_orderdate AS DATE)) AS l
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY o_custkey, c_mktsegment),
        hz AS MATERIALIZED (
          SELECT CAST(MAX(l) - INTERVAL $HorizonDays DAY AS DATE) AS cutoff FROM pc),
        sp AS MATERIALIZED (
          SELECT seg, DATEDIFF('day', f, l) AS dur,
                 CASE WHEN l <= hz.cutoff THEN 1 ELSE 0 END AS event
          FROM pc CROSS JOIN hz),
        bd AS MATERIALIZED (
          SELECT seg, dur, SUM(event) AS d, SUM(1 - event) AS c
          FROM sp GROUP BY seg, dur),
        lt AS MATERIALIZED (
          SELECT seg, dur, d, c,
                 SUM(d + c) OVER (PARTITION BY seg ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
                 ROW_NUMBER() OVER (PARTITION BY seg ORDER BY dur ASC) AS rn
          FROM bd)"""

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // KAPLAN-MEIER retention curve per market segment: S(t) =
    // Π_{s ≤ t} (1 − d_s / n_s) over churn-event durations, censored
    // customers leaving the at-risk set without an event. One row per
    // (segment, event duration) with the at-risk count, the events,
    // and the survival estimate — the curve a dashboard plots as-is.
    "q238_kaplan_meier" -> QueryDef(
      fn = (s, d) => {
        val lt = lifeTable(s, d)
        // per-segment duration-sorted fold emitting the RUNNING
        // product per step; censor-only steps multiply by exactly 1.0
        // (d = 0), so iterating every step keeps the fold uniform
        val foldTxt = """
          aggregate(
            elems,
            named_struct('s', CAST(1.0 AS DOUBLE),
              'out', CAST(array() AS ARRAY<STRUCT<dur: INT, n: BIGINT, d: BIGINT, s: DOUBLE>>)),
            (acc, e) -> named_struct(
              's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
              'out', array_append(acc.out, named_struct(
                'dur', e.dur, 'n', e.n, 'd', e.d,
                's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE))))))"""
        lt.groupBy(col("seg"))
          .agg(sort_array(collect_list(struct(
            col("rn"), col("dur"), col("d"), col("c"), col("n")))).as("elems"))
          .select(col("seg"), explode(expr(s"($foldTxt).out")).as("e"))
          .where(col("e.d") > 0)
          .select(col("seg"), col("e.dur").as("dur"),
            col("e.n").as("n_at_risk"), col("e.d").as("churned"),
            round(col("e.s"), 6).as("survival"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $lifeTableSql,
        km AS (
          SELECT seg, rn, dur, d, c, n,
                 1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) AS s
          FROM lt WHERE rn = 1
          UNION ALL
          SELECT lt.seg, lt.rn, lt.dur, lt.d, lt.c, lt.n,
                 km.s * (1.0 - CAST(lt.d AS DOUBLE) / CAST(lt.n AS DOUBLE))
          FROM km JOIN lt ON lt.seg = km.seg AND lt.rn = km.rn + 1)
        SELECT seg, CAST(dur AS INTEGER) AS dur,
               CAST(n AS BIGINT) AS n_at_risk, CAST(d AS BIGINT) AS churned,
               ROUND(s, 6) AS survival
        FROM km WHERE d > 0""")
    )
  )
}
