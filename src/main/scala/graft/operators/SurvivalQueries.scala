package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVIVAL ANALYSIS — the Kaplan-Meier product-limit estimator
  * (Kaplan & Meier 1958) over customer lifetimes, plus the two
  * readouts every retention team asks for next: a log-rank test
  * (Mantel 1966) for "are these two segments' churn curves actually
  * different?", and a rank-based AUC for "does this score separate
  * churners from survivors?". The reference's retention cohort mart
  * (`load_to_olap.py` cohort counts; our q102) only approximates the
  * curve by calendar buckets. KM handles CENSORING correctly:
  * customers still active at the end of the observation window
  * contribute to the at-risk denominators without ever counting as
  * churned.
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
  * ordered-list REDUCTIONS are unreliable, the ForecastQueries
  * finding; its ordered list SUM is fine, the q167 precedent, which
  * is what the log-rank sums use).
  */
object SurvivalQueries extends QueryModule {

  import Tables._

  /** Churn horizon: no order in the final 60 days ⇒ churn observed. */
  private val HorizonDays = 60

  /** Fixed Newton-Raphson step count for the q278 Cox fit — the q263
    * IRLS discipline: deterministic and CTE-mirrorable; three steps
    * reach round-6 β stability on every gated corpus.
    */
  private val CoxSteps = 3

  /** Customer-grain spans: one row per (cust, seg) with first/last
    * order date — THE corpus-contracting aggregate every query here
    * hangs off. `withSpend` adds the exact DECIMAL lifetime spend
    * (only q241 pays for it; the others keep the aggregate lean).
    */
  private def custSpans(s: SparkSession, d: String, withSpend: Boolean = false): DataFrame = {
    val base = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("cust"), col("c_mktsegment").as("seg"))
    val aggs = Seq(
      min(col("o_orderdate").cast("date")).as("f"),
      max(col("o_orderdate").cast("date")).as("l")) ++
      (if (withSpend)
        Seq(sum(col("o_totalprice").cast(DecimalType(38, 4))).as("spend"))
      else Nil)
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** spans → + (dur, event): churn observed iff the last order is at
    * least HorizonDays before the corpus's latest activity. The
    * cutoff is a 1-row broadcast — never a shuffle.
    */
  private def withEvent(spans: DataFrame): DataFrame = {
    val horizon = spans.agg(date_sub(max(col("l")), HorizonDays).as("cutoff"))
    spans.crossJoin(broadcast(horizon))
      .withColumn("dur", datediff(col("l"), col("f")))
      .withColumn("event", when(col("l") <= col("cutoff"), 1).otherwise(0))
  }

  /** (seg, duration-day)-grain event counts: churn events d,
    * censorings c. Calendar-bounded from here on.
    */
  private def byDay(ev: DataFrame): DataFrame =
    ev.groupBy(col("seg"), col("dur"))
      .agg(sum(col("event")).as("d"), sum(lit(1) - col("event")).as("c"))

  /** + at-risk n (descending cumulative) and step index rn. */
  private def lifeTable(bd: DataFrame): DataFrame = {
    val wRisk = Window.partitionBy(col("seg")).orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wStep = Window.partitionBy(col("seg")).orderBy(col("dur").asc)
    bd.withColumn("n", sum(col("d") + col("c")).over(wRisk))
      .withColumn("rn", row_number().over(wStep))
  }

  /** KM survival curve from a life table: per-segment duration-sorted
    * fold emitting the RUNNING product per step; censor-only steps
    * multiply by exactly 1.0 (d = 0), so iterating every step keeps
    * the fold uniform.
    */
  private def kmCurve(lt: DataFrame): DataFrame = {
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
  }

  /** Shared span/life-table SQL (CTEs `pc/hz/sp/bd/lt`). `pcExtra`
    * threads extra per-customer aggregates (q241's spend) through.
    */
  private def lifeTableSql(pcExtra: String = "", spExtra: String = ""): String = s"""
        pc AS MATERIALIZED (
          SELECT o_custkey AS cust, c_mktsegment AS seg,
                 MIN(CAST(o_orderdate AS DATE)) AS f,
                 MAX(CAST(o_orderdate AS DATE)) AS l$pcExtra
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY o_custkey, c_mktsegment),
        hz AS MATERIALIZED (
          SELECT CAST(MAX(l) - INTERVAL $HorizonDays DAY AS DATE) AS cutoff FROM pc),
        sp AS MATERIALIZED (
          SELECT seg, DATEDIFF('day', f, l) AS dur,
                 CASE WHEN l <= hz.cutoff THEN 1 ELSE 0 END AS event$spExtra
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

  /** The KM recursion + final projection — shared by q238 (one-shot)
    * and q240 (maintained state), which are gated against the SAME
    * oracle: incremental ≡ recompute.
    */
  private val kmSql: String = s"""
        WITH RECURSIVE ${lifeTableSql()},
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
        FROM km WHERE d > 0"""

  /** Stage orders as 3 mtime-ordered slice files cut on CALENDAR
    * terciles (the q212 arrival model). Day-aligned boundaries are a
    * nicety here, not a precondition: unlike the Holt fold, the
    * min/max span merge is fully commutative, so ANY arrival order
    * yields the same state.
    */
  private def stageOrderSlices(s: SparkSession, d: String): String =
    graft.sources.SliceStager.stage(
      "graft_km_order_slices",
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

  /** Merge one batch of orders into the stored customer-span state:
    * collapse the batch to customer grain, union with the stored
    * spans, re-aggregate min/max. O(batch) + O(customers) per call.
    */
  private def mergeSpanState(wh: graft.etl.Warehouse, batch: DataFrame, cust: DataFrame): Unit = {
    val batchSpans = batch
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("cust"), col("c_mktsegment").as("seg"))
      .agg(min(col("o_orderdate").cast("date")).as("f"),
        max(col("o_orderdate").cast("date")).as("l"))
    val merged = wh.loadOr("gold", "mv_cust_spans", batchSpans.schema)
      .unionByName(batchSpans)
      .groupBy(col("cust"), col("seg"))
      .agg(min(col("f")).as("f"), max(col("l")).as("l"))
      .localCheckpoint(true)
    wh.overwrite(merged, "gold", "mv_cust_spans")
  }

  override def queries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // KAPLAN-MEIER retention curve per market segment: S(t) =
    // Π_{s ≤ t} (1 − d_s / n_s) over churn-event durations, censored
    // customers leaving the at-risk set without an event. One row per
    // (segment, event duration) with the at-risk count, the events,
    // and the survival estimate — the curve a dashboard plots as-is.
    "q238_kaplan_meier" -> QueryDef(
      fn = (s, d) => kmCurve(lifeTable(byDay(withEvent(custSpans(s, d))))),
      oracle = Some(kmSql)
    ),

    // ----------------------------------------------------------------
    // LOG-RANK TEST (Mantel 1966) for every segment PAIR: is the
    // difference between two KM curves signal or noise? At each
    // combined event duration t the observed events in segment A are
    // compared with the hypergeometric expectation d·n1/N under
    // "curves identical"; χ² = (O−E)²/V. All inputs stay integer to
    // the division; the E and V sums fold duration-ascending on both
    // engines (Spark: aggregate over sort_array; DuckDB: ordered
    // list_sum — the q167 pinned-sum pattern), so every double is
    // bit-identical cross-engine. The pair grid is segments² (tiny,
    // broadcast); the per-pair frame is the union of two
    // calendar-bounded life tables — never customer grain.
    "q239_logrank" -> QueryDef(
      fn = (s, d) => {
        val bd = byDay(withEvent(custSpans(s, d)))
        val segs = bd.select(col("seg")).distinct()
        val pairs = broadcast(segs.select(col("seg").as("sa")))
          .join(broadcast(segs.select(col("seg").as("sb"))), col("sa") < col("sb"))
        val sideA = bd.join(broadcast(pairs), col("seg") === col("sa"))
          .select(col("sa"), col("sb"), col("dur"),
            col("d").as("d1"), col("c").as("c1"),
            lit(0L).as("d2"), lit(0L).as("c2"))
        val sideB = bd.join(broadcast(pairs), col("seg") === col("sb"))
          .select(col("sa"), col("sb"), col("dur"),
            lit(0L).as("d1"), lit(0L).as("c1"),
            col("d").as("d2"), col("c").as("c2"))
        // zero-filled union grid: the descending cumsum then yields
        // each side's at-risk count at EVERY combined duration
        val grid = sideA.unionByName(sideB)
          .groupBy(col("sa"), col("sb"), col("dur"))
          .agg(sum(col("d1")).as("d1"), sum(col("c1")).as("c1"),
            sum(col("d2")).as("d2"), sum(col("c2")).as("c2"))
        val wRisk = Window.partitionBy(col("sa"), col("sb"))
          .orderBy(col("dur").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = grid
          .withColumn("n1", sum(col("d1") + col("c1")).over(wRisk))
          .withColumn("n2", sum(col("d2") + col("c2")).over(wRisk))
          .where(col("d1") + col("d2") > 0)
          .withColumn("dd", (col("d1") + col("d2")).cast("double"))
          .withColumn("n1d", col("n1").cast("double"))
          .withColumn("n2d", col("n2").cast("double"))
          .withColumn("nd", (col("n1") + col("n2")).cast("double"))
        // pinned parenthesization, mirrored verbatim in the oracle
        val tm = ev
          .withColumn("e_term", col("dd") * col("n1d") / col("nd"))
          .withColumn("v_term",
            when(col("n1") + col("n2") > 1,
              col("dd") * (col("n1d") / col("nd")) * (col("n2d") / col("nd")) *
                ((col("nd") - col("dd")) / (col("nd") - lit(1.0))))
              .otherwise(lit(0.0)))
        def orderedSum(term: String) = expr(s"""
          aggregate(
            sort_array(collect_list(struct(dur, $term))),
            CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.$term)""")
        val ag = tm.groupBy(col("sa"), col("sb")).agg(
          sum(col("d1")).as("o1"),
          orderedSum("e_term").as("e1"),
          orderedSum("v_term").as("v"))
        ag.select(col("sa").as("seg_a"), col("sb").as("seg_b"),
          col("o1").as("events_a"), round(col("e1"), 6).as("expected_a"),
          round(
            when(col("v") > 0,
              (col("o1").cast("double") - col("e1")) *
                (col("o1").cast("double") - col("e1")) / col("v"))
              .otherwise(lit(0.0)), 6).as("chi2"))
      },
      oracle = Some(s"""
        WITH ${lifeTableSql()},
        segs AS (SELECT DISTINCT seg FROM bd),
        pr AS (SELECT a.seg AS sa, b.seg AS sb FROM segs a JOIN segs b ON a.seg < b.seg),
        grid AS MATERIALIZED (
          SELECT sa, sb, dur,
                 SUM(d1) AS d1, SUM(c1) AS c1, SUM(d2) AS d2, SUM(c2) AS c2
          FROM (
            SELECT pr.sa, pr.sb, bd.dur, bd.d AS d1, bd.c AS c1,
                   0 AS d2, 0 AS c2
            FROM bd JOIN pr ON bd.seg = pr.sa
            UNION ALL
            SELECT pr.sa, pr.sb, bd.dur, 0, 0, bd.d, bd.c
            FROM bd JOIN pr ON bd.seg = pr.sb) u
          GROUP BY sa, sb, dur),
        ar AS MATERIALIZED (
          SELECT sa, sb, dur, d1, d2,
                 SUM(d1 + c1) OVER (PARTITION BY sa, sb ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
                 SUM(d2 + c2) OVER (PARTITION BY sa, sb ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n2
          FROM grid),
        ev AS MATERIALIZED (
          SELECT sa, sb, dur, d1, n1, n2,
                 CAST(d1 + d2 AS DOUBLE) AS dd,
                 CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
                 CAST(n1 + n2 AS DOUBLE) AS nd
          FROM ar WHERE d1 + d2 > 0),
        tm AS MATERIALIZED (
          SELECT sa, sb, dur, d1,
                 dd * n1d / nd AS e_term,
                 CASE WHEN n1 + n2 > 1 THEN
                   dd * (n1d / nd) * (n2d / nd) * ((nd - dd) / (nd - 1.0))
                 ELSE 0.0 END AS v_term
          FROM ev),
        ag AS MATERIALIZED (
          SELECT sa, sb, CAST(SUM(d1) AS BIGINT) AS o1,
                 list_sum(list_transform(list(e_term ORDER BY dur), x -> x)) AS e1,
                 list_sum(list_transform(list(v_term ORDER BY dur), x -> x)) AS v
          FROM tm GROUP BY sa, sb)
        SELECT sa AS seg_a, sb AS seg_b, o1 AS events_a,
               ROUND(e1, 6) AS expected_a,
               ROUND(CASE WHEN v > 0 THEN
                 (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v
               ELSE 0.0 END, 6) AS chi2
        FROM ag""")
    ),

    // ----------------------------------------------------------------
    // MAINTAINED CUSTOMER-SPAN STATE — the KM life table's upstream
    // state is a (min first-order, max last-order) pair per customer,
    // a SEMILATTICE merge: min/max absorb new orders without ever
    // re-reading history. Three chronological day-tercile ingest
    // batches each collapse to customer grain and merge into the
    // stored span table (O(batch) + O(customers) per refresh); the
    // curve recomputes from the merged state — which is calendar-
    // bounded work. Gated against the SAME oracle as q238:
    // incremental ≡ recompute, by min/max associativity.
    "q240_km_maintained" -> QueryDef(
      fn = (s, d) => {
        val whRoot = java.nio.file.Files.createTempDirectory("graft_q240_wh_").toString
        val wh = new graft.etl.Warehouse(s, whRoot)
        try {
          val days = orders(s, d)
            .select(col("o_orderdate").cast("date").as("day")).distinct()
            .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
            .withColumn("cnt", count(lit(1)).over(
              Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          for (bi <- 0 until 3) {
            val slice = orders(s, d)
              .join(broadcast(days.where(
                col("rn") > col("cnt") * bi / 3 &&
                  col("rn") <= col("cnt") * (bi + 1) / 3)),
                col("o_orderdate").cast("date") === col("day"))
            mergeSpanState(wh, slice, customer(s, d))
          }
          kmCurve(lifeTable(byDay(withEvent(
            wh.load("gold", "mv_cust_spans"))))).localCheckpoint(true)
        } finally {
          wh.dropCatalogDb()
          graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
        }
      },
      oracle = Some(kmSql)
    ),

    // ----------------------------------------------------------------
    // STREAMING SPAN MAINTENANCE — q240's nightly refresh made
    // CONTINUOUS, completing the streaming/batch symmetry every other
    // maintained state class already has (bands q189/q202, postings
    // q187/q203, forecast q210/q212, centroids q229/q231): orders
    // arrive as 3 real micro-batches (file source over mtime-ordered
    // calendar-tercile slices, maxFilesPerTrigger=1) and each batch's
    // foreachBatch merges its customer-grain spans into the stored
    // state. min/max is commutative AND idempotent-per-order, so no
    // arrival-order precondition exists at all — the easiest state
    // class to stream. Gated against the SAME oracle as q238.
    "q242_stream_km_maintenance" -> QueryDef(
      fn = (s, d) => {
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val whRoot = java.nio.file.Files.createTempDirectory("graft_q242_wh_").toString
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
                  mergeSpanState(wh, batch.toDF(), cust)
              }
              .start()
            try q.processAllAvailable()
            finally q.stop()
            kmCurve(lifeTable(byDay(withEvent(
              wh.load("gold", "mv_cust_spans"))))).localCheckpoint(true)
          } finally {
            wh.dropCatalogDb()
            graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
          }
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      oracle = Some(kmSql)
    ),

    // ----------------------------------------------------------------
    // GREENWOOD CONFIDENCE BAND — q238's curve with the error bars a
    // statistician demands before acting on it: Greenwood's variance
    // estimate Var[S(t)] = S(t)² · Σ_{s≤t} d/(n(n−d)) and the plain
    // 95% band S ± 1.96·SE. Every operation is IEEE-exact (+, *, /,
    // sqrt — no libm), so the band gates bit-identically: the fold
    // threads (s, g) where g is the running Greenwood sum, and the
    // oracle's recursive CTE threads the same two columns. Steps with
    // d = n (everyone at risk dies) would divide by zero in g; the
    // standard convention (variance undefined, band collapses to the
    // point) is mirrored by carrying g = NULL from that step on —
    // identical NULL semantics both engines.
    "q252_km_greenwood" -> QueryDef(
      fn = (s, d) => {
        val lt = lifeTable(byDay(withEvent(custSpans(s, d))))
        val foldTxt = """
          aggregate(
            elems,
            named_struct('s', CAST(1.0 AS DOUBLE), 'g', CAST(0.0 AS DOUBLE),
              'out', CAST(array() AS ARRAY<STRUCT<dur: INT, d: BIGINT, s: DOUBLE, g: DOUBLE>>)),
            (acc, e) -> named_struct(
              's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
              'g', acc.g + IF(e.n > e.d, CAST(e.d AS DOUBLE) /
                (CAST(e.n AS DOUBLE) * CAST(e.n - e.d AS DOUBLE)),
                CAST(NULL AS DOUBLE)),
              'out', array_append(acc.out, named_struct(
                'dur', e.dur, 'd', e.d,
                's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
                'g', acc.g + IF(e.n > e.d, CAST(e.d AS DOUBLE) /
                  (CAST(e.n AS DOUBLE) * CAST(e.n - e.d AS DOUBLE)),
                  CAST(NULL AS DOUBLE))))))"""
        lt.groupBy(col("seg"))
          .agg(sort_array(collect_list(struct(
            col("rn"), col("dur"), col("d"), col("c"), col("n")))).as("elems"))
          .select(col("seg"), explode(expr(s"($foldTxt).out")).as("e"))
          .where(col("e.d") > 0)
          .select(col("seg"), col("e.dur").as("dur"),
            round(col("e.s"), 6).as("survival"),
            round(col("e.s") - lit(1.96) * sqrt(col("e.s") * col("e.s") * col("e.g")), 6).as("lo95"),
            round(col("e.s") + lit(1.96) * sqrt(col("e.s") * col("e.s") * col("e.g")), 6).as("hi95"))
      },
      oracle = Some(s"""
        WITH RECURSIVE ${lifeTableSql()},
        km AS (
          SELECT seg, rn, dur, d, n,
                 1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) AS s,
                 0.0 + CASE WHEN n > d THEN CAST(d AS DOUBLE) /
                   (CAST(n AS DOUBLE) * CAST(n - d AS DOUBLE))
                   ELSE CAST(NULL AS DOUBLE) END AS g
          FROM lt WHERE rn = 1
          UNION ALL
          SELECT lt.seg, lt.rn, lt.dur, lt.d, lt.n,
                 km.s * (1.0 - CAST(lt.d AS DOUBLE) / CAST(lt.n AS DOUBLE)),
                 km.g + CASE WHEN lt.n > lt.d THEN CAST(lt.d AS DOUBLE) /
                   (CAST(lt.n AS DOUBLE) * CAST(lt.n - lt.d AS DOUBLE))
                   ELSE CAST(NULL AS DOUBLE) END
          FROM km JOIN lt ON lt.seg = km.seg AND lt.rn = km.rn + 1)
        SELECT seg, CAST(dur AS INTEGER) AS dur, ROUND(s, 6) AS survival,
               ROUND(s - 1.96 * SQRT(s * s * g), 6) AS lo95,
               ROUND(s + 1.96 * SQRT(s * s * g), 6) AS hi95
        FROM km WHERE d > 0""")
    ),

    // ----------------------------------------------------------------
    // SURVIVAL QUARTILE LIFETIMES — the KM curve read as the three
    // numbers a capacity planner quotes: the durations at which
    // survival first reaches 0.75 / 0.50 / 0.25 (upper-quartile,
    // MEDIAN, and lower-quartile customer lifetime) per segment.
    // Derived from the same fold as q238; the crossing test compares
    // bit-identical doubles, so MIN(dur | s ≤ q) gates exactly. A
    // curve that never crosses a threshold (heavily censored segment)
    // reports NULL — the honest answer, mirrored in the oracle.
    "q254_km_quartiles" -> QueryDef(
      fn = (s, d) => {
        val lt = lifeTable(byDay(withEvent(custSpans(s, d))))
        val foldTxt = """
          aggregate(
            elems,
            named_struct('s', CAST(1.0 AS DOUBLE),
              'out', CAST(array() AS ARRAY<STRUCT<dur: INT, s: DOUBLE>>)),
            (acc, e) -> named_struct(
              's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
              'out', array_append(acc.out, named_struct(
                'dur', e.dur,
                's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE))))))"""
        lt.groupBy(col("seg"))
          .agg(sort_array(collect_list(struct(
            col("rn"), col("dur"), col("d"), col("c"), col("n")))).as("elems"))
          .select(col("seg"), explode(expr(s"($foldTxt).out")).as("e"))
          .groupBy(col("seg"))
          .agg(
            min(when(col("e.s") <= 0.75, col("e.dur"))).as("q1_days"),
            min(when(col("e.s") <= 0.5, col("e.dur"))).as("median_days"),
            min(when(col("e.s") <= 0.25, col("e.dur"))).as("q3_days"))
      },
      oracle = Some(s"""
        WITH RECURSIVE ${lifeTableSql()},
        km AS (
          SELECT seg, rn, dur,
                 1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) AS s
          FROM lt WHERE rn = 1
          UNION ALL
          SELECT lt.seg, lt.rn, lt.dur,
                 km.s * (1.0 - CAST(lt.d AS DOUBLE) / CAST(lt.n AS DOUBLE))
          FROM km JOIN lt ON lt.seg = km.seg AND lt.rn = km.rn + 1)
        SELECT seg,
               CAST(MIN(CASE WHEN s <= 0.75 THEN dur END) AS INTEGER) AS q1_days,
               CAST(MIN(CASE WHEN s <= 0.5  THEN dur END) AS INTEGER) AS median_days,
               CAST(MIN(CASE WHEN s <= 0.25 THEN dur END) AS INTEGER) AS q3_days
        FROM km GROUP BY seg""")
    ),

    // ----------------------------------------------------------------
    // RESTRICTED MEAN SURVIVAL TIME (RMST, τ = 365) — the KM curve
    // reduced to the number a finance model consumes: expected
    // retained days within the first year, per segment — the area
    // under the survival curve up to τ. Computed inside the SAME
    // duration-ordered fold shape as q238, threading (s, prev, area):
    // each step adds s_before · (min(dur, τ) − min(prev, τ)) — one
    // multiply and one exact integer-difference cast per step — and
    // the finish adds the flat tail s_last · (τ − min(last, τ)).
    // Censor-only steps split a constant-s segment into two equal-s
    // pieces, so iterating every life-table row is exact. The oracle
    // threads the identical arithmetic through the recursive CTE.
    "q250_rmst" -> QueryDef(
      fn = (s, d) => {
        val lt = lifeTable(byDay(withEvent(custSpans(s, d))))
        val foldTxt = """
          aggregate(
            elems,
            named_struct('s', CAST(1.0 AS DOUBLE), 'p', 0,
              'r', CAST(0.0 AS DOUBLE)),
            (acc, e) -> named_struct(
              's', acc.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE)),
              'p', e.dur,
              'r', acc.r + acc.s * CAST(least(e.dur, 365) - least(acc.p, 365) AS DOUBLE)),
            acc -> acc.r + acc.s * CAST(365 - least(acc.p, 365) AS DOUBLE))"""
        lt.groupBy(col("seg"))
          .agg(sort_array(collect_list(struct(
            col("rn"), col("dur"), col("d"), col("c"), col("n")))).as("elems"))
          .select(col("seg"), round(expr(foldTxt), 6).as("rmst_days"))
      },
      oracle = Some(s"""
        WITH RECURSIVE ${lifeTableSql()},
        km AS (
          SELECT seg, rn, dur, n, d,
                 1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) AS s,
                 0.0 + 1.0 * CAST(LEAST(dur, 365) - 0 AS DOUBLE) AS r
          FROM lt WHERE rn = 1
          UNION ALL
          SELECT lt.seg, lt.rn, lt.dur, lt.n, lt.d,
                 km.s * (1.0 - CAST(lt.d AS DOUBLE) / CAST(lt.n AS DOUBLE)),
                 km.r + km.s * CAST(LEAST(lt.dur, 365) - LEAST(km.dur, 365) AS DOUBLE)
          FROM km JOIN lt ON lt.seg = km.seg AND lt.rn = km.rn + 1),
        ms AS (SELECT seg, MAX(rn) AS mr FROM lt GROUP BY seg)
        SELECT km.seg,
               ROUND(km.r + km.s * CAST(365 - LEAST(km.dur, 365) AS DOUBLE), 6)
                 AS rmst_days
        FROM km JOIN ms ON ms.seg = km.seg AND km.rn = ms.mr""")
    ),

    // ----------------------------------------------------------------
    // ISOTONIC CALIBRATION (PAVA closed form) — q241 says spend RANKS
    // churn risk; this turns the ranking into a CALIBRATED curve:
    // retention rate as a non-decreasing function of spend decile,
    // the monotone regression every score-calibration pipeline runs
    // (Zadrozny & Elkan 2002). Instead of the sequential
    // pool-adjacent-violators sweep, the fit uses its max-min closed
    // form  iso(k) = max_{i≤k} min_{j≥k} mean(i..j)  over the
    // DECILE-grain frame: 10 rows per segment → 55 intervals → a
    // decile-grid join, all O(segments × 100) after the one
    // customer-grain pass. Interval means are single IEEE-exact
    // divisions of BIGINT prefix-sum differences; min/max need no
    // order pinning at all.
    "q245_isotonic_calibration" -> QueryDef(
      fn = (s, d) => {
        val ev = withEvent(custSpans(s, d, withSpend = true))
          .select(col("seg"), col("cust"), col("spend"), col("event"))
        // (spend, cust) is a total order -> the row_number (and hence the
        // decile) is deterministic. The global row_number comes from the
        // RankSelect bucket kernel (per-task input ~n/1024, never a whole
        // segment in one task); the decile is then NTILE(10) arithmetic —
        // the first (n % 10) buckets take ceil(n/10) rows, the SQL-
        // standard split both engines implement — applied to (rn, n).
        val rk = RankSelect.withGroupRanks(ev, "seg", "spend", tieBreak = Seq("cust"))
        val dec = rk.withColumn("dd", expr(RankSelect.ntileSql(10)))
          .groupBy(col("seg"), col("dd"))
          .agg(count(lit(1)).as("cnt"), sum(lit(1) - col("event")).as("ret"))
        // decile-grain prefix sums via an array fold over the ≤10-entry
        // per-segment frame — no seg-partitioned window anywhere
        val pf = dec
          .groupBy(col("seg"))
          .agg(sort_array(collect_list(
            struct(col("dd"), col("cnt"), col("ret")))).as("a"))
          .select(col("seg"), explode(expr("""
            aggregate(a,
              named_struct('cc', 0L, 'cr', 0L,
                'out', CAST(array() AS ARRAY<STRUCT<
                  dd: INT, cnt: BIGINT, ret: BIGINT, ccnt: BIGINT, cret: BIGINT>>)),
              (acc, x) -> named_struct(
                'cc', acc.cc + x.cnt, 'cr', acc.cr + x.ret,
                'out', array_append(acc.out, named_struct(
                  'dd', x.dd, 'cnt', x.cnt, 'ret', x.ret,
                  'ccnt', acc.cc + x.cnt, 'cret', acc.cr + x.ret)))).out""")).as("e"))
          .select(col("seg"), col("e.dd").as("dd"), col("e.cnt").as("cnt"),
            col("e.ret").as("ret"), col("e.ccnt").as("ccnt"), col("e.cret").as("cret"))
        val iv = pf.as("a").join(pf.as("b"),
          col("a.seg") === col("b.seg") && col("a.dd") <= col("b.dd"))
          .select(col("a.seg").as("seg"), col("a.dd").as("i"), col("b.dd").as("j"),
            (col("b.cret") - (col("a.cret") - col("a.ret"))).as("sr"),
            (col("b.ccnt") - (col("a.ccnt") - col("a.cnt"))).as("sc"))
          .withColumn("m", col("sr").cast("double") / col("sc").cast("double"))
        val fit = iv.join(pf.select(col("seg").as("ks"), col("dd").as("k")),
          col("seg") === col("ks") && col("i") <= col("k") && col("k") <= col("j"))
          .groupBy(col("seg"), col("k"), col("i")).agg(min(col("m")).as("mn"))
          .groupBy(col("seg"), col("k")).agg(max(col("mn")).as("iso"))
        dec.join(fit, col("dd") === col("k") && dec("seg") === fit("seg"))
          .select(dec("seg"), col("dd").as("decile"),
            col("cnt").as("n_cust"), col("ret").as("retained"),
            round(col("ret").cast("double") / col("cnt").cast("double"), 6).as("rate_raw"),
            round(col("iso"), 6).as("rate_iso"))
      },
      oracle = Some(s"""
        WITH ${lifeTableSql(
          pcExtra = ",\n                 SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS spend",
          spExtra = ", spend, cust")},
        dc AS MATERIALIZED (
          SELECT seg, NTILE(10) OVER (PARTITION BY seg ORDER BY spend, cust) AS dd,
                 event
          FROM sp),
        dec AS MATERIALIZED (
          SELECT seg, dd, CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(1 - event) AS BIGINT) AS ret
          FROM dc GROUP BY seg, dd),
        pf AS MATERIALIZED (
          SELECT seg, dd, cnt, ret,
                 SUM(cnt) OVER (PARTITION BY seg ORDER BY dd
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccnt,
                 SUM(ret) OVER (PARTITION BY seg ORDER BY dd
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cret
          FROM dec),
        iv AS MATERIALIZED (
          SELECT a.seg, a.dd AS i, b.dd AS j,
                 CAST(b.cret - (a.cret - a.ret) AS DOUBLE) /
                   CAST(b.ccnt - (a.ccnt - a.cnt) AS DOUBLE) AS m
          FROM pf a JOIN pf b ON a.seg = b.seg AND a.dd <= b.dd),
        fit AS MATERIALIZED (
          SELECT seg, k, MAX(mn) AS iso FROM (
            SELECT iv.seg, p.dd AS k, iv.i, MIN(iv.m) AS mn
            FROM iv JOIN pf p ON p.seg = iv.seg
              AND iv.i <= p.dd AND p.dd <= iv.j
            GROUP BY iv.seg, p.dd, iv.i) q
          GROUP BY seg, k)
        SELECT dec.seg, CAST(dec.dd AS INTEGER) AS decile,
               dec.cnt AS n_cust, dec.ret AS retained,
               ROUND(CAST(dec.ret AS DOUBLE) / CAST(dec.cnt AS DOUBLE), 6) AS rate_raw,
               ROUND(fit.iso, 6) AS rate_iso
        FROM dec JOIN fit ON fit.seg = dec.seg AND fit.k = dec.dd""")
    ),

    // ----------------------------------------------------------------
    // COHORT LTV CURVE — the revenue twin of the q238 retention curve
    // and the other half of the q102 cohort mart: average CUMULATIVE
    // spend per customer by month-age, per acquisition-quarter
    // cohort. The number that tells a finance team when a cohort pays
    // back. Shape: one customer-grain aggregate fixes each customer's
    // cohort; one keyed join tags every order with its (cohort, age)
    // — the honest fact-grain pass; then a (cohort, month-age)
    // DECIMAL aggregate and a calendar²-bounded cumulative window.
    // Ages are exact integer month arithmetic (y·12+m differences,
    // never months_between's fractional days); the final per-customer
    // average is the one decimal→double cast, rounded 6 (the q93
    // contract).
    "q253_cohort_ltv" -> QueryDef(
      fn = (s, d) => {
        val dt = DecimalType(38, 4)
        val oc = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("o_custkey").as("cust"),
            col("o_orderdate").cast("date").as("day"),
            col("o_totalprice"))
        val spans = oc.groupBy(col("cust"))
          .agg(min(col("day")).as("f"))
          .select(col("cust"),
            date_trunc("quarter", col("f")).cast("date").as("cohort_q"),
            (year(col("f")) * 12 + month(col("f"))).as("m0"))
        val sizes = spans.groupBy(col("cohort_q"))
          .agg(count(lit(1)).as("n_cust"))
        val aged = oc.join(spans, "cust")
          .groupBy(col("cohort_q"),
            (year(col("day")) * 12 + month(col("day")) - col("m0")).as("age_months"))
          .agg(sum(col("o_totalprice").cast(dt)).as("rev"))
        val wCum = Window.partitionBy(col("cohort_q")).orderBy(col("age_months"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        aged
          .withColumn("cum", sum(col("rev")).over(wCum))
          .join(broadcast(sizes), "cohort_q")
          .select(col("cohort_q"), col("age_months"), col("n_cust"),
            round(col("cum").cast("double") / col("n_cust").cast("double"), 6)
              .as("ltv_per_cust"))
      },
      oracle = Some("""
        WITH oc AS MATERIALIZED (
          SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS day,
                 o_totalprice
          FROM orders JOIN customer ON o_custkey = c_custkey),
        sp AS MATERIALIZED (
          SELECT cust, CAST(DATE_TRUNC('quarter', MIN(day)) AS DATE) AS cohort_q,
                 YEAR(MIN(day)) * 12 + MONTH(MIN(day)) AS m0
          FROM oc GROUP BY cust),
        sz AS MATERIALIZED (
          SELECT cohort_q, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM sp GROUP BY cohort_q),
        aged AS MATERIALIZED (
          SELECT sp.cohort_q,
                 CAST(YEAR(oc.day) * 12 + MONTH(oc.day) - sp.m0 AS INTEGER)
                   AS age_months,
                 SUM(CAST(oc.o_totalprice AS DECIMAL(38,4))) AS rev
          FROM oc JOIN sp ON oc.cust = sp.cust
          GROUP BY 1, 2),
        cm AS MATERIALIZED (
          SELECT cohort_q, age_months,
                 SUM(rev) OVER (PARTITION BY cohort_q ORDER BY age_months
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM aged)
        SELECT cm.cohort_q, cm.age_months, sz.n_cust,
               ROUND(CAST(cm.cum AS DOUBLE) / CAST(sz.n_cust AS DOUBLE), 6)
                 AS ltv_per_cust
        FROM cm JOIN sz ON sz.cohort_q = cm.cohort_q""")
    ),

    // ----------------------------------------------------------------
    // RETENTION AUC (Mann-Whitney) — does lifetime spend SEPARATE the
    // customers who stayed from the ones who churned? AUC = P(spend
    // of a random survivor > spend of a random churner), ties ½ —
    // computed exactly from integer midranks (the q221 doubling: 2·
    // rank + ties − 1 keeps every rank an integer), so AUC is one
    // IEEE-exact division of two BIGINTs. The ranks come from the
    // RankSelect.withGroupRanks bucket kernel — global min-rank and tie
    // count assembled from (segment, value-bucket)-partitioned windows
    // plus broadcast bucket offsets — so no task ever sorts more than
    // ~n/1024 customer rows however few segments there are (a plain
    // seg-partitioned rank window would serialize each segment through
    // ONE task: the round-9 scale-killer this replaces). (At 3e9+
    // customers per segment the BIGINT rank-sum would need DECIMAL —
    // noted, not needed at any gated scale.)
    "q241_retention_auc" -> QueryDef(
      fn = (s, d) => {
        val ev = withEvent(custSpans(s, d, withSpend = true))
          .select(col("seg"), col("event"), col("spend"))
        val rk = RankSelect.withGroupRanks(ev, "seg", "spend")
        val m = rk
          .withColumn("r2",
            lit(2L) * col("__rk_rank") + col("__rk_ties") - lit(1L))
          .groupBy(col("seg")).agg(
            sum(when(col("event") === 0, col("r2")).otherwise(lit(0L))).as("s2"),
            sum(when(col("event") === 0, 1L).otherwise(0L)).as("p"),
            sum(when(col("event") === 1, 1L).otherwise(0L)).as("n"))
        m.where(col("p") > 0 && col("n") > 0)
          .select(col("seg"), col("p").as("n_retained"), col("n").as("n_churned"),
            round((col("s2") - col("p") * (col("p") + 1)).cast("double") /
              (lit(2L) * col("p") * col("n")).cast("double"), 6).as("auc"))
      },
      oracle = Some(s"""
        WITH ${lifeTableSql(
          pcExtra = ",\n                 SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS spend",
          spExtra = ", spend")},
        rk AS MATERIALIZED (
          SELECT seg, event,
                 2 * RANK() OVER (PARTITION BY seg ORDER BY spend) +
                   COUNT(*) OVER (PARTITION BY seg, spend) - 1 AS r2
          FROM sp),
        m AS MATERIALIZED (
          SELECT seg,
                 CAST(SUM(CASE WHEN event = 0 THEN r2 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN event = 0 THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n
          FROM rk GROUP BY seg)
        SELECT seg, p AS n_retained, n AS n_churned,
               ROUND(CAST(s2 - p * (p + 1) AS DOUBLE) /
                     CAST(2 * p * n AS DOUBLE), 6) AS auc
        FROM m WHERE p > 0 AND n > 0""")
    ),

    // ----------------------------------------------------------------
    // COX PROPORTIONAL HAZARDS (Cox 1972, Breslow ties) — the model a
    // retention team fits once KM (q238) says the curves differ and
    // log-rank (q239) says it's significant: HOW MUCH does a covariate
    // move the hazard? Covariate: order frequency (order count capped
    // at 10, scaled to [0,1] — an exact integer ratio). β is fit by
    // CoxSteps fixed Newton-Raphson steps on the Breslow partial
    // log-likelihood, the same fixed-step discipline as the IRLS
    // classifier (q263): deterministic, CTE-mirrorable, no convergence
    // test in the gate.
    //
    // Scale shape: the corpus collapses to customer grain in one
    // aggregate, then each Newton step is ONE (duration-day)-grain
    // aggregate (5 decimal sums per day, map-side combined) + a
    // day-grain reverse-cumulative window (calendar-bounded — more
    // customers mean heavier days, never more days, the q238 argument)
    // + one O(days) term reduction to the 2 scalars (U, I) the driver
    // consumes. At 100 TB: 3 column-pruned scans of customer spans,
    // shuffle O(distinct durations) per step, driver state = 2 doubles.
    //
    // Determinism: risk-set sums S0/S1/S2 accumulate in DECIMAL(38,10)
    // (order-free), per-event-day terms are fixed-association double
    // arithmetic, U/I reduce through DECIMAL again, and exp is the only
    // libm call (clamp-free: β·x is bounded by construction, |β| small
    // on any real covariate and x ∈ [0,1]). ROUND(…,6) absorbs the
    // ulp; step 1 evaluates at β = 0 where exp(0) = 1 exactly.
    "q278_cox_ph" -> QueryDef(
      fn = (s, d) => {
        val spans = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey").as("cust"))
          .agg(
            min(col("o_orderdate").cast("date")).as("f"),
            max(col("o_orderdate").cast("date")).as("l"),
            count(lit(1)).as("n_ord"))
        val horizon = spans.agg(date_sub(max(col("l")), HorizonDays).as("cutoff"))
        val ev = graft.CacheLeases.lease(
          spans.crossJoin(broadcast(horizon))
            .select(
              datediff(col("l"), col("f")).as("dur"),
              when(col("l") <= col("cutoff"), 1).otherwise(0).as("event"),
              (least(col("n_ord"), lit(10L)).cast("double") / lit(10.0)).as("x"))
            .persist())
        val dec = DecimalType(38, 10)
        // deliberately UNpartitioned: this window runs over the
        // duration-DAY-grain frame (O(distinct durations), calendar-
        // bounded — more customers make days heavier, never more days),
        // so the single-task stage holds ≤ a few thousand rows at any
        // corpus size. If durations ever outgrow calendar grain (e.g.
        // sub-day durations), bucket the cumulative like RankSelect;
        // the grouped twin q283 already partitions per segment.
        val wRisk = Window.orderBy(col("dur").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        var beta = 0.0
        var lastI = 0.0
        for (_ <- 1 to CoxSteps) {
          val r = exp(lit(beta) * col("x"))
          val day = ev.groupBy(col("dur")).agg(
            sum(r.cast(dec)).as("s0"),
            sum((r * col("x")).cast(dec)).as("s1"),
            sum((r * col("x") * col("x")).cast(dec)).as("s2"),
            sum(col("event")).as("d"),
            sum(when(col("event") === 1, col("x")).otherwise(lit(0.0))
              .cast(dec)).as("sx"))
          val cum = day
            .withColumn("cs0", sum(col("s0")).over(wRisk))
            .withColumn("cs1", sum(col("s1")).over(wRisk))
            .withColumn("cs2", sum(col("s2")).over(wRisk))
          val ratio1 = cum.col("cs1").cast("double") / cum.col("cs0").cast("double")
          val terms = cum.where(col("d") > 0).select(
            (col("sx").cast("double") - col("d").cast("double") * ratio1).as("ut"),
            (col("d").cast("double") *
              (col("cs2").cast("double") / col("cs0").cast("double") -
                ratio1 * ratio1)).as("it"))
          val ui = terms
            .agg(sum(col("ut").cast(dec)).as("u"), sum(col("it").cast(dec)).as("i"))
            .select(col("u").cast("double"), col("i").cast("double"))
            .head()
          val (u, i) = (ui.getDouble(0), ui.getDouble(1))
          // zero-information guard (round-11 advice): a cohort whose
          // events carry no covariate variance yields I = 0 and the raw
          // update would propagate NaN/Inf into β/hazard/se. Skip the
          // step (β unchanged) and let se surface as NULL — mirrored in
          // the oracle's CASE guards, identical values when I > 0.
          if (i > 0) beta = beta + u / i
          lastI = i
        }
        val st = ev.agg(count(lit(1)).as("n"), sum(col("event")).as("ne")).head()
        import s.implicits._
        Seq((st.getAs[Long]("n"), st.getAs[Long]("ne"), beta, math.exp(beta),
          if (lastI > 0) Some(1.0 / math.sqrt(lastI)) else Option.empty[Double]))
          .toDF("n", "n_events", "rb", "rh", "rs")
          .select(col("n"), col("n_events"),
            round(col("rb"), 6).as("beta"),
            round(col("rh"), 6).as("hazard_ratio"),
            round(col("rs"), 6).as("se"))
      },
      oracle = Some {
        val steps = (1 to CoxSteps).map { t =>
          s"""cr$t AS MATERIALIZED (
          SELECT csp.*, exp(beta * x) AS r FROM csp CROSS JOIN cb${t - 1}),
        cd$t AS MATERIALIZED (
          SELECT dur,
                 SUM(CAST(r AS DECIMAL(38,10))) AS s0,
                 SUM(CAST(r * x AS DECIMAL(38,10))) AS s1,
                 SUM(CAST(r * x * x AS DECIMAL(38,10))) AS s2,
                 CAST(SUM(event) AS BIGINT) AS d,
                 SUM(CAST(CASE WHEN event = 1 THEN x ELSE 0.0 END
                     AS DECIMAL(38,10))) AS sx
          FROM cr$t GROUP BY dur),
        cc$t AS MATERIALIZED (
          SELECT dur, d, sx,
                 SUM(s0) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs0,
                 SUM(s1) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs1,
                 SUM(s2) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs2
          FROM cd$t),
        ct$t AS MATERIALIZED (
          SELECT CAST(sx AS DOUBLE) - CAST(d AS DOUBLE)
                   * (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE)) AS ut,
                 CAST(d AS DOUBLE)
                   * (CAST(cs2 AS DOUBLE) / CAST(cs0 AS DOUBLE)
                      - (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE))
                        * (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE))) AS it
          FROM cc$t WHERE d > 0),
        cu$t AS MATERIALIZED (
          SELECT CAST(SUM(CAST(ut AS DECIMAL(38,10))) AS DOUBLE) AS u,
                 CAST(SUM(CAST(it AS DECIMAL(38,10))) AS DOUBLE) AS i
          FROM ct$t),
        cb$t AS MATERIALIZED (
          SELECT beta + CASE WHEN i > 0 THEN u / i ELSE 0.0 END AS beta
          FROM cb${t - 1} CROSS JOIN cu$t)"""
        }.mkString(",\n        ")
        s"""
        WITH cpc AS MATERIALIZED (
          SELECT o_custkey AS cust,
                 MIN(CAST(o_orderdate AS DATE)) AS f,
                 MAX(CAST(o_orderdate AS DATE)) AS l,
                 COUNT(*) AS n_ord
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY o_custkey),
        chz AS MATERIALIZED (
          SELECT CAST(MAX(l) - INTERVAL $HorizonDays DAY AS DATE) AS cutoff FROM cpc),
        csp AS MATERIALIZED (
          SELECT DATEDIFF('day', f, l) AS dur,
                 CASE WHEN l <= chz.cutoff THEN 1 ELSE 0 END AS event,
                 CAST(LEAST(n_ord, 10) AS DOUBLE) / 10.0 AS x
          FROM cpc CROSS JOIN chz),
        cb0 AS MATERIALIZED (SELECT 0.0 AS beta),
        $steps,
        cst AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(event) AS BIGINT) AS n_events
          FROM csp)
        SELECT n, n_events, ROUND(beta, 6) AS beta,
               ROUND(exp(beta), 6) AS hazard_ratio,
               CASE WHEN i > 0 THEN ROUND(1.0 / sqrt(i), 6) END AS se
        FROM cb$CoxSteps CROSS JOIN cu$CoxSteps CROSS JOIN cst"""
      }
    ),

    // ----------------------------------------------------------------
    // GROUPED COX — one hazard model PER SEGMENT, the q271 grouped-fit
    // discipline applied to survival (does order frequency protect
    // BUILDING customers as much as MACHINERY ones?). Identical Newton
    // machinery at (seg, duration-day) grain: each step is still ONE
    // aggregate (5 decimal sums × |segs| × days, map-side combined),
    // the risk-set cumulatives now ride PROPERLY PARTITIONED windows
    // (per-seg day grain — this is the shape q278's global fold
    // becomes the moment the model is grouped), and the ≤|segs|-row
    // (U, I) frame collects per step for the driver β update, joined
    // back as a broadcast for the next step's exp(β·x).
    "q283_cox_ph_by_segment" -> QueryDef(
      fn = (s, d) => {
        val spans = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey").as("cust"), col("c_mktsegment").as("seg"))
          .agg(
            min(col("o_orderdate").cast("date")).as("f"),
            max(col("o_orderdate").cast("date")).as("l"),
            count(lit(1)).as("n_ord"))
        val horizon = spans.agg(date_sub(max(col("l")), HorizonDays).as("cutoff"))
        val ev = graft.CacheLeases.lease(
          spans.crossJoin(broadcast(horizon))
            .select(col("seg"),
              datediff(col("l"), col("f")).as("dur"),
              when(col("l") <= col("cutoff"), 1).otherwise(0).as("event"),
              (least(col("n_ord"), lit(10L)).cast("double") / lit(10.0)).as("x"))
            .persist())
        val dec = DecimalType(38, 10)
        val wRisk = Window.partitionBy(col("seg")).orderBy(col("dur").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        var betas: Map[String, (Double, Double)] = Map.empty // seg -> (β, I)
        for (step <- 1 to CoxSteps) {
          val withR =
            if (step == 1) ev.withColumn("r", exp(lit(0.0) * col("x")))
            else {
              import s.implicits._
              val bdf = betas.toSeq.map { case (g, (b, _)) => (g, b) }
                .toDF("seg", "beta")
              ev.join(broadcast(bdf), "seg")
                .withColumn("r", exp(col("beta") * col("x")))
            }
          val day = withR.groupBy(col("seg"), col("dur")).agg(
            sum(col("r").cast(dec)).as("s0"),
            sum((col("r") * col("x")).cast(dec)).as("s1"),
            sum((col("r") * col("x") * col("x")).cast(dec)).as("s2"),
            sum(col("event")).as("d"),
            sum(when(col("event") === 1, col("x")).otherwise(lit(0.0))
              .cast(dec)).as("sx"))
          val cum = day
            .withColumn("cs0", sum(col("s0")).over(wRisk))
            .withColumn("cs1", sum(col("s1")).over(wRisk))
            .withColumn("cs2", sum(col("s2")).over(wRisk))
          val ratio1 = col("cs1").cast("double") / col("cs0").cast("double")
          val ui = cum.where(col("d") > 0)
            .select(col("seg"),
              (col("sx").cast("double") - col("d").cast("double") * ratio1).as("ut"),
              (col("d").cast("double") *
                (col("cs2").cast("double") / col("cs0").cast("double") -
                  ratio1 * ratio1)).as("it"))
            .groupBy(col("seg"))
            .agg(sum(col("ut").cast(dec)).as("u"), sum(col("it").cast(dec)).as("i"))
            .select(col("seg"), col("u").cast("double"), col("i").cast("double"))
            .collect()
          betas = ui.map { r =>
            val g = r.getString(0)
            val prev = betas.get(g).map(_._1).getOrElse(0.0)
            val (u, i) = (r.getDouble(1), r.getDouble(2))
            // per-segment zero-information guard — same contract as
            // q278's (skip the update when I ≤ 0, se surfaces NULL)
            g -> (prev + (if (i > 0) u / i else 0.0), i)
          }.toMap
        }
        val st = ev.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("event")).as("n_events"))
          .collect().map(r => r.getString(0) ->
            ((r.getAs[Long]("n"), r.getAs[Long]("n_events")))).toMap
        import s.implicits._
        betas.toSeq.sortBy(_._1).map { case (g, (b, i)) =>
          (g, st(g)._1, st(g)._2, b, math.exp(b),
            if (i > 0) Some(1.0 / math.sqrt(i)) else Option.empty[Double])
        }.toDF("seg", "n", "n_events", "rb", "rh", "rs")
          .select(col("seg"), col("n"), col("n_events"),
            round(col("rb"), 6).as("beta"),
            round(col("rh"), 6).as("hazard_ratio"),
            round(col("rs"), 6).as("se"))
      },
      oracle = Some {
        val steps = (1 to CoxSteps).map { t =>
          val rExpr =
            if (t == 1) "exp(0.0 * x)"
            else "exp(beta * x)"
          val from =
            if (t == 1) "gsp"
            else s"gsp JOIN gb${t - 1} USING (seg)"
          s"""gr$t AS MATERIALIZED (
          SELECT seg, dur, event, x, $rExpr AS r FROM $from),
        gd$t AS MATERIALIZED (
          SELECT seg, dur,
                 SUM(CAST(r AS DECIMAL(38,10))) AS s0,
                 SUM(CAST(r * x AS DECIMAL(38,10))) AS s1,
                 SUM(CAST(r * x * x AS DECIMAL(38,10))) AS s2,
                 CAST(SUM(event) AS BIGINT) AS d,
                 SUM(CAST(CASE WHEN event = 1 THEN x ELSE 0.0 END
                     AS DECIMAL(38,10))) AS sx
          FROM gr$t GROUP BY seg, dur),
        gc$t AS MATERIALIZED (
          SELECT seg, dur, d, sx,
                 SUM(s0) OVER w AS cs0, SUM(s1) OVER w AS cs1,
                 SUM(s2) OVER w AS cs2
          FROM gd$t
          WINDOW w AS (PARTITION BY seg ORDER BY dur DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        gt$t AS MATERIALIZED (
          SELECT seg,
                 CAST(sx AS DOUBLE) - CAST(d AS DOUBLE)
                   * (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE)) AS ut,
                 CAST(d AS DOUBLE)
                   * (CAST(cs2 AS DOUBLE) / CAST(cs0 AS DOUBLE)
                      - (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE))
                        * (CAST(cs1 AS DOUBLE) / CAST(cs0 AS DOUBLE))) AS it
          FROM gc$t WHERE d > 0),
        gu$t AS MATERIALIZED (
          SELECT seg,
                 CAST(SUM(CAST(ut AS DECIMAL(38,10))) AS DOUBLE) AS u,
                 CAST(SUM(CAST(it AS DECIMAL(38,10))) AS DOUBLE) AS i
          FROM gt$t GROUP BY seg),
        gb$t AS MATERIALIZED (
          SELECT seg,
                 ${if (t == 1) "0.0" else s"gb${t - 1}.beta"}
                   + CASE WHEN gu$t.i > 0 THEN gu$t.u / gu$t.i ELSE 0.0 END AS beta,
                 gu$t.i AS i
          FROM gu$t${if (t == 1) "" else s" JOIN gb${t - 1} USING (seg)"})"""
        }.mkString(",\n        ")
        s"""
        WITH gpc AS MATERIALIZED (
          SELECT o_custkey AS cust, c_mktsegment AS seg,
                 MIN(CAST(o_orderdate AS DATE)) AS f,
                 MAX(CAST(o_orderdate AS DATE)) AS l,
                 COUNT(*) AS n_ord
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY o_custkey, c_mktsegment),
        ghz AS MATERIALIZED (
          SELECT CAST(MAX(l) - INTERVAL $HorizonDays DAY AS DATE) AS cutoff FROM gpc),
        gsp AS MATERIALIZED (
          SELECT seg, DATEDIFF('day', f, l) AS dur,
                 CASE WHEN l <= ghz.cutoff THEN 1 ELSE 0 END AS event,
                 CAST(LEAST(n_ord, 10) AS DOUBLE) / 10.0 AS x
          FROM gpc CROSS JOIN ghz),
        $steps,
        gst AS MATERIALIZED (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(event) AS BIGINT) AS n_events
          FROM gsp GROUP BY seg)
        SELECT seg, n, n_events, ROUND(beta, 6) AS beta,
               ROUND(exp(beta), 6) AS hazard_ratio,
               CASE WHEN i > 0 THEN ROUND(1.0 / sqrt(i), 6) END AS se
        FROM gb$CoxSteps JOIN gst USING (seg)"""
      }
    )
  )
}
