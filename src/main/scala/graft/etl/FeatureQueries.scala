package graft.etl

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the ML-feature semantics the ETL layer
  * builds over the warehouse (promotions range-join features,
  * feedback sentiment KPIs, maintenance-recency features — reference
  * `update_ml_features.py:100-131, 176-262`,
  * `init_iceberg_tables.py:409-436`). The DuckDB oracle runs over the
  * shared TPC-H-shaped test tables, so each query re-expresses its
  * feature over those: parts stand in for products, lineitem for the
  * daily fact, orders for feedback events, suppliers for equipment.
  */
object FeatureQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Promotion range-join feature (update_ml_features.py:100-108,
    // fact_promotions DDL init_iceberg_tables.py:409-420): a promo dim
    // with [start_date, end_date] windows, LEFT range-joined to the
    // daily fact (date BETWEEN), aggregated to a promo-active sales
    // ratio per product. The promo side is dim-sized and broadcast; the
    // fact is never fanned out (<=1 promo per product here; the ETL
    // variant pre-aggregates promo-days to guarantee it in general).
    "q49_promo_range_feature" -> QueryDef(
      fn = (s, d) => {
        val promo = part(s, d)
          .where(col("p_partkey") % 50 === 0)
          .select(
            col("p_partkey").as("promo_partkey"),
            date_add(to_date(lit("1994-01-01")), (col("p_partkey") * 7 % 2000).cast("int"))
              .as("start_date")
          )
          .withColumn("end_date", date_add(col("start_date"), 29))
        val li = lineitem(s, d).select(
          col("l_partkey"),
          to_date(col("l_shipdate")).as("ship_date"),
          col("l_quantity").cast("decimal(18,2)").as("qty")
        )
        li.join(
            broadcast(promo),
            col("l_partkey") === col("promo_partkey") &&
              col("ship_date").between(col("start_date"), col("end_date")),
            "left")
          .groupBy(col("l_partkey"))
          .agg(
            sum(col("qty")).as("tq"),
            sum(when(col("promo_partkey").isNotNull, col("qty"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("pq")
          )
          .select(
            col("l_partkey"),
            col("tq").cast("double").as("total_qty"),
            col("pq").cast("double").as("promo_qty"),
            (col("pq").cast("double") / col("tq").cast("double")).as("promo_active_ratio")
          )
      },
      oracle = Some("""
        WITH promo AS (
          SELECT p_partkey AS promo_partkey,
                 DATE '1994-01-01' + CAST((p_partkey * 7) % 2000 AS INTEGER) AS start_date,
                 DATE '1994-01-01' + CAST((p_partkey * 7) % 2000 AS INTEGER) + 29 AS end_date
          FROM part WHERE p_partkey % 50 = 0),
        li AS (
          SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_date,
                 CAST(l_quantity AS DECIMAL(18,2)) AS qty
          FROM lineitem)
        SELECT l_partkey,
               CAST(SUM(qty) AS DOUBLE) AS total_qty,
               CAST(SUM(CASE WHEN promo_partkey IS NOT NULL THEN qty
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_qty,
               CAST(SUM(CASE WHEN promo_partkey IS NOT NULL THEN qty
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(qty) AS DOUBLE) AS promo_active_ratio
        FROM li LEFT JOIN promo
          ON l_partkey = promo_partkey AND ship_date BETWEEN start_date AND end_date
        GROUP BY l_partkey""")
    ),

    // ----------------------------------------------------------------
    // Feedback sentiment KPI (fact_customer_feedback,
    // init_iceberg_tables.py:423-436 + the silver sentiment rule):
    // rating-derived sentiment, per-platform mix and positive ratio —
    // the DashboardQueries.sentimentKpis shape over oracle-checkable
    // inputs (orders as feedback events).
    "q50_feedback_sentiment_kpi" -> QueryDef(
      fn = (s, d) =>
        orders(s, d)
          .select(
            col("o_orderpriority").as("platform"),
            (col("o_orderkey") % 5 + 1).as("rating")
          )
          .withColumn(
            "sentiment_category",
            when(col("rating") >= 4, "POSITIVE")
              .when(col("rating") === 3, "NEUTRAL")
              .otherwise("NEGATIVE")
          )
          .groupBy(col("platform"))
          .agg(
            count(lit(1)).as("n_feedback"),
            avg(col("rating")).as("avg_rating"),
            sum(when(col("sentiment_category") === "POSITIVE", 1).otherwise(0)).as("n_positive"),
            sum(when(col("sentiment_category") === "NEGATIVE", 1).otherwise(0)).as("n_negative")
          )
          .withColumn(
            "positive_ratio",
            col("n_positive").cast("double") / col("n_feedback").cast("double")
          ),
      oracle = Some("""
        WITH fb AS (
          SELECT o_orderpriority AS platform, o_orderkey % 5 + 1 AS rating,
                 CASE WHEN o_orderkey % 5 + 1 >= 4 THEN 'POSITIVE'
                      WHEN o_orderkey % 5 + 1 = 3 THEN 'NEUTRAL'
                      ELSE 'NEGATIVE' END AS sentiment_category
          FROM orders)
        SELECT platform,
               COUNT(*) AS n_feedback,
               AVG(rating) AS avg_rating,
               CAST(SUM(CASE WHEN sentiment_category = 'POSITIVE' THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
               CAST(SUM(CASE WHEN sentiment_category = 'NEGATIVE' THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
               CAST(SUM(CASE WHEN sentiment_category = 'POSITIVE' THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS positive_ratio
        FROM fb GROUP BY platform""")
    ),

    // ----------------------------------------------------------------
    // Maintenance-recency feature (update_ml_features.py:190-262):
    // last event date per key (max-date over flagged rows), days-since
    // via datediff with the coalesce-to-first-observation fallback, and
    // the reference's banded history score. Suppliers' 'R' returns stand
    // in for maintenance events.
    "q51_equipment_maint_feature" -> QueryDef(
      fn = (s, d) => {
        val li = lineitem(s, d).select(
          col("l_suppkey"),
          to_date(col("l_shipdate")).as("ship_date"),
          col("l_returnflag")
        )
        val last = li
          .where(col("l_returnflag") === "R")
          .groupBy(col("l_suppkey"))
          .agg(max(col("ship_date")).as("last_maintenance_date"))
        li.groupBy(col("l_suppkey"))
          .agg(
            max(col("ship_date")).as("asof_date"),
            min(col("ship_date")).as("first_date"),
            count(lit(1)).as("n_events")
          )
          .join(last, Seq("l_suppkey"), "left")
          .withColumn(
            "days_since_maintenance",
            coalesce(
              datediff(col("asof_date"), col("last_maintenance_date")),
              datediff(col("asof_date"), col("first_date"))
            )
          )
          .withColumn(
            "maintenance_history_score",
            when(col("days_since_maintenance") > 90, 0.2)
              .when(col("days_since_maintenance") > 60, 0.5)
              .when(col("days_since_maintenance") > 30, 0.8)
              .otherwise(1.0)
          )
          .select(
            col("l_suppkey"), col("asof_date"), col("last_maintenance_date"),
            col("days_since_maintenance"), col("maintenance_history_score"),
            col("n_events")
          )
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date, l_returnflag
          FROM lineitem),
        last AS (
          SELECT l_suppkey, MAX(ship_date) AS last_maintenance_date
          FROM li WHERE l_returnflag = 'R' GROUP BY l_suppkey),
        agg AS (
          SELECT l_suppkey, MAX(ship_date) AS asof_date, MIN(ship_date) AS first_date,
                 COUNT(*) AS n_events
          FROM li GROUP BY l_suppkey)
        SELECT a.l_suppkey, a.asof_date, last.last_maintenance_date,
               CAST(COALESCE(date_diff('day', last.last_maintenance_date, a.asof_date),
                             date_diff('day', a.first_date, a.asof_date)) AS INTEGER)
                 AS days_since_maintenance,
               CAST(CASE WHEN COALESCE(date_diff('day', last.last_maintenance_date, a.asof_date),
                                       date_diff('day', a.first_date, a.asof_date)) > 90 THEN 0.2
                         WHEN COALESCE(date_diff('day', last.last_maintenance_date, a.asof_date),
                                       date_diff('day', a.first_date, a.asof_date)) > 60 THEN 0.5
                         WHEN COALESCE(date_diff('day', last.last_maintenance_date, a.asof_date),
                                       date_diff('day', a.first_date, a.asof_date)) > 30 THEN 0.8
                         ELSE 1.0 END AS DOUBLE) AS maintenance_history_score,
               a.n_events
        FROM agg a LEFT JOIN last ON a.l_suppkey = last.l_suppkey""")
    ),

    // ----------------------------------------------------------------
    // Seasonality index (update_ml_features.py:122-131): per-(product,
    // season) avg daily demand relative to the product's overall avg.
    // The reference computes it for ONE season via a driver-side
    // `first()` scalar; here the totals come from windows over the
    // tiny (product, season) aggregate, so every season of every
    // product is indexed in one distributed pass. Totals accumulate in
    // DECIMAL (order-independent) and only the final ratio is double.
    "q52_seasonality_index" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = lineitem(s, d)
          .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("ship_date"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("units"))
          .withColumn(
            "season",
            when(month(col("ship_date")).between(3, 5), "Spring")
              .when(month(col("ship_date")).between(6, 8), "Summer")
              .when(month(col("ship_date")).between(9, 11), "Fall")
              .otherwise("Winter"))
        val agg = daily
          .groupBy(col("l_partkey"), col("season"))
          .agg(sum(col("units")).as("su"), count(lit(1)).as("n_days"))
        val wProd = Window.partitionBy(col("l_partkey"))
        agg
          .withColumn("total_su", sum(col("su")).over(wProd))
          .withColumn("total_days", sum(col("n_days")).over(wProd))
          .select(
            col("l_partkey"), col("season"), col("n_days"),
            (col("su").cast("double") / col("n_days")).as("season_avg_units"),
            ((col("su").cast("double") / col("n_days")) /
              (col("total_su").cast("double") / col("total_days")))
              .as("seasonality_index"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT l_partkey, CAST(l_shipdate AS DATE) AS ship_date,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS units
          FROM lineitem GROUP BY 1, 2),
        seas AS (
          SELECT l_partkey, units,
                 CASE WHEN EXTRACT(month FROM ship_date) BETWEEN 3 AND 5 THEN 'Spring'
                      WHEN EXTRACT(month FROM ship_date) BETWEEN 6 AND 8 THEN 'Summer'
                      WHEN EXTRACT(month FROM ship_date) BETWEEN 9 AND 11 THEN 'Fall'
                      ELSE 'Winter' END AS season
          FROM daily),
        agg AS (
          SELECT l_partkey, season, SUM(units) AS su, COUNT(*) AS n_days
          FROM seas GROUP BY 1, 2)
        SELECT l_partkey, season, n_days,
               CAST(su AS DOUBLE) / n_days AS season_avg_units,
               (CAST(su AS DOUBLE) / n_days) /
                 (CAST(SUM(su) OVER (PARTITION BY l_partkey) AS DOUBLE)
                   / SUM(n_days) OVER (PARTITION BY l_partkey)) AS seasonality_index
        FROM agg""")
    ),

    // ----------------------------------------------------------------
    // Weather-impact feature (dim_weather DDL init_iceberg_tables.py:
    // 332-342; update_ml_features.py:152 stubs weather_impact_score to
    // 0.0 — here it is computed): a (store, date)-keyed weather dim is
    // joined to daily sales and demand is indexed per condition. The
    // dim derives deterministically from the day number so both engines
    // generate identical weather.
    "q53_weather_impact" -> QueryDef(
      fn = (s, d) => {
        val daily = lineitem(s, d)
          .groupBy(
            (col("l_suppkey") % 5).cast("int").as("store_id"),
            to_date(col("l_shipdate")).as("ship_date"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("units"))
        val weather = daily
          .select(col("store_id"), col("ship_date"))
          .distinct()
          .withColumn("__day", datediff(col("ship_date"), to_date(lit("1970-01-01"))))
          .withColumn("cond_code", (col("__day") * 7 + col("store_id") * 3) % 10)
          .withColumn(
            "weather_condition",
            when(col("cond_code") < 4, "sunny")
              .when(col("cond_code") < 7, "cloudy")
              .when(col("cond_code") < 9, "rainy")
              .otherwise("stormy"))
          .select(col("store_id"), col("ship_date"), col("weather_condition"))
        val byCond = daily
          .join(weather, Seq("store_id", "ship_date"))
          .groupBy(col("weather_condition"))
          .agg(sum(col("units")).as("su"), count(lit(1)).as("n_store_days"))
        // global totals as a broadcast 1-row join, not a SinglePartition
        // window — same exact decimal totals, no degenerate exchange
        val totals = byCond.agg(
          sum(col("su")).as("total_su"),
          sum(col("n_store_days")).as("total_days"))
        byCond
          .crossJoin(broadcast(totals))
          .select(
            col("weather_condition"), col("n_store_days"),
            (col("su").cast("double") / col("n_store_days")).as("avg_daily_units"),
            ((col("su").cast("double") / col("n_store_days")) /
              (col("total_su").cast("double") / col("total_days")))
              .as("impact_index"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(l_suppkey % 5 AS INTEGER) AS store_id,
                 CAST(l_shipdate AS DATE) AS ship_date,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS units
          FROM lineitem GROUP BY 1, 2),
        weather AS (
          SELECT store_id, ship_date,
                 CASE WHEN ((ship_date - DATE '1970-01-01') * 7 + store_id * 3) % 10 < 4 THEN 'sunny'
                      WHEN ((ship_date - DATE '1970-01-01') * 7 + store_id * 3) % 10 < 7 THEN 'cloudy'
                      WHEN ((ship_date - DATE '1970-01-01') * 7 + store_id * 3) % 10 < 9 THEN 'rainy'
                      ELSE 'stormy' END AS weather_condition
          FROM (SELECT DISTINCT store_id, ship_date FROM daily)),
        bycond AS (
          SELECT weather_condition, SUM(units) AS su, COUNT(*) AS n_store_days
          FROM daily JOIN weather USING (store_id, ship_date)
          GROUP BY 1)
        SELECT weather_condition, n_store_days,
               CAST(su AS DOUBLE) / n_store_days AS avg_daily_units,
               (CAST(su AS DOUBLE) / n_store_days) /
                 (CAST(SUM(su) OVER () AS DOUBLE) / SUM(n_store_days) OVER ())
                 AS impact_index
        FROM bycond""")
    )
  )
}
