package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature tables (reference `update_ml_features.py` — SURVEY.md
  * §2.3 J3/J5, §2.5 W3/W4/W5). All windows are partitioned by business
  * key; the reference's driver-mediated scalar re-injection
  * (`first()` → literal) is rewritten as joins so nothing round-trips
  * through the driver.
  */
object MlFeatures {

  /** product_demand_features: daily sales, 8-day trailing moving average,
    * trend classification (update_ml_features.py:52-75 + 134-150), plus
    * the promotion features the reference assembles from fact_promotions
    * (update_ml_features.py:100-108, 147-148): promotion_active,
    * marketing_campaign and the max active discount. Promotions are
    * expanded to one row per covered (product, date) and pre-aggregated
    * to that grain BEFORE the join, so the equi-join is broadcastable
    * and can never fan out the daily rows.
    */
  def productDemand(factSales: DataFrame, factPromotions: DataFrame): DataFrame = {
    val daily = factSales
      .groupBy(col("product_id"), col("store_id"), col("date"))
      .agg(
        sum(col("quantity")).as("daily_units"),
        sum(col("gross_amount")).cast(Schemas.Money).as("daily_revenue")
      )
    val w = Window
      .partitionBy(col("product_id"), col("store_id"))
      .orderBy(col("date"))
      .rowsBetween(-7, 0)
    val promoByDay = factPromotions
      .select(
        col("product_id"),
        explode(sequence(col("start_date"), col("end_date"))).as("date"),
        col("promo_type"),
        col("discount_percentage")
      )
      .groupBy(col("product_id"), col("date"))
      .agg(
        max(col("promo_type")).as("marketing_campaign"),
        max(col("discount_percentage")).as("promo_discount_pct")
      )
    daily
      .withColumn("moving_avg_units",
        (sum(col("daily_units")).over(w) / count(col("daily_units")).over(w)))
      .withColumn(
        "demand_trend",
        when(col("daily_units") > col("moving_avg_units"), "increasing")
          .when(col("daily_units") < col("moving_avg_units"), "decreasing")
          .otherwise("stable")
      )
      .join(broadcast(promoByDay), Seq("product_id", "date"), "left")
      .withColumn("promotion_active", col("marketing_campaign").isNotNull)
  }

  /** equipment_health_features: cumulative operational hours (W4), power
    * stddev, and the maintenance-recency features from
    * update_ml_features.py:190-262: last_maintenance_date (running max
    * of dates with a maintenance event), days_since_maintenance
    * (datediff, with the reference's coalesce-to-age fallback expressed
    * as days since first observation), and the reference's banded
    * maintenance_history_score.
    */
  def equipmentHealth(factEquipment: DataFrame): DataFrame = {
    val wCum = Window
      .partitionBy(col("equipment_id"))
      .orderBy(col("date"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("equipment_id"))
    factEquipment
      .withColumn("cumulative_hours",
        sum(col("total_operational_hours")).over(wCum).cast("double"))
      .withColumn("avg_power_overall", avg(col("avg_power_kw")).over(wAll))
      .withColumn("power_stddev", stddev(col("avg_power_kw")).over(wAll))
      .withColumn(
        "last_maintenance_date",
        max(when(col("maintenance_events") > 0, col("date"))).over(wCum)
      )
      .withColumn("first_observed_date", min(col("date")).over(wCum))
      .withColumn(
        "days_since_maintenance",
        coalesce(
          datediff(col("date"), col("last_maintenance_date")),
          datediff(col("date"), col("first_observed_date"))
        )
      )
      .withColumn(
        "maintenance_history_score",
        when(col("days_since_maintenance") > 90, 0.2)
          .when(col("days_since_maintenance") > 60, 0.5)
          .when(col("days_since_maintenance") > 30, 0.8)
          .otherwise(1.0)
      )
      .withColumn(
        "maintenance_alert",
        col("cumulative_hours") > 200.0 || col("error_events") > 0
      )
      .drop("first_observed_date")
  }

  /** production_batch_features: product x oven cross join with a seeded
    * deterministic batch-size draw (update_ml_features.py:297-320; the
    * reference's unseeded `rand()` is replaced by hash-derived draws —
    * SURVEY.md §2.8 "rand must be seeded").
    */
  def productionBatches(spark: SparkSession, dimProduct: DataFrame, dimEquipment: DataFrame): DataFrame =
    dimProduct
      .select(col("product_id"), col("category"))
      .crossJoin(
        broadcast(dimEquipment.where(col("equipment_type") === "oven")
          .select(col("equipment_id"), col("rated_power_kw")))
      )
      .withColumn(
        "planned_batch_size",
        (pmod(hash(col("product_id"), col("equipment_id")), lit(40)) + 20).cast("int")
      )
      .withColumn(
        "estimated_energy_kwh",
        (col("rated_power_kw") * col("planned_batch_size") / 60.0).cast(Schemas.Power)
      )
}
