package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold-layer consumer queries — the acceptance surface the reference's
  * Streamlit dashboard defines (`miri2_dashboard/app.py:100-154, 218-241`
  * — SURVEY.md §2.12). The shipped dashboard computed these in pandas
  * over synthetic frames (its data modules are missing from the
  * snapshot); here they are real queries over the gold tables, so a
  * dashboard is a thin `collect()` away.
  */
object DashboardQueries {

  /** Headline KPIs (app.py:100-112): total revenue, avg daily revenue,
    * transaction count, avg basket.
    */
  def revenueKpis(factSales: DataFrame): DataFrame = {
    val daily = factSales
      .groupBy(col("date"))
      .agg(sum(col("gross_amount")).cast(Schemas.Money).as("daily_revenue"))
    daily.agg(
      sum(col("daily_revenue")).cast(Schemas.Money).as("total_revenue"),
      avg(col("daily_revenue")).cast(Schemas.Money).as("avg_daily_revenue"),
      count(lit(1)).as("n_days")
    )
  }

  /** Revenue by product x store x date range — the flagship slice
    * (app.py:100-108 over silver_to_gold.py:302-327 fields).
    */
  def revenueBy(
      factSales: DataFrame,
      from: java.sql.Date,
      to: java.sql.Date
  ): DataFrame =
    factSales
      .where(col("date").between(lit(from), lit(to)))
      .groupBy(col("product_id"), col("category"), col("store_id"))
      .agg(
        sum(col("gross_amount")).cast(Schemas.Money).as("revenue"),
        sum(col("quantity")).as("units"),
        count(lit(1)).as("n_transactions")
      )

  /** Inventory health buckets by days_of_supply: <2 critical, 2-5
    * adequate, >5 overstocked (app.py:139-154).
    */
  def inventoryHealth(factInventory: DataFrame): DataFrame =
    factInventory
      .withColumn(
        "health",
        when(col("days_of_supply") < 2, "critical")
          .when(col("days_of_supply") <= 5, "adequate")
          .otherwise("overstocked")
      )
      .groupBy(col("health"))
      .agg(
        count(lit(1)).as("n_records"),
        avg(col("waste_ratio")).cast(Schemas.Ratio).as("avg_waste_ratio"),
        sum(col("waste_quantity")).as("total_waste_units")
      )

  /** Waste by product category (app.py:117-131). */
  def wasteByCategory(factInventory: DataFrame, dimProduct: DataFrame): DataFrame =
    factInventory
      .join(broadcast(dimProduct.select(col("product_id"), col("category"))), Seq("product_id"), "left")
      .groupBy(col("category"))
      .agg(
        sum(col("waste_quantity")).as("waste_units"),
        avg(col("waste_ratio")).cast(Schemas.Ratio).as("avg_waste_ratio")
      )

  /** Sentiment KPI off fact_customer_feedback: per-platform rating and
    * sentiment mix (the dashboard's customer-satisfaction panel; the
    * gold fact is init_iceberg_tables.py:423-436).
    */
  def sentimentKpis(factCustomerFeedback: DataFrame): DataFrame =
    factCustomerFeedback
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
      )

  /** Promotion effectiveness off fact_promotions: measured sales lift by
    * campaign type (the feature the reference's update_ml_features.py
    * reads but can never populate — fact_promotions had no writer).
    */
  def promoEffectiveness(factPromotions: DataFrame): DataFrame =
    factPromotions
      .groupBy(col("promo_type"))
      .agg(
        count(lit(1)).as("n_promos"),
        avg(col("discount_percentage")).as("avg_discount_pct"),
        avg(col("sales_lift_percentage")).as("avg_sales_lift_pct")
      )

  /** Demand vs forecast: actual daily units against the moving average
    * the feature table carries (app.py:218-241 demand simulation).
    */
  def demandVsForecast(productDemandFeatures: DataFrame): DataFrame =
    productDemandFeatures
      .groupBy(col("product_id"))
      .agg(
        sum(col("daily_units")).as("actual_units"),
        sum(col("moving_avg_units")).as("forecast_units"),
        sum(when(col("demand_trend") === "increasing", 1).otherwise(0)).as("days_increasing")
      )
}
