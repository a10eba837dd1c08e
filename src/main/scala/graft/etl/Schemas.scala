package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for the medallion warehouse — the engine's equivalent
  * of the reference's DDL script (`processing/jobs/init_iceberg_tables.py:
  * 24-531`). Decimal precisions are part of the contract and match the
  * reference exactly: DECIMAL(10,2) money, DECIMAL(8,2) power,
  * DECIMAL(5,2) scores/hours, DECIMAL(5,4) ratios.
  */
object Schemas {

  val Money   = DecimalType(10, 2)
  val Power   = DecimalType(8, 2)
  val Score   = DecimalType(5, 2)
  val Ratio   = DecimalType(5, 4)

  /** bronze.sales_events (init_iceberg_tables.py:32-47). */
  val bronzeSales: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("event_time", TimestampType),
    StructField("ingestion_time", TimestampType),
    StructField("product_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("unit_price", Money),
    StructField("customer_id", StringType),
    StructField("date", DateType),
    StructField("time_of_day", StringType),
    StructField("processing_status", StringType)
  ))

  /** bronze.inventory_updates (init_iceberg_tables.py:50-66). */
  val bronzeInventory: StructType = StructType(Seq(
    StructField("update_id", StringType, nullable = false),
    StructField("event_time", TimestampType),
    StructField("ingestion_time", TimestampType),
    StructField("product_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("beginning_stock", IntegerType),
    StructField("restocked_quantity", IntegerType),
    StructField("sold_quantity", IntegerType),
    StructField("waste_quantity", IntegerType),
    StructField("reported_by", StringType),
    StructField("date", DateType),
    StructField("processing_status", StringType),
    StructField("late_arrival_hours", DoubleType)
  ))

  /** bronze.equipment_metrics (init_iceberg_tables.py:86-98). */
  val bronzeEquipment: StructType = StructType(Seq(
    StructField("metric_id", StringType, nullable = false),
    StructField("equipment_id", IntegerType),
    StructField("event_time", TimestampType),
    StructField("ingestion_time", TimestampType),
    StructField("power_consumption", Power),
    StructField("operational_status", StringType),
    StructField("raw_payload", StringType),
    StructField("date", DateType),
    StructField("processing_status", StringType)
  ))

  /** bronze.customer_feedback (init_iceberg_tables.py:69-83). */
  val bronzeFeedback: StructType = StructType(Seq(
    StructField("feedback_id", StringType, nullable = false),
    StructField("feedback_time", TimestampType),
    StructField("ingestion_time", TimestampType),
    StructField("customer_id", StringType),
    StructField("product_id", IntegerType),
    StructField("rating", IntegerType),
    StructField("platform", StringType),
    StructField("review_text", StringType),
    StructField("raw_payload", StringType),
    StructField("date", DateType),
    StructField("processing_status", StringType)
  ))

  /** bronze.promotions (init_iceberg_tables.py:101-113) — declared in the
    * reference DDL but never written by any job there (SURVEY.md §2.13);
    * here the generator populates it and fact_promotions consumes it.
    */
  val bronzePromotions: StructType = StructType(Seq(
    StructField("promo_id", StringType, nullable = false),
    StructField("product_id", IntegerType),
    StructField("promo_type", StringType),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("discount_percentage", Score),
    StructField("raw_payload", StringType),
    StructField("processing_status", StringType)
  ))

  /** bronze.weather_data (init_iceberg_tables.py:115-125) — declared in
    * the reference DDL, never written there; the generator populates it
    * and gold.dim_weather parses the payload (SURVEY.md §2.13).
    */
  val bronzeWeather: StructType = StructType(Seq(
    StructField("weather_id", StringType, nullable = false),
    StructField("date", DateType),
    StructField("store_id", IntegerType),
    StructField("weather_condition", StringType),
    StructField("raw_payload", StringType),
    StructField("processing_status", StringType)
  ))

  /** Seed product catalog (silver_to_gold.py:74-87). */
  val products: Seq[(Int, String, String, java.math.BigDecimal)] = Seq(
    (1, "Sourdough Loaf", "bread", bd("4.50")),
    (2, "Baguette", "bread", bd("2.80")),
    (3, "Rye Bread", "bread", bd("3.90")),
    (4, "Ciabatta", "bread", bd("3.20")),
    (5, "Whole Wheat", "bread", bd("4.10")),
    (6, "Croissant", "pastry", bd("2.20")),
    (7, "Pain au Chocolat", "pastry", bd("2.60")),
    (8, "Danish", "pastry", bd("2.90")),
    (9, "Eclair", "pastry", bd("3.40")),
    (10, "Macaron", "pastry", bd("1.80"))
  )

  /** Seed store catalog (silver_to_gold.py:109-118). */
  val stores: Seq[(Int, String, String, Int, Int)] = Seq(
    (1, "Downtown", "flagship", 6, 22),
    (2, "Riverside", "standard", 7, 21),
    (3, "Market Square", "standard", 7, 21),
    (4, "Station", "kiosk", 5, 23),
    (5, "Suburb Mall", "standard", 8, 20)
  )

  /** Equipment catalog (generate_equipment_metrics.py:20-78) — feeds the
    * dim_equipment the reference declares but never populates
    * (SURVEY.md §2.13).
    */
  val equipment: Seq[(Int, String, Double)] = Seq(
    (1, "oven", 15.0), (2, "oven", 15.0),
    (3, "mixer", 5.0), (4, "mixer", 5.0),
    (5, "proofer", 3.0), (6, "refrigerator", 2.5), (7, "display_case", 1.5)
  )

  private def bd(s: String) = new java.math.BigDecimal(s)
}
