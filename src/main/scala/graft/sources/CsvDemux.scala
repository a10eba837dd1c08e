package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demultiplexer for the reference's combined wide CSV (one 63-column file
  * multiplexing 4 record types, discriminated by which id column is
  * non-null — `load_bronze_from_csv.py:32, 53, 75, 106`, FIXTURES.md §1).
  *
  * Reproduces the reference's mechanics Spark-first:
  *  - header CSV read schema-on-read as strings, then explicit casts (P4)
  *  - per-type `filter(col(id).isNotNull)` projections
  *  - backtick-escaped dotted headers (`raw_payload.time_of_day` — P7)
  *  - nested payload re-assembly via `to_json(struct(...))`
  *  - processing_status case normalization at ingest, fixing the shipped
  *    PENDING-vs-pending contract break (SURVEY.md §1.4 / §2.14-2).
  */
object CsvDemux {

  /** Read the combined CSV with header, all columns as strings. */
  def readCombined(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  private def normStatus(df: DataFrame): DataFrame =
    df.withColumn(
      "processing_status",
      when(lower(col("processing_status")).isin("pending", "late_arrival"), "pending")
        .otherwise(lower(coalesce(col("processing_status"), lit("pending"))))
    )

  /** Sales slice: rows with a non-null event_id; dotted payload headers
    * re-assembled into a JSON raw_payload string.
    */
  def sales(combined: DataFrame): DataFrame = {
    val payloadCols = combined.columns.filter(_.startsWith("raw_payload."))
    val payload =
      if (payloadCols.isEmpty) lit(null).cast("string")
      else
        to_json(struct(payloadCols.map(c =>
          col(s"`$c`").as(c.stripPrefix("raw_payload."))).toSeq: _*))
    normStatus(
      combined
        .filter(col("event_id").isNotNull)
        .select(
          col("event_id"),
          to_timestamp(col("event_time")).as("event_time"),
          to_timestamp(col("ingestion_time")).as("ingestion_time"),
          col("product_id").cast("int").as("product_id"),
          col("store_id").cast("int").as("store_id"),
          col("quantity").cast("int").as("quantity"),
          col("unit_price").cast(graft.etl.Schemas.Money).as("unit_price"),
          col("customer_id"),
          to_date(col("event_time")).as("date"),
          col("`raw_payload.time_of_day`").as("time_of_day"),
          col("processing_status"),
          payload.as("raw_payload")
        )
    )
  }

  /** Inventory slice: rows with a non-null update_id. */
  def inventory(combined: DataFrame): DataFrame =
    normStatus(
      combined
        .filter(col("update_id").isNotNull)
        .select(
          col("update_id"),
          to_timestamp(col("event_time")).as("event_time"),
          to_timestamp(col("ingestion_time")).as("ingestion_time"),
          col("product_id").cast("int").as("product_id"),
          col("store_id").cast("int").as("store_id"),
          col("beginning_stock").cast("int").as("beginning_stock"),
          col("restocked_quantity").cast("int").as("restocked_quantity"),
          col("sold_quantity").cast("int").as("sold_quantity"),
          col("waste_quantity").cast("int").as("waste_quantity"),
          col("reported_by"),
          to_date(col("event_time")).as("date"),
          col("processing_status"),
          col("late_arrival_hours").cast("double").as("late_arrival_hours")
        )
    )

  /** Equipment slice: rows with a non-null metric_id; sensor diagnostics
    * (nested dotted headers) folded back into the JSON payload.
    */
  def equipment(combined: DataFrame): DataFrame = {
    val diagCols = combined.columns.filter(_.startsWith("raw_payload.sensor_diagnostics."))
    val diag =
      if (diagCols.isEmpty) lit(null).cast("string")
      else
        to_json(struct(diagCols.map(c =>
          col(s"`$c`").as(c.stripPrefix("raw_payload.sensor_diagnostics."))).toSeq: _*))
    normStatus(
      combined
        .filter(col("metric_id").isNotNull)
        .select(
          col("metric_id"),
          col("equipment_id").cast("int").as("equipment_id"),
          to_timestamp(col("event_time")).as("event_time"),
          to_timestamp(col("ingestion_time")).as("ingestion_time"),
          col("power_consumption").cast(graft.etl.Schemas.Power).as("power_consumption"),
          col("operational_status"),
          diag.as("raw_payload"),
          to_date(col("event_time")).as("date"),
          col("processing_status")
        )
    )
  }

  /** Feedback slice: rows with a non-null feedback_id. */
  def feedback(combined: DataFrame): DataFrame =
    normStatus(
      combined
        .filter(col("feedback_id").isNotNull)
        .select(
          col("feedback_id"),
          to_timestamp(col("feedback_time")).as("feedback_time"),
          to_timestamp(col("ingestion_time")).as("ingestion_time"),
          col("customer_id"),
          col("product_id").cast("int").as("product_id"),
          col("rating").cast("int").as("rating"),
          col("platform"),
          col("review_text"),
          to_json(struct(
            col("`raw_payload.sentiment`").as("sentiment"),
            col("`raw_payload.language`").as("language")
          )).as("raw_payload"),
          to_date(col("feedback_time")).as("date"),
          col("processing_status")
        )
    )
}
