package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed warehouse replacing the reference's Iceberg catalog
  * (`local.bronze/silver/gold.*` — spark-defaults.conf:1-5). Tables are
  * date-partitioned directories; overwrites are partition-scoped via
  * dynamic partition overwrite, so a MERGE rewrite touches only the
  * partitions the source batch spans — the property that keeps rewrite
  * amplification bounded at 100 TB.
  */
final class Warehouse(val spark: SparkSession, val root: String) {

  def path(layer: String, table: String): String = s"$root/$layer/$table"

  def exists(layer: String, table: String): Boolean =
    new java.io.File(s"${path(layer, table)}/_SUCCESS").exists() ||
      new java.io.File(path(layer, table)).exists()

  def load(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table))

  /** Append, date-partitioned when the schema carries `date`. */
  def append(df: DataFrame, layer: String, table: String): Unit = {
    val w = df.write.mode("append")
    (if (df.columns.contains("date")) w.partitionBy("date") else w)
      .parquet(path(layer, table))
  }

  /** Full overwrite (dims) or dynamic partition overwrite (facts with a
    * `date` column + partitionOverwriteMode=dynamic from GraftSession).
    */
  def overwrite(df: DataFrame, layer: String, table: String): Unit = {
    val w = df.write.mode("overwrite")
    (if (df.columns.contains("date")) w.partitionBy("date") else w)
      .parquet(path(layer, table))
  }

  /** Load-or-empty with the given schema (first pipeline run). */
  def loadOr(layer: String, table: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(layer, table)) load(layer, table)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}

/** Processed-row ledger replacing in-place `UPDATE ... SET
  * processing_status='processed'` (bronze_to_silver.py:85-90 — SURVEY.md
  * §2.9 M4, §7 hard part (f)). In-place status flips force a rewrite of
  * every touched partition per ETL cycle; a ledger of processed business
  * keys makes "pending" an anti-join instead — O(batch) appended state,
  * zero rewrite of the bronze data.
  */
object StatusLedger {

  /** Rows of `bronze` not yet recorded in the ledger for `domain`. */
  def pending(bronze: DataFrame, ledger: DataFrame, keyCol: String): DataFrame =
    bronze.join(ledger.select(col(keyCol)), Seq(keyCol), "left_anti")

  /** Ledger delta for a batch just processed. */
  def markProcessed(batch: DataFrame, keyCol: String): DataFrame =
    batch.select(col(keyCol)).distinct()
      .withColumn("processed_at", current_timestamp())
}
