package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming ingest (reference: `stream_to_bronze.py` —
  * SURVEY.md §2.1 S1-S3, §2.10 T1-T6), Kafka replaced by a pluggable
  * source so the zero-egress build streams from files/memory while a
  * production build points the same plan at Kafka.
  *
  * The plan per stream is identical to the reference's:
  * source → JSON decode with an explicit schema → casts → watermark →
  * append sink with per-query checkpoint + processing-time trigger.
  */
object StreamingIngest {

  /** Pluggable source: where micro-batches come from (S1). */
  trait SourceProvider {
    def stream(spark: SparkSession): DataFrame // must expose `value: String`
  }

  /** File-backed JSON-lines source directory — the zero-egress stand-in
    * for a Kafka topic (same `value` payload contract).
    */
  final case class FileJsonSource(dir: String) extends SourceProvider {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .option("maxFilesPerTrigger", "16")
        .json(dir)
  }

  /** S1 — real Kafka source (stream_to_bronze.py:36-50): same `value`
    * contract as [[FileJsonSource]], so every downstream plan is
    * source-agnostic. Resolved by name at runtime — on a cluster with
    * the spark-sql-kafka artifact this streams from the topic; in the
    * zero-egress sandbox constructing the plan fails at `load()` with
    * Spark's missing-data-source error (spec-asserted), which is the
    * correct offline behavior for an optional connector.
    */
  final case class KafkaJsonSource(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest"
  ) extends SourceProvider {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
  }

  /** S10 — CSV→Kafka replay producer (`streaming/producers/
    * csv_kafka_producer.py`): serialize each row to a JSON `value` and
    * write to the topic. Batch (not streaming) write, matching the
    * reference's replay semantics; needs the same optional artifact as
    * [[KafkaJsonSource]] at runtime.
    */
  def replayToKafka(rows: DataFrame, bootstrapServers: String, topic: String): Unit =
    rows
      .select(to_json(struct(rows.columns.map(col).toSeq: _*)).as("value"))
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** S2 — decode a JSON `value` column against an explicit schema and
    * flatten (`from_json` + `select("data.*")`, stream_to_bronze.py:58-60).
    * `options` passes format knobs through (e.g. a microsecond
    * timestampFormat — the default JSON format carries millis only).
    */
  def decode(raw: DataFrame, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    raw
      .select(from_json(col("value"), schema, options).as("data"))
      .select(col("data.*"))

  /** S3/T1-T4 — start an append-mode ingest query with watermark,
    * trigger cadence, and checkpoint, writing parquet partitioned by
    * event date (emulating Iceberg's days(event_time) transform with an
    * explicit derived column — SURVEY.md §1.3).
    */
  def startIngest(
      decoded: DataFrame,
      eventTimeCol: String,
      watermark: String,
      outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")
  ): StreamingQuery =
    decoded
      .withWatermark(eventTimeCol, watermark)
      .withColumn("date", to_date(col(eventTimeCol)))
      .writeStream
      .format("parquet")
      .outputMode("append")
      .partitionBy("date")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** T6/G4 — babysit a set of streaming queries: block until any
    * terminates, stop the rest on failure (stream_to_bronze.py:178-219).
    */
  def superviseAll(spark: SparkSession): Unit =
    try spark.streams.awaitAnyTermination()
    finally spark.streams.active.foreach(_.stop())
}
