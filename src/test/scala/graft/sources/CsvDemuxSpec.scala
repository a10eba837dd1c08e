package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demux of a reference-shaped combined CSV (FIXTURES.md §1): mixed row
  * types in one wide file, dotted payload headers, uppercase statuses.
  */
class CsvDemuxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val csvPath: String = {
    val header =
      "event_id,update_id,metric_id,feedback_id,event_time,ingestion_time,feedback_time," +
        "product_id,store_id,equipment_id,quantity,unit_price,customer_id,rating,platform," +
        "review_text,beginning_stock,restocked_quantity,sold_quantity,waste_quantity," +
        "reported_by,late_arrival_hours,power_consumption,operational_status,processing_status," +
        "raw_payload.time_of_day,raw_payload.sentiment,raw_payload.language," +
        "raw_payload.sensor_diagnostics.temp_sensor,raw_payload.sensor_diagnostics.vibration"
    val rows = Seq(
      // sales row (uppercase PENDING, dotted payload)
      "pos_1_100,null,null,null,2025-06-23 09:15:00,2025-06-23 09:20:00,null,3,1,null,2,3.90,CUST_1234,null,null,null,null,null,null,null,null,null,null,null,PENDING,morning,null,null,null,null",
      // inventory row (LATE_ARRIVAL)
      "null,inv_2_5_200,null,null,2025-06-22 20:30:00,2025-06-23 08:00:00,null,5,2,null,null,null,null,null,null,null,100,40,80,9,staff_3,11.5,null,null,LATE_ARRIVAL,null,null,null,null,null",
      // equipment row (nested diagnostics)
      "null,null,iot_1_300,null,2025-06-23 10:00:00,2025-06-23 10:00:30,null,null,null,1,null,null,null,null,null,null,null,null,null,null,null,null,14.25,running,PENDING,null,null,null,ok,0.3",
      // feedback row
      "null,null,null,fb_400,null,2025-06-23 12:00:00,2025-06-21 18:00:00,7,null,null,null,null,c0ffee,4,Google,nice pastries,null,null,null,null,null,null,null,null,PENDING,null,POSITIVE,en,null,null"
    )
    val p = java.nio.file.Files.createTempDirectory("graft_csv_").resolve("combined.csv")
    java.nio.file.Files.write(p, (header +: rows).mkString("\n").getBytes)
    p.toString
  }

  private lazy val combined = {
    // literal "null" strings -> real nulls, mirroring the reference CSV
    val raw = CsvDemux.readCombined(spark, csvPath)
    raw.select(raw.columns.map(c =>
      when(col(s"`$c`") === "null", lit(null)).otherwise(col(s"`$c`")).as(c)).toSeq: _*)
  }

  test("each record type lands in exactly its slice") {
    assert(CsvDemux.sales(combined).count() == 1)
    assert(CsvDemux.inventory(combined).count() == 1)
    assert(CsvDemux.equipment(combined).count() == 1)
    assert(CsvDemux.feedback(combined).count() == 1)
  }

  test("statuses are case-normalized at ingest (PENDING/LATE_ARRIVAL -> pending)") {
    assert(CsvDemux.sales(combined).head().getAs[String]("processing_status") == "pending")
    assert(CsvDemux.inventory(combined).head().getAs[String]("processing_status") == "pending")
  }

  test("casts produce the declared types and dotted headers resolve") {
    val s = CsvDemux.sales(combined).head()
    assert(s.getAs[Int]("product_id") == 3)
    assert(s.getAs[java.math.BigDecimal]("unit_price").doubleValue() == 3.90)
    assert(s.getAs[String]("time_of_day") == "morning")
    val inv = CsvDemux.inventory(combined).head()
    assert(inv.getAs[Double]("late_arrival_hours") == 11.5)
  }

  test("nested payload columns re-assemble into JSON") {
    val eq = CsvDemux.equipment(combined).head()
    val payload = eq.getAs[String]("raw_payload")
    assert(payload.contains("\"temp_sensor\":\"ok\""))
    val fb = CsvDemux.feedback(combined).head()
    assert(fb.getAs[String]("raw_payload").contains("\"sentiment\":\"POSITIVE\""))
  }

  test("demuxed slices feed the silver transforms directly") {
    val silver = graft.etl.BronzeToSilver.feedback(
      CsvDemux.feedback(combined)
        .withColumnRenamed("date", "date")
    )
    assert(silver.head().getAs[String]("sentiment_category") == "POSITIVE")
  }
}
