package graft.streaming

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// top-level so Spark can derive the encoder without an outer scope
final case class Upd(k: String, v: Int, version: java.sql.Timestamp)

/** Streaming MERGE into the warehouse: newer-wins across micro-batches,
  * ties keep the already-merged row (idempotent re-delivery).
  */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2025-03-01 09:$m%02d:00")

  test("foreachBatch MERGE applies newer-wins upserts per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh  = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_supsert_").toString)
    val src = MemoryStream[Upd]
    val q = StreamingUpsert.start(
      src.toDF(), wh, "silver", "state", Seq("k"), "version")
    try {
      src.addData(Upd("a", 1, ts(0)), Upd("b", 1, ts(5)))
      q.processAllAvailable()
      assert(wh.load("silver", "state").count() == 2)

      // a: newer -> replaces; b: older -> ignored; c: new -> inserted
      src.addData(Upd("a", 2, ts(10)), Upd("b", 99, ts(0)), Upd("c", 7, ts(5)))
      q.processAllAvailable()
      val rows = wh.load("silver", "state")
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(rows == Map("a" -> 2, "b" -> 1, "c" -> 7), rows.toString)

      // replayed batch: exact ties lose to the merged target (idempotent)
      src.addData(Upd("a", 2, ts(10)))
      q.processAllAvailable()
      val again = wh.load("silver", "state")
      assert(again.count() == 3)
      assert(again.where(col("k") === "a").head().getInt(1) == 2)
    } finally q.stop()
  }
}
