package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-cost diagnostic: replay the q79 left-outer interval join
  * with progress reporting to see where the wall time goes (batch
  * count, per-batch durationMs breakdown: addBatch / getBatch /
  * commitOffsets / walCommit / stateStore commit). Round-5 measurement
  * at sf0.1, 4 shuffle partitions: 2 batches — batch 0 is 5.2 s
  * (addBatch 3.6 s of real join work over 200k input rows, planning
  * 1.1 s, state commit 1.2 s for ~40k state rows), batch 1 is the
  * 1.2 s watermark-eviction drain. The machinery floor, not plan cost.
  *
  * Usage: runMain graft.tools.StreamProbe [sfDir]  (requires the q79
  * sentinel staging dir, built by any prior q79 run on that corpus)
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d     = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // assumes the q79 sentinel staging dir already exists (built by a
    // prior Verify/QTime run of q79 on this corpus); Staging.dirFor
    // resolves the same content-keyed dir the queries stage into
    val src = java.nio.file.Paths.get(d, "events.parquet").toAbsolutePath.normalize
    val stageDir = graft.Staging.dirFor("graft_stream_events_sent", src).toString
    val onDisk = spark.read.parquet(stageDir).schema
    def side = graft.Tables.normalizeEventsTs(
      spark.readStream.schema(onDisk).parquet(stageDir))
    val clicks = side.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "48 hours")
    val purchases = side.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "48 hours")
    val joined = clicks.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 10 minutes"),
      "left_outer")
    val t0 = System.nanoTime()
    val q = joined.writeStream.format("memory").queryName("probe_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(f"[probe] total wall=$wall%.2f s, batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
        s"commitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
    }
    spark.stop()
  }
}
