package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

/** q170 transformWithState: state carries across micro-batches, and the
  * drained per-key maximum equals the exact batch count on the corpus.
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("running count survives micro-batch boundaries (RocksDB ValueState)") {
    import spark.implicits._
    import TransformWithStateOps._
    val dir = java.nio.file.Files.createTempDirectory("graft_tws_").toString
    // two files -> two micro-batches under maxFilesPerTrigger=1
    Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("user_id", "event_id")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq((1L, 13L), (1L, 14L), (1L, 15L)).toDF("user_id", "event_id")
      .coalesce(1).write.parquet(s"$dir/f2")
    val stage = java.nio.file.Files.createTempDirectory("graft_tws_in_").toString
    for ((f, i) <- Seq("f1", "f2").zipWithIndex) {
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir, f))
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().orElseThrow()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(stage, s"$i.parquet"))
    }
    TransformWithStateOps.withRocksDBStateStore(spark) {
      val in = spark.readStream
        .schema("user_id LONG, event_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .as[In](Encoders.product[In])
      val q = in.groupByKey(_.user_id)(Encoders.scalaLong)
        .transformWithState(
          new RunningCountProcessor, TimeMode.None(), OutputMode.Update(),
          Encoders.product[CumCount])
        .writeStream.format("memory").queryName("tws_spec").outputMode("update").start()
      try q.processAllAvailable()
      finally q.stop()
      val rows = spark.table("tws_spec")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1 emits (1,2),(2,1); batch 2 emits (1,5) — the count
      // resumed from RocksDB state, not from zero
      assert(rows === Set((1L, 2L), (2L, 1L), (1L, 5L)))
    }
  }

  test("q170: drained max equals the exact per-user batch count (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q170_stream_transform_state")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
