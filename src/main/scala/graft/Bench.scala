package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's standard session (UTC, AQE, object-agg thresholds) so
    // bench numbers reflect the configuration the library actually ships
    val spark = GraftSession.builder(cpus.toInt).appName("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query shuffle-write attribution so a contended run is diagnosable
    // (the listener bus is async: the small drain sleep below keeps stage
    // metrics attributed to the query that produced them)
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // warm up JIT/codegen/parquet paths so the first measured query isn't
    // charged the session's one-time costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // each query owns its persist() calls; drop them so cached blocks
      // don't accumulate across 48 queries and skew later timings
      spark.catalog.clearCache()
      val s0 = shuffleWrite.get
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          // a broken query must fail the bench loudly, not record -1 and
          // let the round's numbers pass as "fast"
          System.err.println(s"[bench] $name failed: $e")
          throw e
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // listener-bus drain
      (name, sec, shuffleWrite.get - s0)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val sh = results.map { case (k, _, b) => "\"" + k + "\":" + b }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_write_bytes":$sh,"sf":"$sfDir"}""")
    spark.stop()
  }
}
