package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Ad-hoc single-query profiler: wall time + total shuffle bytes
  * written, so plan changes can be judged on data movement, not just
  * wall clock.
  *
  * Usage: runMain graft.tools.QTime <queryName> [sfDir] [reps]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("q32_dedup_ngram_jaccard")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps  = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.getOrCreate()

    val shuffleWrite = new LongAdder
    val shuffleRead  = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      shuffleWrite.reset(); shuffleRead.reset()
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(name)(spark, sfDir).count()
      val s  = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus so this rep's metrics are all counted
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      println(f"[qtime] $name rep=$i rows=$n wall=$s%.2f s " +
        f"shuffleWrite=${shuffleWrite.sum() / 1e6}%.2f MB " +
        f"shuffleRead=${shuffleRead.sum() / 1e6}%.2f MB")
    }
    spark.stop()
  }
}
