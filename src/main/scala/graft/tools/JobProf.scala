package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** Per-JOB profile of a single query: one line per Spark job with wall
  * time, task count, task-time sum, and shuffle bytes — the local-mode
  * stand-in for the UI's Jobs page (guide §1.1/§7.1; spark.ui is off in
  * [[GraftSession]]). Driver-side gaps show up as the difference
  * between the sum of job walls and the query wall: planning, codegen,
  * collects, fixture staging.
  *
  * Usage: runMain graft.tools.JobProf <queryName> [sfDir] [reps]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("q266_gbt_depth2_train")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps  = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.getOrCreate()

    case class J(start: Long, var site: String, var end: Long = 0L, var tasks: Int = 0,
        var taskMs: Long = 0L, var shufW: Long = 0L, var stages: Int = 0)
    val jobs = TrieMap.empty[Int, J]
    val stageToJob = TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?")
        jobs.put(e.jobId, J(e.time, site))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          if (j.site == "?") j.site = e.stageInfo.name.takeWhile(_ != ':')
          j.tasks += e.stageInfo.numTasks
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            j.taskMs += m.executorRunTime
            j.shufW += m.shuffleWriteMetrics.bytesWritten
          }
        }
    })

    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val js = jobs.toSeq.sortBy(_._1)
      val jobWallMs = js.map { case (_, j) => math.max(0L, j.end - j.start) }.sum
      println(f"[jobprof] $name rep=$rep rows=$n wall=$wall%.2f s " +
        f"jobs=${js.size} jobWallSum=${jobWallMs / 1e3}%.2f s " +
        f"driverGap=${wall - jobWallMs / 1e3}%.2f s")
      js.foreach { case (id, j) =>
        println(f"[jobprof]   job=$id%-4d wall=${math.max(0L, j.end - j.start) / 1e3}%6.2f s " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d taskSum=${j.taskMs / 1e3}%7.2f s " +
          f"shufW=${j.shufW / 1e6}%8.2f MB  ${j.site}")
      }
      // aggregate by call site: where do the jobs and the wall come from?
      println(f"[jobprof] by-site (rep=$rep):")
      js.groupBy(_._2.site).toSeq
        .map { case (site, g) =>
          (site, g.size, g.map { case (_, j) => math.max(0L, j.end - j.start) }.sum) }
        .sortBy(-_._3)
        .foreach { case (site, n, ms) =>
          println(f"[jobprof]   ${ms / 1e3}%7.2f s  n=$n%-4d $site") }
    }
    spark.stop()
  }
}
