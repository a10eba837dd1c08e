package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the final adaptive physical plan of named queries — the
  * iterate-on-the-plan loop: run, read, tighten, re-run.
  * Usage: runMain graft.tools.ShowPlan q98_argmax_struct [q101_funnel ...]
  */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
