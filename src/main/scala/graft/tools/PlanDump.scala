package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named queries to files — the
  * committed before/after plan evidence for an optimization round.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [...]
  * Writes `<outDir>/<query>_<suffix>.txt`. The query is EXECUTED first
  * so the dump carries the final AQE plan (`isFinalPlan=true`), not the
  * initial guess.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val spark = GraftSession.getOrCreate()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.drop(2).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // execute: finalize AQE
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        formatted.getBytes("UTF-8"))
      println(s"[plandump] wrote ${outDir.resolve(s"${q}_$suffix.txt")}")
    }
    spark.stop()
  }
}
