package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The documented broadcast→SMJ degradation path for the shingle
  * semi-joins, exercised instead of asserted: q110/q143/q144 measure
  * ~0 MB shuffle because the holdout/band side broadcasts entirely; at
  * 100 TB a holdout or band table can outgrow broadcast, and the
  * fallback must be a key-partitioned SortMergeJoin — linear, keyed —
  * never a BroadcastNestedLoopJoin or a cartesian expansion. This spec
  * forces the fallback with autoBroadcastJoinThreshold=-1 and proves
  * (a) the answers are bit-identical to the broadcast path and (b) the
  * degraded plan has the SMJ shape.
  */
class BroadcastFallbackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private val queries =
    Seq("q110_decontaminate", "q143_contamination_report", "q144_incremental_dedup")

  private def withBroadcastDisabled[A](f: => A): A = {
    val prevT  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAq = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // an explicit -1 here too: AQE would otherwise re-promote the small
    // side at runtime and the fallback shape would never materialize
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      prevAq match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  queries.foreach { q =>
    test(s"$q: broadcast disabled degrades to a keyed SMJ with identical results") {
      val broadcastRows = graft.SparkEntry.queries(q)(spark, d)
        .collect().map(_.toSeq).toSet
      val (fallbackRows, plan) = withBroadcastDisabled {
        val df = graft.SparkEntry.queries(q)(spark, d)
        val rows = df.collect().map(_.toSeq).toSet
        (rows, df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
      }
      assert(fallbackRows == broadcastRows,
        s"$q: fallback answer drifted (${fallbackRows.size} vs ${broadcastRows.size} rows)")
      assert(plan.contains("SortMergeJoin"),
        s"$q fallback plan lacks SortMergeJoin:\n" +
          plan.linesIterator.take(30).mkString("\n"))
      assert(!plan.contains("BroadcastNestedLoop"),
        s"$q fallback plan degenerated to BNLJ:\n" +
          plan.linesIterator.take(30).mkString("\n"))
      assert(!plan.contains("CartesianProduct"),
        s"$q fallback plan degenerated to a cartesian product")
    }
  }
}
