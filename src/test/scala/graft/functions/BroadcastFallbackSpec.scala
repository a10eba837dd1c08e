package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The documented broadcast→SMJ degradation path for the shingle
  * semi-joins, exercised instead of asserted: q110/q143/q144/q191 (and
  * q192's stream-static band join, below) measure
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
    Seq("q110_decontaminate", "q143_contamination_report", "q144_incremental_dedup",
      // q191's prefix-blocked self-join: the build side is the whole
      // blocked title table — at corpus scale it must degrade to an
      // equi-keyed SMJ on blk, never a nested-loop over titles
      "q191_fuzzy_edit_dedup")

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

  test("q192 stream-static band join: broadcast disabled degrades to a keyed SMJ " +
    "inside the micro-batch with identical rows") {
    // rows with broadcast ON (the committed path)
    val broadcastRows = graft.SparkEntry.queries("q192_stream_dedup_gate")(spark, d)
      .collect().map(_.toSeq).toSet
    // with broadcast OFF: run the full q192 pipeline (memory sink) for
    // row identity, and read the REAL IncrementalExecution plan off the
    // StreamExecution — the DF a sink sees is the already-computed
    // micro-batch output (Scan ExistingRDD), which hides the join
    val (fallbackRows, plan) = withBroadcastDisabled {
      val rows = graft.SparkEntry.queries("q192_stream_dedup_gate")(spark, d)
        .collect().map(_.toSeq).toSet
      val q = graft.sources.TextFormats.streamDedupGateDf(spark, d)
        .writeStream
        .format("noop")
        .outputMode("append")
        .start()
      val p =
        try { q.processAllAvailable(); org.apache.spark.sql.graft.StreamPlan.lastExecutedPlan(q) }
        finally q.stop()
      (rows, p)
    }
    assert(fallbackRows == broadcastRows,
      s"q192 fallback answer drifted (${fallbackRows.size} vs ${broadcastRows.size} rows)")
    assert(plan.nonEmpty, "no micro-batch executed")
    // the micro-batch must have planned the band join as a keyed
    // sort-merge, and never a nested-loop/cartesian expansion
    assert(plan.contains("SortMergeJoin"),
      "q192 micro-batch fallback plan lacks SortMergeJoin:\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoop"),
      "q192 micro-batch fallback plan degenerated to BNLJ")
    assert(!plan.contains("CartesianProduct"),
      "q192 micro-batch fallback plan degenerated to a cartesian product")
  }
}
