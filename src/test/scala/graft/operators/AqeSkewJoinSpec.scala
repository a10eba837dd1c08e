package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates Spark's own AQE skew-join split firing on a skewed
  * corpus — the runtime counterpart to the explicit [[SkewJoin]]
  * salting operator, documenting when each applies:
  *
  *  - **AQE skew split (free, this spec)**: shuffle JOINS under AQE —
  *    the oversized partition is split at runtime and the other side's
  *    matching partition is duplicated per split. Nothing to author.
  *  - **Salting ([[SkewJoin]], q43)**: needed where AQE can't reach —
  *    hot-key AGGREGATIONS (no join to duplicate), streaming stateful
  *    ops (AQE is disabled), or when the skew is known ahead of time
  *    and the extra shuffle of a runtime re-plan matters.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    import spark.implicits._
    // thresholds sized for a test corpus: skew = partition > max(128 KB,
    // 2x median), split target 32 KB; broadcast disabled so the 51-row
    // dim can't short-circuit the SortMergeJoin under test
    val confs = Map(
      "spark.sql.adaptive.enabled"                                   -> "true",
      "spark.sql.adaptive.skewJoin.enabled"                          -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"  -> "131072",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"            -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"              -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled"                -> "false",
      "spark.sql.autoBroadcastJoinThreshold"                         -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"                -> "-1",
      "spark.sql.shuffle.partitions"                                 -> "8"
    )
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of 300k fact rows share key 0; the rest spread over 50 keys
      val facts = spark.range(0, 300000L).select(
        // 90% of rows share key 0; the rest cover keys 1..50 (integer
        // `div` keeps the key a long AND decorrelates it from the %10
        // selector — id%50 only hits 5 residues on multiples of 10)
        when(col("id") % 10 === 0, expr("id div 10") % 50 + 1).otherwise(lit(0L)).as("k"),
        (col("id") * 7 % 1000).as("v")
      )
      val dim = spark.range(0, 51L).select(
        col("id").as("k"),
        concat(lit("grp_"), col("id")).as("grp")
      )
      val joined = facts.join(dim, "k").groupBy(col("grp")).agg(sum(col("v")).as("tv"))
      // collect() (not count()) so the inspected queryExecution is the
      // one that actually ran — count() builds its own execution and
      // leaves this plan unfinalized under AQE
      val n = joined.collect().length
      assert(n == 51, s"expected 51 groups, got $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE skew split did not fire; final plan:\n" + plan.linesIterator.take(40).mkString("\n"))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
