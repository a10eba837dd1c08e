package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout kernel behind q200/q201: the Morton interleave
  * must be invertible (no two coordinates share a key), hierarchical
  * (cell id of the key == key of the cell coordinates — the identity
  * candidate enumeration relies on), and the layout must actually
  * deliver the two things it exists for — tight per-cell bounding
  * boxes in BOTH dimensions (a 1-D sort only bounds one) and a scan
  * that reads only the box's partitions.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deinterleave(z: Long): (Long, Long) = {
    def compress(v0: Long): Long = {
      val a = v0 & 1431655765L
      val b = (a | (a >> 1)) & 858993459L
      val c = (b | (b >> 2)) & 252645135L
      val d = (c | (c >> 4)) & 16711935L
      (d | (d >> 8)) & 65535L
    }
    (compress(z), compress(z >> 1))
  }

  test("interleave round-trips every sampled coordinate pair") {
    for (x <- 0L until 65536L by 1013L; y <- 0L until 65536L by 977L) {
      val z = ZOrderQueries.interleave(x, y)
      assert(deinterleave(z) == ((x, y)), s"($x, $y) -> $z")
    }
  }

  test("interleave is hierarchical: zkey >> 16 == interleave(x >> 8, y >> 8)") {
    for (x <- 0L until 65536L by 1013L; y <- 0L until 65536L by 977L)
      assert(ZOrderQueries.interleave(x, y) >> 16 ==
        ZOrderQueries.interleave(x >> 8, y >> 8))
  }

  test("the Column zkey matches the driver-side interleave") {
    import spark.implicits._
    val pts = (for (x <- 0L until 4096L by 173L; y <- 0L until 4096L by 157L)
      yield (x, y)).toDF("x", "y")
    val mismatches = pts
      .withColumn("z", ZOrderQueries.zkey(col("x"), col("y")))
      .collect()
      .filter(r => r.getLong(2) != ZOrderQueries.interleave(r.getLong(0), r.getLong(1)))
    assert(mismatches.isEmpty, mismatches.take(3).mkString(", "))
  }

  test("every box row's cell is in the box's candidate cells") {
    val (xLo, xHi, yLo, yHi) = (300L, 900L, 100L, 700L)
    val cands = ZOrderQueries.candidateCells(xLo, xHi, yLo, yHi).toSet
    for (x <- xLo to xHi by 29; y <- yLo to yHi by 31)
      assert(cands.contains((ZOrderQueries.interleave(x, y) >> 16).toInt),
        s"($x, $y) escaped the candidate set")
  }

  test("z-cells bound BOTH dims; 1-D range buckets leave the other dim unbounded") {
    import spark.implicits._
    // a full 2-D grid: the adversarial case for 1-D clustering
    val grid = (for (x <- 0L until 1024L by 7L; y <- 0L until 1024L by 7L)
      yield (x, y)).toDF("x", "y")
    val zExtents = grid
      .groupBy(ZOrderQueries.zbucket(col("x"), col("y")).as("cell"))
      .agg((max("x") - min("x")).as("xe"), (max("y") - min("y")).as("ye"))
      .agg(max("xe"), max("ye")).collect()(0)
    assert(zExtents.getLong(0) < 256 && zExtents.getLong(1) < 256, zExtents.toString)
    // same bucket COUNT, 1-D: x-ranges only — y extent stays the domain
    val oneD = grid
      .groupBy((col("x") / 64).cast("int").as("cell"))
      .agg((max("y") - min("y")).as("ye"))
      .agg(min("ye")).collect()(0)
    assert(oneD.getLong(0) > 900,
      s"1-D layout unexpectedly bounded y: ${oneD.getLong(0)}")
  }

  test("a box scan over the layout reads only the box's partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_spec_")
    try {
      val grid = (for (x <- 0L until 1024L by 3L; y <- 0L until 1024L by 3L)
        yield (x, y)).toDF("x", "y")
      grid
        .withColumn("zbucket", ZOrderQueries.zbucket(col("x"), col("y")))
        .repartition(col("zbucket"))
        .write.mode("overwrite").partitionBy("zbucket")
        .parquet(s"$root/grid_z")
      val nPartitions = new java.io.File(s"$root/grid_z")
        .listFiles().count(_.getName.startsWith("zbucket="))
      assert(nPartitions == 16, s"expected 16 cells, got $nPartitions")
      val cands = ZOrderQueries.candidateCells(100L, 200L, 600L, 700L)
      val q = spark.read.parquet(s"$root/grid_z")
        .where(col("zbucket").isin(cands: _*))
        .where(col("x").between(100L, 200L) && col("y").between(600L, 700L))
      val rows = q.collect()
      // correctness: layout + pruning never change the answer
      assert(rows.length ==
        grid.where(col("x").between(100L, 200L) && col("y").between(600L, 700L))
          .count())
      // pruning: only the 1 candidate cell's files were opened
      val scans = q.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        case f: FileSourceScanExec => Seq(f)
      }.flatten
      assert(scans.nonEmpty, q.queryExecution.executedPlan.toString)
      val scanned = scans.head.selectedPartitions.partitionCount
      assert(scanned == cands.length && scanned < nPartitions,
        s"scanned $scanned of $nPartitions partitions (candidates: ${cands.length})")
    } finally graft.Staging.deleteRecursively(root)
  }
}
