package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q167 weighted PageRank: exact 3-iteration values on a hand-traceable
  * path graph, plus mass-conservation invariants on the corpus.
  */
class GraphQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q167: hand-computed ranks on the 1-2-3 path co-supply graph") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_").toString
    // part 10 shared by suppliers {1,2}, part 20 by {2,3} -> path graph
    // 1 <-> 2 <-> 3; supplier 2 splits its mass, 1 and 3 concentrate.
    Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L, 3L).toDF("s_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = graft.SparkEntry.queries("q167_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r0 = 1/3 each; after 3 damped iterations (worked by hand):
    //   ends   = .05 + .425·b2 = 0.2097291667
    //   center = .05 + 1.7·a2  = 0.5805416667
    assert(math.abs(got(1L) - 209729.1667) < 1e-3)
    assert(math.abs(got(3L) - 209729.1667) < 1e-3)
    assert(math.abs(got(2L) - 580541.6667) < 1e-3)
    // no dangling nodes in this graph: total mass conserved exactly
    assert(math.abs(got.values.sum - 1e6) < 1e-3)
  }

  test("q167: corpus invariants — every supplier ranked, positive mass, leaky total ≤ 1") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q167_pagerank")(spark, dir).cache()
    val n   = graft.Tables.supplier(spark, dir).count()
    assert(out.count() === n)
    assert(out.where(col("pr_ppm") <= 0.0).count() === 0L)
    val total = out.agg(sum(col("pr_ppm"))).head.getDouble(0)
    // teleport floor (0.15) and the leaky-PageRank ceiling (1.0)
    assert(total > 0.15e6 && total <= 1e6 + 1.0)
    out.unpersist()
  }

  test("q227: K4 of strong ties yields 4 triangles at the right lowest vertices") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tri_").toString
    // every K4 pair {1,2,3,4} shares TWO parts; the pendant pair
    // {4,5} shares ONE. Top-3 lists: each K4 node keeps its three
    // w=2 partners (node 4 drops the w=1 pendant), but node 5's own
    // top-3 re-adds {4,5} via the union — so the kNN graph is K4 +
    // pendant. Triangles {123},{124},{134},{234}; degrees 3,3,3,4,1,
    // so the (deg, id) orientation counts 3 at node 1 and 1 at node 2.
    val k4pairs = for {
      u <- 1L to 4L; v <- (u + 1) to 4L
    } yield (u, v)
    val rows = k4pairs.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq(0L, 1L).flatMap(c =>
        Seq((i.toLong * 10 + c, u), (i.toLong * 10 + c, v)))
    } ++ Seq((900L, 4L), (900L, 5L))
    rows.toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q227_triangle_count")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }

  test("q244: 3-core peels the pendant chain and keeps K4") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_kcore_").toString
    // K4 {1,2,3,4} (two shared parts per pair) + pendant CHAIN 4-5-6
    // (one shared part per link): peeling must cascade — node 6 falls
    // in round 1, node 5 only after 6 is gone; the 3-core is K4 with
    // every degree exactly 3.
    val k4pairs = for { u <- 1L to 4L; v <- (u + 1) to 4L } yield (u, v)
    val rows = k4pairs.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq(0L, 1L).flatMap(c =>
        Seq((i.toLong * 10 + c, u), (i.toLong * 10 + c, v)))
    } ++ Seq((900L, 4L), (900L, 5L), (910L, 5L), (910L, 6L))
    rows.toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q244_kcore")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("q243: hop distances on a 6-node path, seeds = lowest nation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_").toString
    // path graph 1-2-3-4-5-6 (consecutive suppliers share one part);
    // each node's co-supply partners are its path neighbors, so the
    // top-3 kNN graph IS the path. Seeds: nation 0 = {1}. K=4 rounds
    // reach nodes up to hop 4; node 6 (hop 5) stays absent.
    (1L to 5L).flatMap(u => Seq((u * 10, u), (u * 10, u + 1)))
      .toDF("l_partkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    (1L to 6L).map(k => (k, if (k == 1L) 0L else 1L))
      .toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.parquet(s"$dir/supplier.parquet")
    val got = graft.SparkEntry.queries("q243_bfs_hops")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }
}
