package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable q226 case: 8 well-separated 1-d groups of two points
  * each (10g − 1, 10g + 1), vec_ids laid out so the K lowest-id seeds
  * are one point per group. Lloyd then converges in one iteration to
  * centroid 10g per group and every final distance is exactly 1.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_kmeans_").toString
    val rows =
      (0 until 8).map(g => (g.toLong, Array((10f * g) - 1f))) ++
        (0 until 8).map(g => (8L + g, Array((10f * g) + 1f)))
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q226: separated groups recover exactly, every distance is 1") {
    val got = graft.SparkEntry.queries("q226_kmeans_lloyd")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cid"), r.getAs[Double]("dist2"))))
      .toMap
    assert(got.size === 16)
    (0 until 8).foreach { g =>
      assert(got(g.toLong) === ((g, 1.0)), s"low point of group $g")
      assert(got(8L + g) === ((g, 1.0)), s"high point of group $g")
    }
  }

  test("q230: hand-computed simplified silhouettes on the 8-group line") {
    // per cluster g the two points sit at distance a = 1 from their own
    // centroid 10g; the nearest other centroid is 9 away for inner-
    // facing points (sil = 8/9) and 11 away at the line's two outer
    // ends (sil = 10/11) — so clusters 0 and 7 average 89/99, the six
    // interior clusters average 8/9.
    val got = graft.SparkEntry.queries("q230_cluster_silhouette")(spark, dir)
      .collect()
      .map(r => r.getAs[Int]("cid") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("avg_sil"))))
      .toMap
    (0 until 8).foreach { g =>
      val expected = if (g == 0 || g == 7) 0.89899 else 0.888889
      assert(got(g) === ((2L, expected)), s"cluster $g")
    }
  }

  test("q259: a lowest-id-degenerate layout still recovers all groups via k-means-parallel seeds") {
    import spark.implicits._
    // ADVERSARIAL id layout for q226: the 8 lowest vec_ids all sit in
    // group 0, so lowest-id seeding starts all-in-one-region; the
    // d2-weighted oversampling must still spread seeds across the line
    val d = java.nio.file.Files.createTempDirectory("graft_kmeanspar_").toString
    val rows =
      (0 until 8).map(j => (j.toLong, Array(-1f + 0.01f * j))) ++ // group 0 clump
        (1 until 8).map(g => (8L + g, Array((10f * g) - 1f))) ++
        (1 until 8).map(g => (15L + g, Array((10f * g) + 1f)))
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val cids = graft.SparkEntry.queries("q259_kmeans_parallel_init")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cid")))
    // every one of the 8 spatial groups ends in its own cluster
    def group(id: Long): Int =
      if (id < 8) 0 else if (id < 16) (id - 8).toInt else (id - 15).toInt
    val byGroup = cids.groupBy { case (id, _) => group(id) }
      .map { case (g, xs) => g -> xs.map(_._2).toSet }
    assert(byGroup.keySet === (0 until 8).toSet)
    byGroup.foreach { case (g, cs) =>
      assert(cs.size === 1, s"group $g split across clusters $cs")
    }
    assert(byGroup.values.flatten.toSet.size === 8, "all 8 clusters used")
  }

  test("q259: seeded fit's SSE beats the lowest-id baseline on the real corpus") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    def sse(q: String): Double = graft.SparkEntry.queries(q)(spark, d)
      .agg(sum(col("dist2")).as("s")).head().getDouble(0)
    val baseline = sse("q226_kmeans_lloyd")
    val seeded = sse("q259_kmeans_parallel_init")
    assert(seeded <= baseline,
      s"k-means-parallel SSE $seeded should not exceed lowest-id SSE $baseline")
  }

  test("q229: separated classes classify the holdout perfectly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_rocchio_").toString
    // 20 vectors, label = vec_id % 2, coordinates exactly ±10 —
    // centroids land on ±10 and every holdout (vec_id % 5 = 0) vector
    // classifies to its own label at distance 0
    (0 until 20).map(i => (i.toLong, i % 2, Array(if (i % 2 == 0) -10f else 10f)))
      .toDF("vec_id", "label", "embedding")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val got = graft.SparkEntry.queries("q229_centroid_classifier")(spark, d)
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pred")) -> r.getAs[Long]("n"))
      .toMap
    // holdout ids 0,5,10,15 → labels 0,1,0,1 → two per class, all diagonal
    assert(got === Map((0, 0) -> 2L, (1, 1) -> 2L))
  }

  test("q228: maintained centroid state equals the one-shot classifier") {
    val corpus = "/root/testdata/sf0.001"
    val oneShot = graft.SparkEntry.queries("q229_centroid_classifier")(spark, corpus)
      .collect().map(_.toSeq).toSet
    val merged = graft.SparkEntry.queries("q228_centroid_incremental")(spark, corpus)
      .collect().map(_.toSeq).toSet
    assert(merged === oneShot)
  }

  test("q231: streamed micro-batch centroid maintenance equals the one-shot classifier") {
    val corpus = "/root/testdata/sf0.001"
    val oneShot = graft.SparkEntry.queries("q229_centroid_classifier")(spark, corpus)
      .collect().map(_.toSeq).toSet
    val streamed = graft.SparkEntry.queries("q231_stream_centroid_maintenance")(spark, corpus)
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot)
  }
}
