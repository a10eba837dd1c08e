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
}
