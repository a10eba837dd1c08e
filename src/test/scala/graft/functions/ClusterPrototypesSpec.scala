package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derivable q159 case: orthogonal-axis centroids and two extra
  * vectors with known nearest centroids.
  */
class ClusterPrototypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q159: assignment by cosine argmax; both-end ranks in 2-member clusters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_proto_").toString
    // 16 seeded centroids on distinct axes of a 16-dim space, plus two
    // extra vectors: vec 16 along axis 3 (scaled — cosine ignores
    // scale), vec 17 mostly axis 5 with a small axis-0 component.
    def axis(i: Int, scale: Float): Array[Float] = {
      val a = Array.fill(16)(0f); a(i) = scale; a
    }
    val v17 = { val a = Array.fill(16)(0f); a(5) = 1f; a(0) = 0.1f; a }
    val rows =
      (0 until 16).map(i => (i.toLong, axis(i, 1f), 0)) ++
        Seq((16L, axis(3, 7f), 0), (17L, v17, 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q159_cluster_prototypes")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getInt(4)))
    // every centroid assigns to itself (csim = 1, ties broken by cid)
    // => cluster 3 = {3, 16}, cluster 5 = {5, 17}, all others singletons
    // vec 16 is EXACTLY axis 3 so csim(16, c3) = 1.0 = csim(3, c3):
    // tie broken by vec_id => both orders are (3, 16)
    val c3 = out.filter(_._1 == 3L)
    assert(c3.toSet === Set(
      (3L, 3L, "proto", 1), (3L, 16L, "proto", 2),
      (3L, 3L, "outlier", 1), (3L, 16L, "outlier", 2)), c3.mkString(","))
    // vec 17's csim to c5 < 1: proto = (5 then 17), outlier = (17 then 5)
    val c5 = out.filter(_._1 == 5L)
    assert(c5.toSet === Set(
      (5L, 5L, "proto", 1), (5L, 17L, "proto", 2),
      (5L, 17L, "outlier", 1), (5L, 5L, "outlier", 2)), c5.mkString(","))
    // singleton clusters: the centroid is rank-1 under both tags
    val c7 = out.filter(_._1 == 7L)
    assert(c7.toSet === Set((7L, 7L, "proto", 1), (7L, 7L, "outlier", 1)), c7.mkString(","))
    // 16 clusters, nothing assigned anywhere else
    assert(out.map(_._1).distinct.sorted === (0L until 16L).toArray)
  }

  test("q163: the label filter constrains the candidate bucket, not a post-filter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fann_").toString
    def axis(i: Int, scale: Float): Array[Float] = {
      val a = Array.fill(16)(0f); a(i) = scale; a
    }
    val v17 = { val a = Array.fill(16)(0f); a(3) = 1f; a(0) = 0.1f; a }
    // centroid labels alternate; vec 16 (label 1) and vec 17 (label 2)
    // both land in centroid 3's bucket (label(3) = 1)
    val rows =
      (0 until 16).map(i => (i.toLong, axis(i, 1f), i % 2)) ++
        Seq((16L, axis(3, 5f), 1), (17L, v17, 2))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q163_filtered_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    // vec 16 finds only its same-label bucket-mate (centroid 3)
    assert(byQ(16L).map(t => (t._2, t._3)).toSet === Set((3L, 1)))
    assert(byQ(3L).map(t => (t._2, t._3)).toSet === Set((16L, 1)))
    // vec 17 is ALONE in (cid 3, label 2): filtered search returns
    // nothing for it — the semantics post-filtering would silently
    // fake by returning a wrong-label neighbor
    assert(!byQ.contains(17L))
  }
}
