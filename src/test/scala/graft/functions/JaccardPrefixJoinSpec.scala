package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q169 prefix-filtered exact Jaccard join: hand-computed shingle
  * overlap, the t=0.8 cut on both sides of the boundary, and the
  * no-false-negative contract LSH banding cannot give.
  */
class JaccardPrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def words(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("q169: one-word edit on a 20-word doc qualifies (17/19); on a 10-word doc it misses (7/9)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ppj_").toString
    val a20 = words(20, "w")                                   // shingles 1..18
    val b20 = words(19, "w") + " zz"                           // last shingle differs
    val a10 = words(10, "v")
    val b10 = words(9, "v") + " qq"                            // 7/9 = 0.78 < 0.8
    val c   = words(20, "x")                                   // disjoint
    Seq((1L, a20), (2L, b20), (3L, a10), (4L, b10), (5L, c))
      .map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q169_jaccard_prefix_join")(spark, dir)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"), r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))).toSet
    assert(got === Set((1L, 2L, 17L, 19L)))
  }

  test("q169: exact duplicates always pair at J=1, and every emitted pair clears the integer cut") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ppj_").toString
    val t = words(30, "d")
    Seq((1L, t), (2L, t), (3L, words(30, "e")))
      .map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dup = graft.SparkEntry.queries("q169_jaccard_prefix_join")(spark, dir)
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"), r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
    assert(dup.toSet === Set((1L, 2L, 28L, 28L))) // 28 shingles, identical sets
    // corpus run: every pair satisfies the cut and the id ordering
    val corpus = graft.SparkEntry.queries("q169_jaccard_prefix_join")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb"), r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
    assert(corpus.forall { case (a, b, i, u) => a < b && i * 5 >= u * 4 && i <= u })
  }
}
