package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q178 int8 Gram matrix: hand-computed codes on a 2-dim corpus and the
  * triangle-shape invariants on the real embeddings.
  */
class GramMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("2-dim hand case: quantizer hits -128/127 and the products sum exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gram_").toString
    // per-dim lo=0, hi=1 -> code(0) = -128, code(1) = floor(255)-128 = 127
    Seq((1L, Seq(0f, 1f), 0), (2L, Seq(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("q178_gram_matrix")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val (a, b) = (-128L, 127L)
    assert(got === Map(
      (1, 1) -> (a * a + b * b),   // 32513
      (1, 2) -> (a * b + b * a),   // -32512
      (2, 2) -> (b * b + a * a)))
  }

  test("corpus: exactly the d(d+1)/2 upper triangle, positive diagonal") {
    val rows = graft.SparkEntry.queries("q178_gram_matrix")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val d = rows.map(_._1).max
    assert(rows.length === d * (d + 1) / 2)
    assert(rows.forall { case (i, j, _) => i <= j })
    assert(rows.filter { case (i, j, _) => i == j }.forall(_._3 > 0L))
  }
}
