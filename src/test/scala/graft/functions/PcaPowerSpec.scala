package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q179 power iteration: convergence to the dominant axis on a
  * hand-built 2-dim Gram, unit norm, and Rayleigh bounds on the corpus.
  */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The hand corpus's Gram is [[32514, 1], [1, 48642]]; this computes
    * the exact PowerIters-step state both q179 and q180 assert against.
    */
  private def handIteration(): (Array[Double], Double) = {
    val g = Array(Array(32514.0, 1.0), Array(1.0, 48642.0))
    var v = Array(1.0 / math.sqrt(2.0), 1.0 / math.sqrt(2.0))
    for (_ <- 1 to 3) {
      val u = Array(g(0)(0) * v(0) + g(0)(1) * v(1), g(1)(0) * v(0) + g(1)(1) * v(1))
      val n = math.sqrt(u(0) * u(0) + u(1) * u(1))
      v = u.map(_ / n)
    }
    val gv  = Array(g(0)(0) * v(0) + g(0)(1) * v(1), g(1)(0) * v(0) + g(1)(1) * v(1))
    val lam = v(0) * gv(0) + v(1) * gv(1)
    (v, lam)
  }

  test("2-dim hand case: iteration locks onto the dominant diagonal axis") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_").toString
    // codes: dim1 {0, 0.5, 1} -> {-128, -1, 127}; dim2 {1, 0, 1} ->
    // {127, -128, 127}. Gram = [[32514, 1], [1, 48642]] — dominant
    // eigenpair ~ (e2, 48642); the off-diagonal 1 keeps the uniform
    // start non-orthogonal so the iteration converges.
    Seq((1L, Seq(0f, 1f), 0), (2L, Seq(0.5f, 0f), 0), (3L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("q179_pca_power")(spark, dir)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // expected state after exactly 3 damped iterations, computed from
    // the hand-known Gram (independent of the engine pipeline)
    val (v, lam) = handIteration()
    assert(math.abs(got(1)._1 - v(0)) < 1e-5, s"got $got, want v=${v.toSeq}")
    assert(math.abs(got(2)._1 - v(1)) < 1e-5)
    assert(math.abs(got(1)._2 - lam) < 1e-3)
    // and the iteration is genuinely moving toward the dominant axis
    assert(math.abs(got(2)._1) > math.abs(got(1)._1) * 3)
  }

  test("q180: projections equal codes . component on the hand corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pcap_").toString
    Seq((1L, Seq(0f, 1f), 0), (2L, Seq(0.5f, 0f), 0), (3L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // same 3-iteration component as the q179 hand case
    val (v, _) = handIteration()
    val codes = Map(1L -> (-128.0, 127.0), 2L -> (-1.0, -128.0), 3L -> (127.0, 127.0))
    val got = graft.SparkEntry.queries("q180_pca_project")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    codes.foreach { case (id, (c1, c2)) =>
      assert(math.abs(got(id) - (c1 * v(0) + c2 * v(1))) < 1e-5, s"vec $id: ${got(id)}")
    }
  }

  test("q181: explained + residual = 1; hand trace and ratio match the known Gram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_").toString
    Seq((1L, Seq(0f, 1f), 0), (2L, Seq(0.5f, 0f), 0), (3L, Seq(1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val r = graft.SparkEntry.queries("q181_explained_variance")(spark, dir).head()
    val (_, lam) = handIteration()
    assert(r.getAs[Long]("trace") === 32514L + 48642L)
    assert(math.abs(r.getAs[Double]("eigenvalue") - lam) < 1e-3)
    assert(math.abs(r.getAs[Double]("explained_ratio") - lam / 81156.0) < 1e-5)
    assert(math.abs(
      r.getAs[Double]("explained_ratio") + r.getAs[Double]("residual_ratio") - 1.0) < 2e-6)
  }

  test("q183: component 1 is exactly q179's; all 4 unit-norm, eigenvalues decreasing, near-orthogonal") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q183_pca_components_k")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length === 4 * 64)
    val byComp = rows.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.sortBy(_._2).map(_._3), rs.head._4)
    }
    // component 1 must be bit-identical to the single-component q179
    val q179 = graft.SparkEntry.queries("q179_pca_power")(spark, d)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(byComp(1)._1.sameElements(q179))
    // unit norms
    for (c <- 1 to 4) {
      val n2 = byComp(c)._1.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-4, s"comp $c norm2=$n2")
    }
    // deflation removes the dominant part: eigenvalues strictly decrease
    val lams = (1 to 4).map(byComp(_)._2)
    assert(lams.zip(lams.tail).forall { case (a, b) => a > b },
      s"eigenvalues not decreasing: $lams")
    // Gram-Schmidt makes the components EXACTLY orthogonal to fp (the
    // 1e-5 slack is the ROUND(…,6) on the reported coordinates)
    for (a <- 1 to 4; b <- a + 1 to 4) {
      val dot = byComp(a)._1.zip(byComp(b)._1).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-4, s"components $a,$b dot=$dot")
    }
  }

  test("q184: p1 equals q180's single-component projection for every vector") {
    val d = "/root/testdata/sf0.001"
    val p1 = graft.SparkEntry.queries("q184_pca_project_k")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q180 = graft.SparkEntry.queries("q180_pca_project")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p1 === q180)
  }

  test("q185: curve is increasing, consistent with q181 at comp 1, residual+cum = 1") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q185_explained_variance_curve")(spark, d)
      .collect().sortBy(_.getInt(0))
    assert(rows.length === 4)
    val q181 = graft.SparkEntry.queries("q181_explained_variance")(spark, d).head()
    assert(rows(0).getAs[Double]("eigenvalue") === q181.getAs[Double]("eigenvalue"))
    assert(rows(0).getAs[Double]("cum_explained_ratio") === q181.getAs[Double]("explained_ratio"))
    val cums = rows.map(_.getAs[Double]("cum_explained_ratio"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a }, cums.toSeq.toString)
    assert(cums.last <= 1.0 + 1e-6)
    rows.foreach { r =>
      assert(math.abs(
        r.getAs[Double]("cum_explained_ratio") + r.getAs[Double]("residual_ratio") - 1.0) < 2e-6)
    }
  }

  test("corpus: unit norm, one positive eigenvalue bounded by the Gram trace") {
    val d    = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q179_pca_power")(spark, d)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length === 64)
    val norm2 = rows.map(t => t._2 * t._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-4)
    val eig = rows.map(_._3).distinct
    assert(eig.length === 1 && eig.head > 0.0)
    val trace = graft.SparkEntry.queries("q178_gram_matrix")(spark, d)
      .collect().filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    assert(eig.head <= trace.toDouble + 1e-6) // lambda_max <= tr(G) for PSD G
  }
}
