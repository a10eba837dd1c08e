package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable cases for the distributed OLS family (q204–q207):
  * on a noise-free corpus the normal equations must recover the exact
  * generating coefficients (a property checkable without any tolerance
  * juggling: the design is integer-valued and tiny), diagnostics must
  * read a perfect fit, and the maintained-moments refit must equal the
  * one-shot fit row for row.
  */
class RegressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two brands, each with y generated EXACTLY on a plane:
    *   brand A: y = 2 + 3·x1 + 0.5·x2
    *   brand B: y = 10 − 1·x1 + 0.25·x2
    * x-designs are nonsingular (x1, x2 vary independently).
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ols_").toString
    val rowsA = for {
      (x1, i) <- Seq(0.0, 1.0, 2.0, 3.0).zipWithIndex
      (x2, j) <- Seq(4.0, 8.0, 16.0).zipWithIndex
    } yield (i * 10L + j, i * 3 + j + 1, 1L + i, 2.0 + 3.0 * x1 + 0.5 * x2, x1, x2)
    val rowsB = for {
      (x1, i) <- Seq(0.0, 2.0, 5.0).zipWithIndex
      (x2, j) <- Seq(1.0, 3.0, 9.0, 27.0).zipWithIndex
    } yield (1000L + i * 10L + j, i * 4 + j + 1, 100L + i, 10.0 - 1.0 * x1 + 0.25 * x2, x1, x2)
    // partkey encodes (brand, x2); part carries brand + retailprice=x2,
    // lineitem carries discount=x1 and quantity=y
    val li = (rowsA ++ rowsB).map { case (ok, ln, pk0, y, x1, x2) =>
      (ok, ln, pk0 * 100 + x2.toLong, x1, y)
    }.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_discount", "l_quantity")
    li.coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val parts = (rowsA.map { case (_, _, pk0, _, _, x2) => (pk0 * 100 + x2.toLong, "BrandA", x2) } ++
      rowsB.map { case (_, _, pk0, _, _, x2) => (pk0 * 100 + x2.toLong, "BrandB", x2) })
      .distinct
      .toDF("p_partkey", "p_brand", "p_retailprice")
    parts.coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  test("q204: noise-free corpus recovers the exact generating plane per brand") {
    val got = graft.SparkEntry.queries("q204_ols_fit")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("BrandA") === ((2.0, 3.0, 0.5)))
    assert(got("BrandB") === ((10.0, -1.0, 0.25)))
  }

  test("q206: diagnostics read a perfect fit (R²=1, RMSE=0)") {
    graft.SparkEntry.queries("q206_ols_diagnostics")(spark, dir)
      .collect()
      .foreach { r =>
        assert(r.getDouble(2) === 1.0, s"r2 for ${r.getString(0)}")
        assert(r.getDouble(3) === 0.0, s"rmse for ${r.getString(0)}")
      }
  }

  test("q205: every residual is zero on the noise-free corpus") {
    val bad = graft.SparkEntry.queries("q205_ols_score")(spark, dir)
      .where(abs(col("resid")) > 1e-9)
      .count()
    assert(bad === 0L)
  }

  test("q214: 4-fold CV reads zero error on the noise-free corpus") {
    graft.SparkEntry.queries("q214_ols_cv")(spark, dir)
      .collect()
      .foreach(r => assert(r.getDouble(2) === 0.0, s"cv_rmse for ${r.getString(0)}"))
  }

  test("q213: ridge fits the degenerate group OLS cannot") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ridge_").toString
    // x1 is CONSTANT zero → the OLS normal matrix is singular (det = 0,
    // coefficients 0/0 = NaN); ridge's λ on the diagonal keeps the
    // system positive definite
    val rows = for ((x2, j) <- Seq(1.0, 2.0, 4.0, 8.0).zipWithIndex)
      yield (j.toLong, j + 1, 500L + x2.toLong, 0.0, 3.0 + 2.0 * x2)
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_discount", "l_quantity")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq(1.0, 2.0, 4.0, 8.0).map(x2 => (500L + x2.toLong, "BrandC", x2))
      .toDF("p_partkey", "p_brand", "p_retailprice")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    // ANSI mode (the session default) surfaces the singular system as
    // a loud DIVIDE_BY_ZERO instead of silent NaNs — assert exactly that
    val ex = intercept[Exception] {
      graft.SparkEntry.queries("q204_ols_fit")(spark, d).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"), ex.getMessage.take(200))
    val ridge = graft.SparkEntry.queries("q213_ridge_fit")(spark, d).head()
    Seq(2, 3, 4).foreach { i =>
      assert(!ridge.getDouble(i).isNaN && !ridge.getDouble(i).isInfinite,
        s"ridge coefficient $i")
    }
  }

  test("q216: streaming micro-batch moment maintenance equals the one-shot fit") {
    val oneShot = graft.SparkEntry.queries("q204_ols_fit")(spark, dir)
      .collect().map(_.toSeq).toSet
    val streamed = graft.SparkEntry.queries("q216_stream_model_maintenance")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot)
  }

  test("q217: unlearning erases exactly the k%97 rows and still recovers the plane") {
    // on the noise-free corpus only brand A's k=0 row matches the
    // erasure predicate; the surviving design still spans the plane,
    // so the refit recovers the exact coefficients with n reduced by 1
    val got = graft.SparkEntry.queries("q217_model_unlearning")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("BrandA") === ((11L, 2.0, 3.0, 0.5)))
    assert(got("BrandB") === ((12L, 10.0, -1.0, 0.25)))
  }

  test("q222: generated elimination recovers the exact 5-coefficient plane") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_gauss_").toString
    // y = 1 + 2·x1 + 0.5·x2 + 0.25·x3 + 4·x4 over a full factorial —
    // all binary fractions, nonsingular design
    val combos = for {
      x1 <- Seq(0.0, 1.0, 2.0); x2 <- Seq(1.0, 2.0)
      x3 <- Seq(1, 3); x4 <- Seq(0.0, 0.5)
    } yield (x1, x2, x3, x4)
    val li = combos.zipWithIndex.map { case ((x1, x2, x3, x4), i) =>
      (i.toLong, 1, x2.toLong * 10 + x3, x1, x4,
        1.0 + 2.0 * x1 + 0.5 * x2 + 0.25 * x3 + 4.0 * x4)
    }.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_discount", "l_tax", "l_quantity")
    li.coalesce(1).write.parquet(s"$d/lineitem.parquet")
    combos.map { case (_, x2, x3, _) => (x2.toLong * 10 + x3, "BrandG", x2, x3) }
      .distinct
      .toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    val r = graft.SparkEntry.queries("q222_ols_gauss_d4")(spark, d).head()
    assert(r.getAs[Long]("n") === 24L)
    assert((2 to 6).map(r.getDouble) === Seq(1.0, 2.0, 0.5, 0.25, 4.0))
  }

  test("q207: maintained-moments refit equals the one-shot fit row for row") {
    val oneShot = graft.SparkEntry.queries("q204_ols_fit")(spark, dir)
      .collect().map(_.toSeq).toSet
    val merged = graft.SparkEntry.queries("q207_ols_incremental")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(merged === oneShot)
  }

  test("q285: out-of-fold target encoding matches an independent recount") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val got = graft.SparkEntry.queries("q285_target_encode_oof")(spark, d).collect()
    assert(got.length === 125) // 25 brands × 5 folds
    // independent recount with plain ops
    val rows = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.part(spark, d), col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand AS brand", "CAST(l_quantity AS DOUBLE) AS y",
        "CAST((l_orderkey + l_linenumber) % 5 AS INT) AS fold")
      .collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Int]("fold"), r.getAs[Double]("y")))
    val gmean = rows.map(_._3).sum / rows.length
    got.foreach { r =>
      val (b, f) = (r.getAs[String]("brand"), r.getAs[Int]("fold"))
      val oof = rows.filter(x => x._1 == b && x._2 != f)
      val own = rows.count(x => x._1 == b && x._2 == f)
      assert(r.getAs[Long]("n") === own.toLong, s"($b,$f) n")
      val mean = oof.map(_._3).sum / oof.length
      assert(math.abs(r.getAs[Double]("oof_mean") - mean) < 1e-5, s"($b,$f) oof")
      val smooth = (oof.map(_._3).sum + 20.0 * gmean) / (oof.length + 20.0)
      assert(math.abs(r.getAs[Double]("te_smooth") - smooth) < 1e-5, s"($b,$f) smooth")
      // smoothing shrinks toward the global mean, never past it
      val (lo, hi) = (math.min(mean, gmean), math.max(mean, gmean))
      assert(r.getAs[Double]("te_smooth") >= lo - 1e-6 &&
        r.getAs[Double]("te_smooth") <= hi + 1e-6, s"($b,$f) bounds")
    }
  }
}
