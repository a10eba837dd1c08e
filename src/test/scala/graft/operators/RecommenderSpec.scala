package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q232/q233 ALS: the distributed pipeline must equal a transparent
  * local replication of the same arithmetic on a tiny dyadic corpus
  * (every input is an exact binary fraction with ≤10 decimal digits,
  * so decimal sums, double products, and the 2×2 solves are all
  * EXACT in any summation order — the local fold and the distributed
  * aggregate compute bit-identical doubles), plus structural
  * guarantees of the recommendation step on the real corpus.
  */
class RecommenderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Lambda = 0.25

  /** Local mirror of one ALS half-step over (solveKey, fixedKey, r)
    * triples — same moments, same ridge, same pinned 2×2 solve. Each
    * product is quantized to DECIMAL(38,10) before summation exactly
    * as the engine's `sum(expr.cast(dt))` does (factors stop being
    * dyadic after the first item solve, so this rounding is part of
    * the arithmetic being mirrored, not an approximation).
    */
  private def solveLocal(
      triples: Seq[(Long, Long, Double)],
      fixed: Map[Long, (Double, Double)]): Map[Long, (Double, Double)] = {
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    triples.groupBy(_._1).map { case (k, rs) =>
      val s11 = dsum(rs.map { case (_, fk, _) => val f = fixed(fk); f._1 * f._1 })
      val s12 = dsum(rs.map { case (_, fk, _) => val f = fixed(fk); f._1 * f._2 })
      val s22 = dsum(rs.map { case (_, fk, _) => val f = fixed(fk); f._2 * f._2 })
      val b1  = dsum(rs.map { case (_, fk, r) => r * fixed(fk)._1 })
      val b2  = dsum(rs.map { case (_, fk, r) => r * fixed(fk)._2 })
      val (a11, a12, a22) = (s11 + Lambda, s12, s22 + Lambda)
      val det = a11 * a22 - a12 * a12
      k -> (((b1 * a22 - b2 * a12) / det, (a11 * b2 - a12 * b1) / det))
    }
  }

  test("q232: distributed ALS equals the local replication on a dyadic corpus") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_als_").toString
    // items 3 (init f2 = 4/8) and 7 (init f2 = 1/8) — distinct inits;
    // ratings are small dyadics so every product/sum is exact
    val ratings = Seq((1L, 3L, 3.0), (1L, 7L, 1.0), (2L, 7L, 2.0))
    ratings.zipWithIndex.map { case ((u, i, r), k) => (k.toLong, i, r) }
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    ratings.zipWithIndex.map { case ((u, _, _), k) => (k.toLong, u) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$d/orders.parquet")

    val q0 = Map(3L -> ((1.0, 0.5)), 7L -> ((1.0, 0.125)))
    val ui = ratings.map { case (u, i, r) => (u, i, r) }
    val iu = ratings.map { case (u, i, r) => (i, u, r) }
    val u1 = solveLocal(ui, q0)
    val q1 = solveLocal(iu, u1)
    val u2 = solveLocal(ui, q1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6

    val got = graft.SparkEntry.queries("q232_als_train")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("custkey") ->
        ((r.getAs[Double]("f1"), r.getAs[Double]("f2"))))
      .toMap
    assert(got.keySet === Set(1L, 2L))
    u2.foreach { case (u, (f1, f2)) =>
      assert(got(u) === ((r6(f1), r6(f2))), s"user $u")
    }
  }

  /** Local mirror of one RANK-4 half-step: the same DECIMAL(38,10)
    * moment quantization, the same λ diagonal, and the SAME generated
    * elimination program interpreted over plain doubles — so the
    * distributed Column interpretation is checked against an
    * independent execution of the identical op DAG.
    */
  private def solveLocalR4(
      triples: Seq[(Long, Long, Double)],
      fixed: Map[Long, Vector[Double]]): Map[Long, Vector[Double]] = {
    def dsum(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    triples.groupBy(_._1).map { case (k, rs) =>
      def mom(a: Int, b: Int) =
        dsum(rs.map { case (_, fk, _) => fixed(fk)(a) * fixed(fk)(b) })
      def rhs(a: Int) = dsum(rs.map { case (_, fk, r) => r * fixed(fk)(a) })
      val init = (for { i <- 0 to 3; j <- 0 to 4 } yield {
        val v =
          if (j == 4) rhs(i)
          else if (i == j) mom(i, i) + Lambda
          else mom(math.min(i, j), math.max(i, j))
        s"a_${i}_$j" -> v
      }).toMap
      val env = RegressionQueries.runProgram(
        RegressionQueries.eliminationProgram(3), init)
      k -> (0 to 3).map(t => env(s"b_$t")).toVector
    }
  }

  test("q256: distributed rank-4 ALS equals the local elimination replication") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_als4_").toString
    val ratings = Seq((1L, 3L, 3.0), (1L, 7L, 1.0), (2L, 7L, 2.0))
    ratings.zipWithIndex.map { case ((_, i, r), k) => (k.toLong, i, r) }
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    ratings.zipWithIndex.map { case ((u, _, _), k) => (k.toLong, u) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$d/orders.parquet")

    // init [1, (i%7+1)/8, (i%5+1)/8, (i%3+1)/8]: exact binary fractions
    val r0 = Map(
      3L -> Vector(1.0, 0.5, 0.5, 0.125),
      7L -> Vector(1.0, 0.125, 0.375, 0.25))
    val ui = ratings
    val iu = ratings.map { case (u, i, r) => (i, u, r) }
    val w1 = solveLocalR4(ui, r0)
    val r1 = solveLocalR4(iu, w1)
    val w2 = solveLocalR4(ui, r1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6

    val got = graft.SparkEntry.queries("q256_als_train_r4")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("custkey") ->
        (1 to 4).map(t => r.getAs[Double](s"f$t")).toVector)
      .toMap
    assert(got.keySet === Set(1L, 2L))
    w2.foreach { case (u, fs) =>
      assert(got(u) === fs.map(r6), s"user $u")
    }
  }

  test("q233: 3 novel recommendations per user, scores descending") {
    val corpus = "/root/testdata/sf0.001"
    val recs = graft.SparkEntry.queries("q233_als_recommend")(spark, corpus).cache()
    try {
      val perUser = recs.groupBy(col("custkey")).count()
        .where(col("count") =!= 3).count()
      assert(perUser === 0L, "every user gets exactly 3")
      // no recommended item was already purchased
      val rat = graft.Tables.lineitem(spark, corpus)
        .join(graft.Tables.orders(spark, corpus),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
        .distinct()
      assert(recs.join(rat, Seq("custkey", "partkey"), "left_semi").count() === 0L)
      // rank order matches score order within every user
      val bad = recs.as("a").join(recs.as("b"),
          col("a.custkey") === col("b.custkey") &&
            col("a.rank") < col("b.rank") && col("a.score") < col("b.score"))
        .count()
      assert(bad === 0L, "scores non-increasing in rank")
    } finally recs.unpersist()
  }

  test("q237: holdout eval covers exactly the evaluable users and finds real hits") {
    val corpus = "/root/testdata/sf0.001"
    val eval = graft.SparkEntry.queries("q237_als_eval")(spark, corpus)
      .collect().map(r => r.getAs[Long]("custkey") -> r.getAs[Int]("hit")).toMap
    // every evaluated user really has a held-out pair
    val rat = graft.Tables.lineitem(spark, corpus)
      .join(graft.Tables.orders(spark, corpus), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i")).count()
    val heldOutUsers = rat.where(pmod(col("u") + col("i"), lit(5)) === 0)
      .select(col("u")).distinct().collect().map(_.getLong(0)).toSet
    assert(eval.keySet.subsetOf(heldOutUsers))
    assert(eval.values.forall(h => h == 0 || h == 1))
    // the trained model beats "never": some held-out item lands in a top-3
    assert(eval.values.sum > 0, "at least one hit")
  }
}
