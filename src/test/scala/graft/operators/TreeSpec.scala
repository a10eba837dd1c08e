package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable cases for the histogram tree family (q223–q225): a
  * corpus whose target is an exact step function of ONE feature, so
  * every split gain, leaf value, and boosted residual is computable by
  * hand (squared loss + lr 0.5 ⇒ residuals halve per round and gains
  * shrink 4× per round).
  */
class TreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 8 rows: p_size ∈ {1,2} → y = 10 (4 rows), p_size ∈ {5,6} → y = 20
    * (4 rows); every other feature is constant (single bin → never
    * splittable). By hand: f0 = 15; the only valid splits are size ≤
    * {1,2,5}; thr=2 wins with gain (40²/4 + 80²/4) − 120²/8 = 200.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tree_").toString
    val rows = for {
      (sz, y) <- Seq(1 -> 10.0, 2 -> 10.0, 5 -> 20.0, 6 -> 20.0)
      i <- 0 to 1
    } yield (sz.toLong * 10 + i, i + 1, sz.toLong, 0.0, 0.0, y)
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey",
        "l_discount", "l_tax", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(lit("2025-03-15 00:00:00")))
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq(1, 2, 5, 6).map(sz => (sz.toLong, sz))
      .toDF("p_partkey", "p_size")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  /** every feature constant: no split exists anywhere in the corpus */
  private lazy val dirConst: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tree_const_").toString
    val rows = (0 until 8).map(i => (i.toLong, 1, 3L, 0.0, 0.0, 10.0 + i))
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey",
        "l_discount", "l_tax", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(lit("2025-03-15 00:00:00")))
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq((3L, 4)).toDF("p_partkey", "p_size")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  test("q281/q282: bag trees are internally consistent and apply is the bag average") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val trees = graft.SparkEntry.queries("q281_forest_train")(spark, d).collect()
    assert(trees.length === 9) // 3 bags × (root + left + right)
    val byBag = trees.groupBy(_.getAs[Int]("bag"))
    assert(byBag.keySet === Set(0, 1, 2))
    byBag.foreach { case (bag, ns) =>
      val m = ns.map(r => r.getAs[String]("node") -> r).toMap
      assert(m.keySet === Set("root", "left", "right"), s"bag $bag nodes")
      // the left child's split partitions exactly the root's left rows
      assert(m("left").getAs[Long]("n_left") + m("left").getAs[Long]("n_right")
        === m("root").getAs[Long]("n_left"), s"bag $bag left sizes")
      assert(m("right").getAs[Long]("n_left") + m("right").getAs[Long]("n_right")
        === m("root").getAs[Long]("n_right"), s"bag $bag right sizes")
      ns.foreach(r => assert(r.getAs[Double]("gain") >= 0.0))
    }
    // bags see different 80% slices: their row totals must differ from
    // the full corpus and the three trees must not be one tree copied
    val full = graft.SparkEntry.queries("q282_forest_apply")(spark, d).collect()
    assert(full.length === 6000)
    // recompute one row's prediction from the gated q281 model
    val row0 = full.minBy(r => (r.getAs[Number]("l_orderkey").longValue(),
      r.getAs[Number]("l_linenumber").longValue()))
    val obs = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.part(spark, d),
        org.apache.spark.sql.functions.col("l_partkey") ===
          org.apache.spark.sql.functions.col("p_partkey"))
      .where(org.apache.spark.sql.functions.col("l_orderkey") ===
          row0.getAs[Number]("l_orderkey").longValue() &&
        org.apache.spark.sql.functions.col("l_linenumber") ===
          row0.getAs[Number]("l_linenumber").longValue())
      .selectExpr("CAST(FLOOR(l_discount * 100 + 0.5) AS INT) AS discount",
        "CAST(MONTH(l_shipdate) AS INT) AS month",
        "CAST(p_size AS INT) AS size",
        "CAST(FLOOR(l_tax * 100 + 0.5) AS INT) AS tax")
      .head()
    def bin(name: String): Int = obs.getAs[Int](name)
    val expected = (0 to 2).map { b =>
      val m = byBag(b).map(r => r.getAs[String]("node") -> r).toMap
      def leaf(n: org.apache.spark.sql.Row): Double =
        if (bin(n.getAs[String]("feature")) <= n.getAs[Int]("thr"))
          n.getAs[Double]("left_mean") else n.getAs[Double]("right_mean")
      if (bin(m("root").getAs[String]("feature")) <= m("root").getAs[Int]("thr"))
        leaf(m("left")) else leaf(m("right"))
    }.sum / 3.0
    assert(math.abs(row0.getAs[Double]("pred") - expected) < 2e-6,
      s"pred ${row0.getAs[Double]("pred")} vs recomposed $expected")
  }

  test("q284 OOB error matches an independent recomputation from the gated forest") {
    import org.apache.spark.sql.functions.{col => c}
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    val got = graft.SparkEntry.queries("q284_forest_oob")(spark, d).head()
    val trees = graft.SparkEntry.queries("q281_forest_train")(spark, d).collect()
      .groupBy(_.getAs[Int]("bag"))
      .map { case (b, ns) => b -> ns.map(r => r.getAs[String]("node") -> r).toMap }
    val rows = graft.Tables.lineitem(spark, d)
      .join(graft.Tables.part(spark, d), c("l_partkey") === c("p_partkey"))
      .selectExpr("l_orderkey AS k", "CAST(l_linenumber AS BIGINT) AS ln",
        "CAST(l_quantity AS DOUBLE) AS y",
        "CAST(FLOOR(l_discount * 100 + 0.5) AS INT) AS discount",
        "CAST(MONTH(l_shipdate) AS INT) AS month",
        "CAST(p_size AS INT) AS size",
        "CAST(FLOOR(l_tax * 100 + 0.5) AS INT) AS tax")
      .collect()
    val oobRows = rows.flatMap { r =>
      val fold = ((r.getAs[Long]("k") + r.getAs[Long]("ln")) % 5).toInt
      if (fold >= 3) None
      else {
        val t = trees(fold)
        def bin(n: org.apache.spark.sql.Row): Int =
          r.getAs[Int](n.getAs[String]("feature"))
        def leaf(n: org.apache.spark.sql.Row): Double =
          if (bin(n) <= n.getAs[Int]("thr")) n.getAs[Double]("left_mean")
          else n.getAs[Double]("right_mean")
        val p = if (bin(t("root")) <= t("root").getAs[Int]("thr")) leaf(t("left"))
                else leaf(t("right"))
        Some((r.getAs[Double]("y"), p))
      }
    }
    assert(got.getAs[Long]("n_oob") === oobRows.length.toLong)
    val n = oobRows.length.toDouble
    val mse = oobRows.map { case (y, p) => (y - p) * (y - p) }.sum / n
    val ybar = oobRows.map(_._1).sum / n
    val base = oobRows.map { case (y, _) => (y - ybar) * (y - ybar) }.sum / n
    assert(math.abs(got.getAs[Double]("oob_mse") - mse) < 1e-5,
      s"oob_mse ${got.getAs[Double]("oob_mse")} vs $mse")
    assert(math.abs(got.getAs[Double]("base_mse") - base) < 1e-5)
    assert(math.abs(got.getAs[Double]("r2_oob") - (1.0 - mse / base)) < 1e-5)
  }

  test("q255: an unsplittable corpus yields an empty tree, not an exception") {
    val got = graft.SparkEntry.queries("q255_tree_depth2")(spark, dirConst)
    assert(got.collect().isEmpty)
    assert(got.columns.toSeq === Seq("node", "feature", "thr", "n_left",
      "n_right", "gain", "left_mean", "right_mean"))
  }

  test("q223: constant features are unsplittable; the step split is exact") {
    val got = graft.SparkEntry.queries("q223_tree_split")(spark, dir).collect()
    assert(got.length === 1, "only the stepped feature has >1 bin")
    val r = got.head
    assert(r.getAs[String]("feature") === "size")
    assert(r.getAs[Int]("thr") === 2)
    assert(r.getAs[Long]("n_left") === 4L && r.getAs[Long]("n_right") === 4L)
    assert(r.getAs[Double]("gain") === 200.0)
    assert(r.getAs[Double]("left_mean") === 10.0)
    assert(r.getAs[Double]("right_mean") === 20.0)
  }

  test("q224: residuals halve per round, gains shrink 4x, same split re-chosen") {
    val rounds = graft.SparkEntry.queries("q224_gbdt_train")(spark, dir)
      .orderBy(col("round")).collect()
    assert(rounds.map(_.getAs[String]("feature")).toSeq === Seq("size", "size", "size"))
    assert(rounds.map(_.getAs[Int]("thr")).toSeq === Seq(2, 2, 2))
    assert(rounds.map(_.getAs[Double]("gain")).toSeq === Seq(200.0, 50.0, 12.5))
    assert(rounds.map(_.getAs[Double]("leaf_left")).toSeq === Seq(-5.0, -2.5, -1.25))
    assert(rounds.map(_.getAs[Double]("leaf_right")).toSeq === Seq(5.0, 2.5, 1.25))
  }

  test("q236: maintained histogram state equals the one-shot split finder") {
    val oneShot = graft.SparkEntry.queries("q223_tree_split")(spark, dir)
      .collect().map(_.toSeq).toSet
    val merged = graft.SparkEntry.queries("q236_histogram_incremental")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(merged === oneShot)
  }

  test("q225: after 3 rounds every residual is the geometric tail ±0.625") {
    val resids = graft.SparkEntry.queries("q225_gbdt_score")(spark, dir)
      .select(col("resid")).collect().map(_.getDouble(0))
    assert(resids.length === 8)
    assert(resids.forall(r => math.abs(r) === 0.625), resids.mkString(","))
  }

  /** Depth-2 corpus: 16 rows, 2 per (size, discount) cell. y is a step
    * in size (10/20 left of size 2, 100/140 right) with a discount step
    * INSIDE each size leaf, so the root must pick size and each leaf
    * must pick discount. By hand (St = 1080, n = 16):
    *   root size≤2:      120²/8 + 960²/8 − 1080²/16          = 44100
    *   (size≤1: 14700, size≤5: 14700, discount≤0: 2500 — all lose)
    *   left leaf  disc≤0: 40²/4 + 80²/4 − 120²/8             = 200
    *   (size≤1 inside the leaf splits 60/60 → gain 0)
    *   right leaf disc≤0: 400²/4 + 560²/4 − 960²/8           = 3200
    *   (size≤5 inside the leaf splits 480/480 → gain 0)
    */
  private lazy val dir2: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tree2_").toString
    val combos = Seq(
      (1, 0.00, 10.0), (2, 0.00, 10.0), (1, 0.10, 20.0), (2, 0.10, 20.0),
      (5, 0.00, 100.0), (6, 0.00, 100.0), (5, 0.10, 140.0), (6, 0.10, 140.0))
    val rows = for {
      ((sz, disc, y), j) <- combos.zipWithIndex
      i <- 0 to 1
    } yield (j.toLong * 10 + i, i + 1, sz.toLong, disc, 0.0, y)
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey",
        "l_discount", "l_tax", "l_quantity")
      .withColumn("l_shipdate", to_timestamp(lit("2025-03-15 00:00:00")))
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq(1, 2, 5, 6).map(sz => (sz.toLong, sz))
      .toDF("p_partkey", "p_size")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  /** Boosted depth-2 hand-trace on the q255 fixture. By hand: f0 =
    * (4·10 + 4·20 + 4·100 + 4·140)/16 = 67.5. Round-1 residuals are
    * y − 67.5 ⇒ the same splits as q255 (gain is shift-invariant) with
    * residual leaf values (−57.5, −47.5, 32.5, 72.5). With lr = 0.5 and
    * an identical round-2 structure, every residual — and therefore
    * every gain (quadratic) and leaf value (linear) — halves per round:
    * round-2 gains are ¼ of round 1, leaf values ½.
    */
  test("q266: two boosted depth-2 trees — same structure, quarter gains, halved leaf values") {
    val rows = graft.SparkEntry.queries("q266_gbt_depth2_train")(spark, dir2)
      .collect().map(r => (r.getAs[Int]("round"), r.getAs[String]("node")) -> r).toMap
    assert(rows.keySet === Set(1 -> "root", 1 -> "left", 1 -> "right",
      2 -> "root", 2 -> "left", 2 -> "right"))
    for (m <- 1 to 2) {
      val sc = math.pow(2.0, 1 - m) // residual scale: 1, then 1/2
      val root = rows(m -> "root")
      assert(root.getAs[String]("feature") === "size")
      assert(root.getAs[Int]("thr") === 2)
      assert(root.getAs[Long]("n_left") === 8L && root.getAs[Long]("n_right") === 8L)
      assert(root.getAs[Double]("gain") === 44100.0 * sc * sc)
      assert(root.getAs[Double]("left_val") === -52.5 * sc)
      assert(root.getAs[Double]("right_val") === 52.5 * sc)
      val l = rows(m -> "left")
      assert(l.getAs[String]("feature") === "discount")
      assert(l.getAs[Int]("thr") === 0)
      assert(l.getAs[Long]("n_left") === 4L && l.getAs[Long]("n_right") === 4L)
      assert(l.getAs[Double]("gain") === 200.0 * sc * sc)
      assert(l.getAs[Double]("left_val") === -57.5 * sc)
      assert(l.getAs[Double]("right_val") === -47.5 * sc)
      val r = rows(m -> "right")
      assert(r.getAs[String]("feature") === "discount")
      assert(r.getAs[Int]("thr") === 0)
      assert(r.getAs[Double]("gain") === 3200.0 * sc * sc)
      assert(r.getAs[Double]("left_val") === 32.5 * sc)
      assert(r.getAs[Double]("right_val") === 72.5 * sc)
    }
  }

  test("q267: after 2 depth-2 rounds every residual is the quarter tail") {
    // identical structure per round + lr ½ ⇒ resid = r0·(1−½)² = r0/4
    val got = graft.SparkEntry.queries("q267_gbt_depth2_score")(spark, dir2)
      .collect()
    assert(got.length === 16)
    got.foreach { r =>
      val pred = r.getAs[Double]("pred")
      val resid = r.getAs[Double]("resid")
      val r0 = Map(10.0 -> -57.5, 20.0 -> -47.5, 100.0 -> 32.5, 140.0 -> 72.5)
      val y = pred + resid
      assert(resid === r0(y) / 4.0, s"y = $y")
    }
  }

  test("q255: depth-2 leaf-wise growth — root on size, both leaves on discount") {
    val got = graft.SparkEntry.queries("q255_tree_depth2")(spark, dir2)
      .collect().map(r => r.getAs[String]("node") -> r).toMap
    assert(got.keySet === Set("root", "left", "right"))
    val root = got("root")
    assert(root.getAs[String]("feature") === "size")
    assert(root.getAs[Int]("thr") === 2)
    assert(root.getAs[Long]("n_left") === 8L && root.getAs[Long]("n_right") === 8L)
    assert(root.getAs[Double]("gain") === 44100.0)
    assert(root.getAs[Double]("left_mean") === 15.0)
    assert(root.getAs[Double]("right_mean") === 120.0)
    val l = got("left")
    assert(l.getAs[String]("feature") === "discount")
    assert(l.getAs[Int]("thr") === 0)
    assert(l.getAs[Long]("n_left") === 4L && l.getAs[Long]("n_right") === 4L)
    assert(l.getAs[Double]("gain") === 200.0)
    assert(l.getAs[Double]("left_mean") === 10.0)
    assert(l.getAs[Double]("right_mean") === 20.0)
    val r = got("right")
    assert(r.getAs[String]("feature") === "discount")
    assert(r.getAs[Int]("thr") === 0)
    assert(r.getAs[Long]("n_left") === 4L && r.getAs[Long]("n_right") === 4L)
    assert(r.getAs[Double]("gain") === 3200.0)
    assert(r.getAs[Double]("left_mean") === 100.0)
    assert(r.getAs[Double]("right_mean") === 140.0)
  }
}
