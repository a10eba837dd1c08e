package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RankSelect must agree value-for-value with the sort-based rank
  * selection it replaces — on real data, on tie-heavy data, on constant
  * groups, and on groups smaller than the bucket count.
  */
class RankSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** the naive formulation the kernel replaces: one partitioned sort */
  private def sortBased(in: DataFrame, g: String, v: String,
                        ranks: Seq[(String, String)]): Seq[(String, String, Double, Long)] = {
    val ranked = in
      .withColumn("rn", row_number().over(Window.partitionBy(col(g)).orderBy(col(v).asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(g))))
    ranks
      .flatMap { case (l, kSql) =>
        ranked
          .where(col("rn") === expr(kSql))
          .select(col(g).cast("string"), lit(l), col(v).cast("double"), col("n"))
          .as[(String, String, Double, Long)]
          .collect()
      }
      .sorted
  }

  private def kernel(in: DataFrame, g: String, v: String,
                     ranks: Seq[(String, String)], buckets: Int = 1024): Seq[(String, String, Double, Long)] =
    RankSelect
      .selectRanks(in, g, v, ranks, buckets)
      .select(col(g).cast("string"), col("label"), col(v).cast("double"), col("n"))
      .as[(String, String, Double, Long)]
      .collect()
      .toSeq
      .sorted

  private val medianRanks = Seq("lo" -> "(n + 1) div 2", "hi" -> "(n + 2) div 2")
  private val gridRanks = Seq(
    "p25" -> "(n + 3) div 4",
    "p50" -> "(n + 1) div 2",
    "p75" -> "(3 * n + 3) div 4",
    "p90" -> "(9 * n + 9) div 10")

  test("matches the sort-based selection on the orders fact (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val j = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("v"))
    assert(kernel(j, "seg", "v", gridRanks) === sortBased(j, "seg", "v", gridRanks))
  }

  test("tie-heavy data: every value duplicated many times across buckets") {
    val df = (1 to 2000)
      .map(i => (s"g${i % 3}", (i % 7).toDouble))
      .toDF("g", "v")
    assert(kernel(df, "g", "v", gridRanks, buckets = 16) ===
      sortBased(df, "g", "v", gridRanks))
  }

  test("constant group degenerates to one bucket but stays exact") {
    val df = ((1 to 100).map(i => ("c", 42.0)) ++ (1 to 50).map(i => ("m", i.toDouble)))
      .toDF("g", "v")
    assert(kernel(df, "g", "v", medianRanks, buckets = 8) ===
      sortBased(df, "g", "v", medianRanks))
  }

  test("single-row and two-row groups") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 9.0)).toDF("g", "v")
    assert(kernel(df, "g", "v", medianRanks) === sortBased(df, "g", "v", medianRanks))
  }

  test("negative and fractional values bucket monotonically") {
    val df = (1 to 999).map(i => ("x", math.sin(i.toDouble) * 1e6 - 500.0)).toDF("g", "v")
    assert(kernel(df, "g", "v", gridRanks, buckets = 64) ===
      sortBased(df, "g", "v", gridRanks))
  }

  /** low skewFloor so the recursion triggers at spec scale */
  private def skewKernel(in: DataFrame, ranks: Seq[(String, String)]): Seq[(String, String, Double, Long)] =
    RankSelect
      .selectRanks(in, "g", "v", ranks, buckets = 1024, skewFloor = 32L)
      .select(col("g").cast("string"), col("label"), col("v").cast("double"), col("n"))
      .as[(String, String, Double, Long)]
      .collect()
      .toSeq
      .sorted

  test("99%-constant distribution recurses instead of sorting the heavy bucket") {
    // 5000 copies of one value + 50 outliers: the constant bucket holds
    // ~99% of the group — the single-task-sort regression the recursion
    // exists to prevent. The refined bucket is all-equal, so the
    // recursion answers it directly without any sort.
    val df = ((1 to 5000).map(_ => ("g1", 100.0)) ++
      (1 to 50).map(i => ("g1", i * 37.0)) ++
      (1 to 200).map(i => ("g2", i.toDouble)))
      .toDF("g", "v")
    val plan = RankSelect
      .selectRanks(df, "g", "v", gridRanks, buckets = 1024, skewFloor = 32L)
    assert(plan.queryExecution.analyzed.toString.contains("Union"),
      "the skewed target must route through the refinement branch")
    assert(skewKernel(df, gridRanks) === sortBased(df, "g", "v", gridRanks))
  }

  test("narrow non-constant cluster refines by re-bucketing its own range") {
    // 5000 DISTINCT values packed into one top-level bucket (range
    // [0, 5e-4] inside a [0, 1000] domain) + spread outliers: the
    // refinement re-buckets the cluster's own narrow range, where the
    // values spread back out and resolve without a heavy sort.
    val df = ((1 to 5000).map(i => ("g1", i * 1e-7)) ++
      (1 to 50).map(i => ("g1", i * 20.0)))
      .toDF("g", "v")
    assert(skewKernel(df, gridRanks) === sortBased(df, "g", "v", gridRanks))
  }

  // ------------------------------------------------------------------
  // withGroupRanks: the FULL-ranking kernel (every row gets its global
  // rank) must agree row-for-row with the naive per-group windows it
  // replaces, on tie-heavy, continuous, constant, and tiny groups.

  private def naiveRanks(df: DataFrame): Seq[(String, Long, Long, Long, Long, Long)] =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)))
      .withColumn("rk", rank().over(Window.partitionBy(col("g")).orderBy(col("v").asc)))
      .withColumn("t", count(lit(1)).over(Window.partitionBy(col("g"), col("v"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("id"), col("rn").cast("long"), col("rk").cast("long"),
        col("t"), col("n"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted

  private def kernelRanks(df: DataFrame, buckets: Int): Seq[(String, Long, Long, Long, Long, Long)] =
    RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"), buckets = buckets)
      .select(col("g"), col("id"), col("__rk_rn"), col("__rk_rank"),
        col("__rk_ties"), col("__rk_n"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("withGroupRanks reproduces the naive rank/ties/row_number windows on tie-heavy data") {
    // 11 distinct values across 4 buckets: ties inside buckets AND
    // multiple values per bucket, three groups of different sizes
    val df = (1 to 3000).map(i => (s"g${i % 3}", (i % 11).toDouble, i.toLong))
      .toDF("g", "v", "id")
    assert(kernelRanks(df, buckets = 4) === naiveRanks(df))
  }

  test("withGroupRanks on continuous values, constant groups, and tiny groups") {
    val df = ((1 to 999).map(i => ("x", math.sin(i.toDouble) * 1e6, i.toLong)) ++
      (1 to 100).map(i => ("c", 42.0, 10000L + i)) ++
      Seq(("s1", 5.0, 1L), ("s2", 1.0, 2L), ("s2", 9.0, 3L)))
      .toDF("g", "v", "id")
    assert(kernelRanks(df, buckets = 64) === naiveRanks(df))
  }

  test("withGroupRanks matches the naive windows on the orders fact (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"),
        col("o_orderkey").as("id"))
    assert(kernelRanks(df, buckets = 1024) === naiveRanks(df))
  }

  test("ntileSql matches the ntile() window for awkward group sizes") {
    for (n <- Seq(1, 3, 7, 10, 11, 99, 100, 101, 1007)) {
      val df = (1 to n).map(i => ("g", (i % 13).toDouble, i.toLong)).toDF("g", "v", "id")
      val naive = df.withColumn("dd", ntile(10).over(
          Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
        .select(col("id"), col("dd")).as[(Long, Int)].collect().toSeq.sorted
      val got = RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"), buckets = 8)
        .withColumn("dd", expr(RankSelect.ntileSql(10)))
        .select(col("id"), col("dd")).as[(Long, Int)].collect().toSeq.sorted
      assert(got === naive, s"n = $n")
    }
  }

  test("withGroupRanks windows never partition on the group alone") {
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val plan = RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"))
      .queryExecution.executedPlan.toString
    val counts = graft.tools.PlanAudit.windowPartCounts(plan)
    assert(counts.nonEmpty && counts.forall(_ >= 2),
      s"window partition column counts: $counts")
  }

  test("group-cardinality dispatch: the window path above maxKernelGroups matches the kernel") {
    // 40 groups: kernel under the default threshold, plain window when the
    // threshold is forced below 40 — same names, same order, same types,
    // same rows, and the window path must NOT build the offsets broadcast
    val df = (1 to 3000).map(i => (s"g${i % 40}", (i % 11).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val viaKernel = RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"),
      buckets = 16, maxKernelGroups = 512)
    val viaWindow = RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"),
      buckets = 16, maxKernelGroups = 8)
    assert(viaWindow.columns.toSeq === viaKernel.columns.toSeq)
    assert(viaWindow.schema.map(f => f.name -> f.dataType) ===
      viaKernel.schema.map(f => f.name -> f.dataType))
    def rows(d: DataFrame) = d
      .select(col("g"), col("id"), col("__rk_rn"), col("__rk_rank"),
        col("__rk_ties"), col("__rk_n"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(rows(viaWindow) === rows(viaKernel))
    assert(!viaWindow.queryExecution.executedPlan.toString.contains("__rk_off"),
      "the window path must not build the bucket-offsets relation")
  }

  test("selectRanks dispatches to the window arm above maxKernelGroups with identical results") {
    val df = (1 to 4000).map(i => (s"g${i % 60}", (i % 17).toDouble)).toDF("g", "v")
    def sel(maxG: Long) = RankSelect
      .selectRanks(df, "g", "v", gridRanks, buckets = 16, maxKernelGroups = maxG)
    val viaKernel = sel(512)
    val viaWindow = sel(8)
    assert(!viaWindow.queryExecution.executedPlan.toString.contains("__rs_b"),
      "the window arm must not build the bucket machinery")
    def rows(d: DataFrame) = d
      .select(col("g"), col("label"), col("v").cast("double"), col("n"))
      .as[(String, String, Double, Long)].collect().toSeq.sorted
    assert(rows(viaWindow) === rows(viaKernel))
    assert(rows(viaWindow) === sortBased(df, "g", "v", gridRanks))
  }

  test("null v raises on every path instead of silently dropping rows") {
    val df = Seq(("a", Option(1.0), 1L), ("a", Option.empty[Double], 2L), ("b", Option(3.0), 3L))
      .toDF("g", "v", "id")
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).mkString("\n")
    val viaKernel = intercept[Throwable] {
      RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id")).collect()
    }
    assert(messageChain(viaKernel).contains("non-null contract"))
    val viaWindow = intercept[Throwable] {
      RankSelect.withGroupRanks(df, "g", "v", tieBreak = Seq("id"), maxKernelGroups = 1).collect()
    }
    assert(messageChain(viaWindow).contains("non-null contract"))
    val viaSelect = intercept[Throwable] {
      RankSelect.selectRanks(df, "g", "v", medianRanks).collect()
    }
    assert(messageChain(viaSelect).contains("non-null contract"))
  }

  test("nested clusters exhaust the recursion depth and fall back to a bounded sort") {
    // three nesting levels, each keeping >16x the even-split share in
    // one bucket of the level below, so depth 2 runs out and the final
    // residue resolves through the single-task fallback — by then
    // bounded to the innermost cluster, not the group
    val df = ((1 to 1500).map(i => ("g1", 0.25 + i * 1e-13)) ++
      (1 to 800).map(i => ("g1", 0.25 + i * 1e-9)) ++
      (1 to 500).map(i => ("g1", 0.25 + i * 1e-5)) ++
      (1 to 200).map(i => ("g1", i * 5.0)))
      .toDF("g", "v")
    assert(skewKernel(df, medianRanks) === sortBased(df, "g", "v", medianRanks))
  }
}
