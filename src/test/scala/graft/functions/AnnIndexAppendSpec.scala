package graft.functions

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained ANN index behind q187: posting lists stored as a
  * cid-bucketed warehouse table built by O(ingest) appends must equal
  * the from-scratch assignment, the search must read the index without
  * shuffling it, and the staged path must land on exactly the
  * recompute path's neighbors (floats round-trip parquet bit-exact).
  */
class AnnIndexAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private val isBatch = col("vec_id") % 5 === 0

  private def normed: DataFrame = {
    graft.plans.VectorFunctions.register(spark)
    graft.Tables.embeddings(spark, d)
      .withColumn("nrm",
        sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
      .where(col("nrm") > 0)
  }

  private def centroids(e: DataFrame): DataFrame =
    e.where(!isBatch && col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))

  private def buildIndex(): (Warehouse, java.nio.file.Path) = {
    val root = java.nio.file.Files.createTempDirectory("graft_annidx_spec_")
    val wh = new Warehouse(spark, root.toString)
    val e = normed
    val cent = centroids(e)
    for (g <- 0 until 3) {
      val ingest = SimilarityQueries.assignToCentroids(
        e.where(!isBatch && pmod(col("vec_id"), lit(3)) === g), cent)
      if (wh.exists("silver", "ann_postings"))
        wh.appendBucketed(ingest, "silver", "ann_postings", Seq("cid"), buckets = 16)
      else
        wh.overwriteBucketed(ingest, "silver", "ann_postings", Seq("cid"), buckets = 16)
    }
    (wh, root)
  }

  private def cleanup(wh: Warehouse, root: java.nio.file.Path): Unit = {
    wh.dropCatalogDb()
    graft.Staging.deleteRecursively(root)
  }

  test("appended posting lists equal the from-scratch corpus assignment") {
    val (wh, root) = buildIndex()
    try {
      val fromIndex = wh.load("silver", "ann_postings")
        .select(col("cid"), col("vec_id"), col("embedding"), col("nrm"))
        .collect().map(_.toSeq).toSet
      val e = normed
      val recomputed = SimilarityQueries
        .assignToCentroids(e.where(!isBatch), centroids(e))
        .collect().map(_.toSeq).toSet
      assert(fromIndex == recomputed,
        s"index ${fromIndex.size} vs recompute ${recomputed.size} rows")
    } finally cleanup(wh, root)
  }

  test("search streams the index: no exchange on the posting side before the join") {
    val (wh, root) = buildIndex()
    try {
      val e = normed
      val q = SimilarityQueries.annSearch(
        wh.load("silver", "ann_postings"),
        SimilarityQueries.assignToCentroids(e.where(isBatch), centroids(e)))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the tiny assigned-query side broadcasts; the corpus-scale
      // posting table must never be hash-exchanged on cid
      assert(plan.contains("BroadcastHashJoin"),
        plan.linesIterator.take(25).mkString("\n"))
      assert(!plan.contains("Exchange hashpartitioning(cid"),
        "posting side must not be shuffled:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    } finally cleanup(wh, root)
  }

  test("q187 (staged index) equals the pure recompute search") {
    val e = normed
    val recompute = SimilarityQueries.annSearch(
      SimilarityQueries.assignToCentroids(e.where(!isBatch), centroids(e)),
      SimilarityQueries.assignToCentroidsTopK(e.where(isBatch), centroids(e), 4))
      .collect().map(_.toSeq).toSet
    val staged = graft.SparkEntry.queries("q187_ann_index_append")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(staged == recompute)
  }
}
