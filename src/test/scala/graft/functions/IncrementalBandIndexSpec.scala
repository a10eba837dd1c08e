package graft.functions

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained band index behind incremental dedup (q182): the
  * O(batch) nightly-ingest story is only real if (a) appending a
  * batch's bands to the bucketed index table and reusing it lands on
  * exactly the from-scratch recompute, and (b) the classify join reads
  * the index without a corpus-sized exchange — batch-side broadcast by
  * default, bucket-layout SMJ (never a BNLJ, never an index-side
  * shuffle) when the batch outgrows broadcast.
  */
class IncrementalBandIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def bands: DataFrame = {
    graft.plans.VectorFunctions.register(spark)
    DedupQueries.mhBandsOf(DedupQueries.shingleDf(spark, d))
  }
  private val isBatch = col("doc_id") % 5 === 0

  /** Temp warehouse with the corpus-side index built by 3 sequential
    * bucketed appends; cleaned up by the caller via the returned root.
    */
  private def buildIndex(): (Warehouse, java.nio.file.Path) = {
    val root = java.nio.file.Files.createTempDirectory("graft_bandidx_spec_")
    val wh = new Warehouse(spark, root.toString)
    val b = bands
    for (g <- 0 until 3) {
      val ingest = b.where(!isBatch && pmod(col("doc_id"), lit(3)) === g)
      if (wh.exists("silver", "band_index"))
        wh.appendBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
      else
        wh.overwriteBucketed(ingest, "silver", "band_index", Seq("band", "band_key"))
    }
    (wh, root)
  }

  private def cleanup(wh: Warehouse, root: java.nio.file.Path): Unit = {
    wh.dropCatalogDb()
    graft.Staging.deleteRecursively(root)
  }

  test("index built by bucketed appends equals the from-scratch recompute") {
    val (wh, root) = buildIndex()
    try {
      val fromIndex = wh.load("silver", "band_index")
        .select(col("doc_id"), col("band"), col("band_key"))
        .collect().map(_.toSeq).toSet
      val recomputed = bands.where(!isBatch)
        .select(col("doc_id"), col("band"), col("band_key"))
        .collect().map(_.toSeq).toSet
      assert(fromIndex == recomputed,
        s"index rows ${fromIndex.size} vs recompute ${recomputed.size}")
    } finally cleanup(wh, root)
  }

  test("classify join broadcasts the batch side; the index side is never exchanged") {
    val (wh, root) = buildIndex()
    try {
      val q = CorpusBuildQueries.corpusDupDocs(
        wh.load("silver", "band_index"), bands.where(isBatch))
      q.collect() // finalize the adaptive plan
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("BroadcastHashJoin"),
        plan.linesIterator.take(25).mkString("\n"))
      // the only exchanges allowed are the batch-grain distinct and the
      // broadcast of the batch side — never a hash exchange on the
      // index's (band, band_key) stream
      assert(!plan.contains("Exchange hashpartitioning(band"),
        "index side must not be shuffled:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    } finally cleanup(wh, root)
  }

  test("with broadcast disabled the classify join degrades to a bucket-layout SMJ") {
    val (wh, root) = buildIndex()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = CorpusBuildQueries.corpusDupDocs(
        wh.load("silver", "band_index"), bands.where(isBatch))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"),
        plan.linesIterator.take(25).mkString("\n"))
      assert(!plan.contains("BroadcastNestedLoop"))
      assert(plan.contains("Bucketed: true"),
        "index side must read through its bucket layout:\n" +
          plan.linesIterator.take(40).mkString("\n"))
      // exactly ONE (band, band_key) exchange: the batch side shuffling
      // to meet the index table's bucketing — the corpus-scale side
      // contributes none
      val bandExchanges =
        "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected exactly the batch-side exchange, found $bandExchanges:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      cleanup(wh, root)
    }
  }

  test("q189 cycle: after the keeper write-back, re-classifying the batch yields no 'new'") {
    val (wh, root) = buildIndex()
    try {
      val b = bands
      val bBands = b.where(isBatch).localCheckpoint(true)
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .where(isBatch).select(col("doc_id"), col("source"))
      val pass1 = CorpusBuildQueries.classifyAgainstIndex(
        wh.load("silver", "band_index"), bBands, docs)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val keepers = pass1.collect { case (id, "new") => id }.toSet
      assert(keepers.nonEmpty)
      import spark.implicits._
      wh.appendBucketed(
        bBands.join(broadcast(keepers.toSeq.toDF("doc_id")), "doc_id")
          .select(col("doc_id"), col("band"), col("band_key")),
        "silver", "band_index", Seq("band", "band_key"))
      val pass2 = CorpusBuildQueries.classifyAgainstIndex(
        wh.load("silver", "band_index"), bBands, docs)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      // every accepted keeper's own bands are now indexed, so it must
      // re-classify as a corpus duplicate — and nothing can be 'new'
      keepers.foreach { id =>
        assert(pass2(id) == "dup_of_corpus", s"doc $id: ${pass2(id)}")
      }
      assert(!pass2.values.exists(_ == "new"))
    } finally cleanup(wh, root)
  }

  test("row-wise banding (the streaming q192 path) equals the aggregated banding") {
    graft.plans.VectorFunctions.register(spark)
    val rowwise = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        explode(DedupQueries.mhBandsRowwise(col("text"))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
      .collect().map(_.toSeq).toSet
    val aggregated = bands.collect().map(_.toSeq).toSet
    assert(rowwise == aggregated,
      s"rowwise ${rowwise.size} vs aggregated ${aggregated.size} band rows")
  }

  test("q182 (index path) computes exactly q144's (recompute path) classification") {
    val q144 = graft.SparkEntry.queries("q144_incremental_dedup")(spark, d)
      .collect().map(_.toSeq).toSet
    val q182 = graft.SparkEntry.queries("q182_band_index_incremental")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(q182 == q144)
  }
}
