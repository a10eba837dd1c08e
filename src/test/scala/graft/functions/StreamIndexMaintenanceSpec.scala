package graft.functions

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming maintenance cycle behind q202: its claim is that
  * foreachBatch-over-micro-batches lands on exactly the state the
  * BATCH nightly cycle (q189's shape) produces when fed the same
  * slices in the same order — plus the cross-session cache lesson the
  * query taught: inside foreachBatch the batch frame belongs to the
  * micro-batch's session CLONE, and without [[Warehouse]]'s
  * cross-session refresh the warehouse session silently serves the
  * pre-append file listing (a frozen index) forever.
  */
class StreamIndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("streaming cycle state equals the batch-sequential replay") {
    val streamed = graft.SparkEntry
      .queries("q202_stream_index_maintenance")(spark, d)
      .collect().map(_.toSeq).toSet
    // batch replay: same 3 slices, same order, batch classify + append
    val root = java.nio.file.Files.createTempDirectory("graft_q202_spec_")
    val wh = new Warehouse(spark, root.toString)
    try {
      val bands = DedupQueries.mhBandsOf(DedupQueries.shingleDf(spark, d))
      wh.overwriteBucketed(
        bands.where(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("band"), col("band_key")),
        "silver", "band_index", Seq("band", "band_key"))
      for (g <- 0 until 3) {
        val bBands = bands
          .where(col("doc_id") % 5 === 0 && pmod(col("doc_id"), lit(3)) === g)
          .localCheckpoint(true)
        val keepers = CorpusBuildQueries.classifyAgainstIndex(
          wh.load("silver", "band_index"), bBands,
          graft.Tables.documents(spark, d)
            .where(col("doc_id") % 5 === 0 && pmod(col("doc_id"), lit(3)) === g)
            .select(col("doc_id"), col("source")))
          .where(col("status") === "new")
          .select(col("doc_id")).localCheckpoint(true)
        wh.appendBucketed(
          bBands.join(broadcast(keepers), Seq("doc_id"))
            .select(col("doc_id"), col("band"), col("band_key")),
          "silver", "band_index", Seq("band", "band_key"))
      }
      val replayed = wh.load("silver", "band_index")
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("band_key")).as("n_keys"))
        .collect().map(_.toSeq).toSet
      assert(streamed == replayed, s"streamed $streamed vs replayed $replayed")
    } finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(root)
    }
  }

  test("appendBucketed from another session is visible to the warehouse session") {
    val root = java.nio.file.Files.createTempDirectory("graft_xsession_spec_")
    val wh = new Warehouse(spark, root.toString)
    try {
      import spark.implicits._
      wh.overwriteBucketed(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "silver", "t", Seq("k"))
      // populate THIS session's relation cache before the foreign write
      assert(wh.load("silver", "t").count() == 2)
      val other = spark.newSession()
      val foreign = {
        import other.implicits._
        Seq((3L, "c")).toDF("k", "v")
      }
      assert(foreign.sparkSession ne spark)
      wh.appendBucketed(foreign, "silver", "t", Seq("k"))
      // without the cross-session refreshTable in appendBucketed this
      // reads the cached pre-append listing and returns 2
      assert(wh.load("silver", "t").count() == 3)
    } finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(root)
    }
  }
}
