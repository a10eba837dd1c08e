package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The quarantine half of q108: the oracle can only prove the clean rows
  * survived — these assertions pin what happened to the 5 malformed
  * lines (4 unparseable + 1 Jackson-accepted empty object with trailing
  * garbage), which must be exactly the set the validity rule drops.
  */
class TextFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  test("q108 quarantines exactly the malformed fixture lines") {
    // run the query once so the fixture is staged
    val clean = graft.SparkEntry.queries("q108_jsonl_ingest")(spark, dir)
    val cleanN = clean.count()
    val stage = TextFormats.jsonlStageDir(dir).toString
    // Spark disallows corrupt-column-only queries over raw JSON (the
    // parse would be optimized away); cache the parsed result first
    val raw = spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(stage)
      .cache()
    val total = raw.count()
    val unparseable = raw.where(col("_corrupt_record").isNotNull).count()
    val ghost = raw
      .where(col("_corrupt_record").isNull && col("doc_id").isNull).count()
    assert(unparseable === 4L,
      "4 of the 5 corrupt lines must be unparseable")
    assert(ghost === 1L,
      "the {}-plus-trailing-garbage line must parse as an all-null ghost row")
    assert(cleanN === total - unparseable - ghost)
    raw.unpersist()
    // FAILFAST is the other policy: same fixture must kill the job
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(docSchema.dropRight(1)))
        .option("mode", "FAILFAST").json(stage).count()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("q109 ORC round trip preserves row count and schema") {
    val got = graft.SparkEntry.queries("q109_orc_scan")(spark, dir)
    assert(got.schema.map(f => (f.name, f.dataType)) ===
      Seq(("doc_id", LongType), ("source", StringType), ("n_chars", LongType)))
    val expect = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("n_chars") >= 200 && col("lang") === "en").count()
    assert(got.count() === expect)
  }

  /** The JSONL/ORC fixtures are built once behind a _READY marker — so
    * their staging dirs must be keyed by corpus content, or a
    * documents.parquet regenerated in place keeps serving the stale
    * fixture (round 6's failure mode on the events side).
    */
  test("jsonl and orc fixtures re-stage when documents.parquet is swapped in place") {
    import java.nio.file.{Files, Paths}
    val corpus = Files.createTempDirectory("graft_docs_")

    def install(sf: String): Unit = {
      val target = corpus.resolve("documents.parquet")
      Files.deleteIfExists(target)
      Files.copy(Paths.get(s"/root/testdata/$sf/documents.parquet"), target)
    }

    val q108 = graft.SparkEntry.queries("q108_jsonl_ingest")
    val q109 = graft.SparkEntry.queries("q109_orc_scan")

    def expectCurrent(): Unit = {
      val docs = spark.read.parquet(corpus.resolve("documents.parquet").toString)
      assert(q108(spark, corpus.toString).count() === docs.count(),
        "jsonl fixture must reflect the current corpus")
      assert(q109(spark, corpus.toString).count() ===
        docs.where(col("n_chars") >= 200 && col("lang") === "en").count(),
        "orc fixture must reflect the current corpus")
    }

    install("sf0.001")
    expectCurrent()
    install("sf0.01") // same path, different corpus
    expectCurrent()
  }
}
