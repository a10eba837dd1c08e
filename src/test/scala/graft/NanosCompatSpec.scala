package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** The events loader must keep supporting BOTH physical ts contracts the
  * corpus has shipped: plain timestamp[us] (covered by every gated query
  * today) and legacy TIMESTAMP(NANOS) — which no current fixture
  * carries, so this spec WRITES a genuine nanos parquet through
  * parquet-java and proves the int64-nanos branch of
  * [[Tables.normalizeEventsTs]] still truncates ns→µs exactly. A corpus
  * regeneration flipping the type back must not revive round 6.
  */
class NanosCompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("legacy TIMESTAMP(NANOS) events normalize to the same µs timeline") {
    val corpus = Files.createTempDirectory("graft_nanos_corpus_")
    val file   = corpus.resolve("events.parquet")

    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

    val baseNs = 1700000000L * 1000000000L
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file.toString))
      .withType(schema)
      .withConf(new Configuration())
      .build()
    val gf = new SimpleGroupFactory(schema)
    try {
      (0 until 100).foreach { i =>
        val g = gf.newGroup()
        g.add("event_id", i.toLong)
        // sub-microsecond residue (i*7 ns) must truncate away, and the
        // spread covers several day windows
        g.add("ts", baseNs + i.toLong * 3600L * 1000000000L + i.toLong * 7L)
        g.add("user_id", (i % 5).toLong)
        g.add("event_type", if (i % 2 == 0) "click" else "purchase")
        g.add("value", i.toDouble)
        g.add("props", "{}")
        writer.write(g)
      }
    } finally writer.close()

    val ev = Tables.events(spark, corpus.toString)
    assert(ev.schema("ts").dataType === TimestampType,
      "the nanos branch must deliver the same TimestampType contract as the µs branch")
    assert(ev.count() === 100L)

    // exact ns→µs truncation: unix_micros(ts) == floor(ns / 1000)
    val bad = ev
      .withColumn("expected_us",
        (lit(baseNs) + col("event_id") * 3600L * 1000000000L + col("event_id") * 7L)
          .divide(1000).cast("long"))
      .where(unix_micros(col("ts")) =!= col("expected_us"))
    assert(bad.count() === 0L)

    // the day-window aggregation (q37's grain) behaves identically
    val days = ev.groupBy(window(col("ts"), "1 day")).count().count()
    assert(days === 6L,
      "100 hourly events starting 2023-11-14T22:13:20Z span 6 calendar days")

    Staging.deleteRecursively(corpus)
  }

  test("adjusted-UTC µs events (TimestampType on read) pass through unchanged") {
    // the third physical contract: isAdjustedToUTC=true microseconds,
    // which Spark's reader maps straight to TimestampType — the
    // normalize branch must be an identity, not a double conversion
    val corpus = Files.createTempDirectory("graft_utc_corpus_")
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val build = corpus.resolve("build")
      src.coalesce(1).write.parquet(build.toString)
      val part = {
        val listing = Files.list(build)
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow()
        finally listing.close()
      }
      Files.move(part, corpus.resolve("events.parquet"))
      val back = Tables.events(spark, corpus.toString)
      assert(back.schema("ts").dataType === TimestampType)
      // byte-identical timeline: the round trip must not shift a single µs
      val a = src.select(col("event_id"), unix_micros(col("ts")).as("us"))
      val b = back.select(col("event_id"), unix_micros(col("ts")).as("us2"))
      assert(a.join(b, "event_id").where(col("us") =!= col("us2")).count() === 0L)
      assert(back.count() === src.count())
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
      Staging.deleteRecursively(corpus)
    }
  }
}
