package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan: Catalyst pushes predicates and
  * column pruning into the scan, so callers should NOT pre-select or
  * cache here — declare the full plan and let the optimizer prune.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts has shipped in two physical parquet types across corpus
    * generations, so the loader branches on what is ACTUALLY on disk
    * instead of hard-coding either contract (hard-coding the first one
    * is exactly what broke when the corpus was regenerated in place):
    *
    *  - legacy TIMESTAMP(NANOS): Spark's reader rejects it outright
    *    unless `nanosAsLong` maps it to int64 — then truncate ns→µs,
    *    matching DuckDB's ns→µs conversion;
    *  - plain timestamp[us] (unadjusted): arrives as TIMESTAMP_NTZ —
    *    cast to the session-TZ timestamp, a micros-identity under the
    *    UTC session this engine pins, so every downstream unix_micros /
    *    window / watermark keeps its TimestampType contract.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(s, d, "events"))
  }

  /** Normalize an events-shaped frame's `ts` to µs-precision
    * TimestampType regardless of which physical type the scan produced.
    * Shared with the streaming loaders, which must apply the identical
    * rule to their footer-derived read schemas.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One verifiable query: a Spark plan plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Queries without an oracle get a weaker rows>0 check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

/** A module contributing named queries to [[SparkEntry]]. */
trait QueryModule {
  def queries: Map[String, QueryDef]
}
