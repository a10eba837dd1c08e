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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright; read nanos as long and convert to microsecond
    * precision (truncating, matching DuckDB's ns→us conversion).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
