package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the q34 simhash pipeline. */
object ProfileQ34 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    graft.plans.VectorFunctions.register(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    t("docs.count")(docs.count())
    val toks = docs.select(
      col("doc_id"),
      explode(array_distinct(split(normalizeText(col("text")), " "))).as("tok"))
    t("toks.count")(toks.count())
    val hashed = toks.withColumn(
      "h60",
      conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long"))
    t("hashed.count")(hashed.count())
    val bitCols = (0 until 60).map(j =>
      sum(when(shiftright(col("h60"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$j"))
    val sums = hashed.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    t("sums.count (60-agg)")(sums.count())
    val sig = sums.select(
      col("doc_id"),
      (0 until 60).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    t("sig.count")(sig.count())
    t("full q34 run 1")(SparkEntry.queries("q34_dedup_simhash")(spark, d).count())
    spark.catalog.clearCache()
    t("full q34 run 2")(SparkEntry.queries("q34_dedup_simhash")(spark, d).count())
    spark.stop()
  }
}
