package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the jaccard/minhash dedup pipelines. */
object ProfileQ32 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    graft.plans.VectorFunctions.register(spark)
    val d     = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    t("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))
    t("shingles.count")(sh.count())
    t("shingles.count again")(sh.count())
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("dfreq"))
      .where(col("dfreq") <= 20).select(col("shingle"))
    t("rare.count")(rare.count())
    val rareSh = sh.join(rare, "shingle")
    t("rareSh.count")(rareSh.count())
    val pairs = rareSh.as("a")
      .join(rareSh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
    t("pairs.count")(pairs.count())
    val inter = pairs.groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("inter"))
    t("inter.count")(inter.count())
    // minhash agg probe
    val mhCols = (0 until 12).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")).cast("binary"))).as(s"h$i"))
    val mh = sh.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
    t("minhash agg")(mh.count())
    mh.explain("formatted")
    spark.stop()
  }
}
