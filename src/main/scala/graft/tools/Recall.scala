package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** ANN recall harness: measures recall@3 of every approximate variant
  * against the exact brute-force baseline (q35) on the same corpus, so
  * "recall < 1 by construction" comments become tested numbers.
  *
  * recall@3 = |ANN top-3 ∩ exact top-3| / |exact top-3|, over all
  * queries the exact baseline answers.
  *
  * Usage: runMain graft.tools.Recall [sfDir]
  */
object Recall {

  val annVariants: Seq[String] = Seq(
    "q36_ann_sign_lsh",
    "q45_ann_ivf",
    "q74_ann_int8",
    "q77_ann_ivf_multiprobe",
    "q78_ann_pq",
    "q82_ann_ivf_pq",
    "q95_ann_ivf_probe4",
    "q96_ann_lsh_multitable"
  )

  /** recall@3 of `name` vs the exact q35 baseline at `sfDir`. */
  def recallAt3(spark: SparkSession, sfDir: String, name: String): Double = {
    val exact = SparkEntry.queries("q35_cosine_topk")(spark, sfDir).select("qid", "nid")
    val ann   = SparkEntry.queries(name)(spark, sfDir).select("qid", "nid")
    val total = exact.count().toDouble
    val hits  = exact.join(ann, Seq("qid", "nid"), "left_semi").count().toDouble
    hits / total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    annVariants.foreach { name =>
      val r = recallAt3(spark, sfDir, name)
      spark.catalog.clearCache() // queries persist() intermediates
      println(f"[recall] $name%-24s recall@3 = $r%.4f ($sfDir)")
    }
    spark.stop()
  }
}
