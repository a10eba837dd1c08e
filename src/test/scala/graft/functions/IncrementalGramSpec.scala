package graft.functions

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained Gram state behind incremental PCA (q193): XᵀX is
  * additive across ingests when the int8 quantizer is frozen, so the
  * nightly refresh is an O(ingest) partial-Gram append + an O(d²)
  * merge. This spec drives K=5 SEQUENTIAL refreshes and proves, after
  * every one, that the merged warehouse state equals the one-shot Gram
  * over exactly the vectors ingested so far — cell-exact integer
  * equality, not approximate — and that the final merged-state
  * eigensolve is bit-identical to the one-shot q183-style solve.
  */
class IncrementalGramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private val K = 5

  private def codes: DataFrame = {
    graft.plans.VectorFunctions.register(spark)
    SimilarityQueries.int8Codes(spark, d)
  }

  private def gramMap(df: DataFrame): Map[(Int, Int), Long] =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  test(s"$K sequential partial-Gram appends: merged state tracks the one-shot " +
    "Gram exactly after every refresh, and the final eigensolve is bit-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft_gram_spec_")
    val wh = new Warehouse(spark, root.toString)
    try {
      val c = codes.persist()
      try {
        for (g <- 0 until K) {
          val ingest = SimilarityQueries.gramUpperOf(
            c.where(pmod(col("vec_id"), lit(K)) === g))
          if (wh.exists("silver", "gram_state"))
            wh.appendBucketed(ingest, "silver", "gram_state", Seq("i", "j"), buckets = 8)
          else
            wh.overwriteBucketed(ingest, "silver", "gram_state", Seq("i", "j"), buckets = 8)
          val merged = gramMap(
            wh.load("silver", "gram_state")
              .groupBy(col("i"), col("j")).agg(sum(col("g")).as("g")))
          val oneShot = gramMap(
            SimilarityQueries.gramUpperOf(c.where(pmod(col("vec_id"), lit(K)) <= g)))
          assert(merged == oneShot,
            s"after refresh ${g + 1}/$K: merged state has ${merged.size} cells, " +
              s"one-shot ${oneShot.size}; first diff: " +
              (merged.toSet diff oneShot.toSet).take(3))
        }
        // final solve on the merged state vs the one-shot over the full
        // corpus — identical integer input must give identical floats
        val mergedGram = wh.load("silver", "gram_state")
          .groupBy(col("i"), col("j")).agg(sum(col("g")).as("g"))
        val incr = SimilarityQueries.powerComponents(mergedGram, 4)
        val full = SimilarityQueries.powerComponents(
          SimilarityQueries.gramUpperOf(c), 4)
        incr.zip(full).zipWithIndex.foreach { case (((vi, li), (vf, lf)), ci) =>
          assert(li == lf, s"component ${ci + 1} eigenvalue drifted: $li vs $lf")
          assert(vi.sameElements(vf), s"component ${ci + 1} vector drifted")
        }
      } finally c.unpersist()
    } finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(root)
    }
  }
}
