package graft.functions

import graft.TestSpark
import graft.etl.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained BM25 inverted index behind q199: the O(ingest)
  * nightly story is only real if (a) an index built by sequential
  * bucketed appends carries exactly the rows a one-shot build would,
  * (b) appending a NEW batch never rewrites history (existing files
  * untouched), (c) retrieval from the maintained state lands on q85's
  * scan-and-score answer to the last bit, and (d) the query-term scan
  * actually bucket-prunes — opening K of 32 buckets is what makes
  * query cost O(query-term postings) instead of O(index) at 100 TB.
  */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def withWarehouse[A](f: Warehouse => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25idx_spec_")
    val wh = new Warehouse(spark, root.toString)
    try f(wh)
    finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(root)
    }
  }

  private def buildIn(wh: Warehouse, slices: Int = 3): Unit = {
    val docTerms = TextQueries.bm25DocTerms(spark, d)
    for (g <- 0 until slices)
      TextQueries.bm25IngestBatch(
        wh, docTerms.where(pmod(col("doc_id"), lit(slices)) === g))
  }

  test("index built by 3 bucketed appends equals the one-shot build") {
    withWarehouse { inc =>
      withWarehouse { once =>
        buildIn(inc, slices = 3)
        TextQueries.bm25IngestBatch(once, TextQueries.bm25DocTerms(spark, d))
        def rows(wh: Warehouse) = wh.load("silver", "bm25_postings")
          .collect().map(_.toSeq).toSet
        assert(rows(inc) == rows(once))
        def totals(wh: Warehouse) = wh.load("silver", "bm25_stats")
          .agg(sum(col("n")), sum(col("sdl"))).collect()(0).toSeq
        assert(totals(inc) == totals(once))
      }
    }
  }

  test("retrieval from the maintained index reproduces q85 bit for bit") {
    withWarehouse { wh =>
      buildIn(wh)
      val fromIndex = TextQueries.withBucketPruning(spark) {
        TextQueries.bm25IndexScores(wh).collect()
      }.map(_.toSeq).toSet
      val oneShot = TextQueries.bm25Scores(spark, d)
        .collect().map(_.toSeq).toSet
      assert(fromIndex == oneShot,
        s"index ${fromIndex.size} rows vs scan ${oneShot.size}")
    }
  }

  test("appending a new batch leaves every existing postings file untouched") {
    withWarehouse { wh =>
      val docTerms = TextQueries.bm25DocTerms(spark, d)
      for (g <- 0 until 3)
        TextQueries.bm25IngestBatch(
          wh, docTerms.where(pmod(col("doc_id"), lit(4)) === g))
      val dir = new java.io.File(wh.path("silver", "bm25_postings"))
      def listing(): Set[(String, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(dir).filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.lastModified())).toSet
      }
      val before = listing()
      TextQueries.bm25IngestBatch(
        wh, docTerms.where(pmod(col("doc_id"), lit(4)) === 3))
      val after = listing()
      assert(before.subsetOf(after),
        s"append rewrote history: ${(before -- after).take(3)}")
      assert(after.size > before.size, "append added no files")
      // and the 4-slice incremental build serves the full-corpus answer
      val served = TextQueries.withBucketPruning(spark) {
        TextQueries.bm25IndexScores(wh).collect()
      }
      assert(served.map(_.toSeq).toSet ==
        TextQueries.bm25Scores(spark, d).collect().map(_.toSeq).toSet)
    }
  }

  test("phrase retrieval (q260) counts adjacency faithfully to the raw tokens") {
    withWarehouse { wh =>
      buildIn(wh)
      val fromIndex = TextQueries.withBucketPruning(spark) {
        TextQueries.phraseMatches(wh).collect()
      }.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("dl"),
        r.getAs[Int]("n_phrase"))).toSet
      val (t1, t2) = TextQueries.PhraseTerms
      val raw = TextQueries.bm25DocTerms(spark, d)
        .collect().flatMap { r =>
          val w = r.getAs[scala.collection.Seq[String]]("w")
          val n = w.sliding(2).count(p =>
            p.length == 2 && p.head == t1 && p(1) == t2)
          if (n > 0) Some((r.getAs[Long]("doc_id"), r.getAs[Int]("dl"), n))
          else None
        }.toSet
      assert(fromIndex == raw,
        s"index ${fromIndex.size} phrase docs vs raw ${raw.size}")
    }
  }

  test("phrase scan bucket-prunes to at most 2 of 32 buckets") {
    withWarehouse { wh =>
      buildIn(wh)
      val plan = TextQueries.withBucketPruning(spark) {
        val q = TextQueries.phraseMatches(wh)
        q.collect()
        q.queryExecution.executedPlan.toString
      }.split("== Initial Plan ==")(0)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(m.isDefined, "no bucket pruning in plan:\n" +
        plan.linesIterator.take(40).mkString("\n"))
      assert(m.get.group(1).toInt <= 2 && m.get.group(2).toInt == 32,
        m.get.matched)
    }
  }

  test("query-term scan bucket-prunes to at most 3 of 32 buckets") {
    withWarehouse { wh =>
      buildIn(wh)
      val plan = TextQueries.withBucketPruning(spark) {
        val q = TextQueries.bm25IndexScores(wh)
        q.collect()
        q.queryExecution.executedPlan.toString
      }.split("== Initial Plan ==")(0)
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(m.isDefined, "no bucket pruning in plan:\n" +
        plan.linesIterator.take(40).mkString("\n"))
      assert(m.get.group(1).toInt <= TextQueries.Bm25Terms.size &&
        m.get.group(2).toInt == 32, m.get.matched)
    }
  }
}
