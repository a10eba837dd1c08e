package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the data-mining / corpus operators added in
  * round 5: association rules (q116), KMV set algebra (q118), inverted
  * index (q119), rollup merge (q120), bigram LM (q121), PII redaction
  * (q115). The DuckDB oracle gates value equality; these pin invariants
  * a same-side refactor could break.
  */
class MiningQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q115 redacted text contains no residual PII pattern and counts fire") {
    val rows = q("q115_pii_redaction").collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    rows.foreach { r =>
      val red = r.getString(1)
      assert(email.findFirstIn(red).isEmpty, s"email survived: $red")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") && red.contains("[IP]"))
      assert(r.getInt(2) >= 1 && r.getInt(3) >= 1 && r.getInt(4) >= 1)
    }
  }

  test("q116 support/confidence/lift satisfy their algebraic relations") {
    val rows = q("q116_assoc_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b1, b2) = (r.getString(0), r.getString(1))
      assert(b1 < b2, "pair not canonically ordered")
      val support = r.getDouble(3)
      val conf = r.getDouble(4)
      assert(support > 0.0 && support <= 1.0)
      assert(conf >= support - 1e-9, "confidence = support / P(b1) >= support")
      assert(conf <= 1.0 + 1e-9)
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("q118 KMV estimates are consistent with the exact set overlap") {
    val r = q("q118_kmv_set_algebra").collect().head
    val (sigSize, jacEst) = (r.getLong(0), r.getDouble(2))
    val (unionExact, jacExact) = (r.getLong(4), r.getDouble(6))
    assert(sigSize > 0 && sigSize <= 64)
    assert(jacEst >= 0.0 && jacEst <= 1.0)
    // K=64 Jaccard estimate has std err ~ sqrt(J(1-J)/K) <= 0.0625;
    // allow 4 sigma.
    assert(math.abs(jacEst - jacExact) <= 0.25, s"jaccard est $jacEst vs exact $jacExact")
    val unionEst = r.getDouble(3)
    assert(unionEst > 0.5 * unionExact && unionEst < 2.0 * unionExact,
      s"union est $unionEst vs exact $unionExact")
  }

  test("q119 df equals posting-list length and postings are sorted") {
    val rows = q("q119_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(ids.length.toLong === r.getLong(1))
      assert(ids.sameElements(ids.sorted), "postings not sorted")
      assert(ids.distinct.length === ids.length, "postings not distinct")
    }
  }

  test("q120 merged partials equal a direct one-level aggregation") {
    val got = q("q120_rollup_merge").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(5))))
      .toMap
    val direct = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === direct.keySet)
    got.foreach { case (t, (n, mx)) =>
      assert(n === direct(t)._1, s"$t count")
      assert(mx === direct(t)._2, s"$t max")
    }
  }

  test("q121 conditional probabilities match brute-force bigram counts") {
    val rows = q("q121_bigram_lm").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir).select("text").collect().map(_.getString(0))
    val grams = docs.flatMap { t =>
      val w = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      if (w.length < 2) Array.empty[(String, String)] else w.dropRight(1).zip(w.drop(1))
    }
    val cnt = grams.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val uni = grams.groupBy(_._1).map { case (w1, xs) => w1 -> xs.length.toLong }
    rows.foreach { r =>
      val g = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === cnt(g), s"count mismatch for $g")
      val expect = cnt(g).toDouble / uni(g._1)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6, s"cond_p mismatch for $g")
    }
  }
}
