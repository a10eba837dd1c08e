package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q162 fusion invariants on sf0.001 — the oracle proves engine
  * equivalence; these pin that the fused score IS reciprocal-rank
  * fusion of the two rankings.
  */
class HybridRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q162: rrf recomputes exactly from the two ranks; output ordered by it") {
    val rows = graft.SparkEntry.queries("q162_hybrid_rrf")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (doc, lr, vr, rrf) =>
      assert(lr >= 0 && lr <= 20 && vr >= 0 && vr <= 20, s"doc $doc ranks $lr/$vr")
      assert(lr > 0 || vr > 0, s"doc $doc in neither list")
      val expect = (if (lr > 0) 1.0 / (60.0 + lr) else 0.0) +
        (if (vr > 0) 1.0 / (60.0 + vr) else 0.0)
      assert(rrf === expect, s"doc $doc")
    }
    // emitted best-first with the doc_id tiebreak
    val sorted = rows.sortBy { case (doc, _, _, rrf) => (-rrf, doc) }
    assert(rows.toSeq === sorted.toSeq)
    // each contributing rank appears at most once across the output
    val lrs = rows.map(_._2).filter(_ > 0)
    val vrs = rows.map(_._3).filter(_ > 0)
    assert(lrs.distinct.length === lrs.length)
    assert(vrs.distinct.length === vrs.length)
  }
}
