package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic tests of the Misra-Gries summary kernel (q126). The
  * corpus the oracle gate runs on has a 31-token vocabulary, smaller
  * than the m=32 capacity, so eviction never fires there — these tests
  * force eviction and partial-aggregation merging on a skewed synthetic
  * stream and assert the superset guarantee the query's exact recount
  * depends on: every item with true count > N/(m+1) survives.
  */
class MisraGriesSpec extends AnyFunSuite {

  private val m   = 8
  private val agg = MisraGriesAggregator.candidates(m)

  /** 2 heavy items + a long tail of singletons, interleaved so the
    * heavies keep colliding with eviction pressure.
    */
  private def stream: Seq[String] = {
    val heavy1 = Seq.fill(100)("h1")
    val heavy2 = Seq.fill(50)("h2")
    val tail   = (0 until 200).map(i => s"t$i")
    // deterministic interleave: h1, tail, h2, tail, ...
    val mixed = (heavy1 ++ heavy2 ++ tail).zipWithIndex
      .sortBy { case (s, i) => (i * 7919) % 350 }
      .map(_._1)
    mixed
  }

  test("sequential reduce keeps every item above N/(m+1)") {
    val s   = stream
    val buf = s.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length <= m, "buffer must never exceed capacity")
    val out = agg.finish(buf)
    // N = 350, guarantee threshold N/(m+1) = 38.9: h1 (100) and h2 (50)
    assert(out.contains("h1") && out.contains("h2"),
      s"heavy items must survive eviction, got $out")
  }

  test("merge of partial buffers preserves the guarantee (mergeable summaries)") {
    val s      = stream
    val chunks = s.grouped(s.length / 4 + 1).toSeq
    val bufs   = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    bufs.foreach(b => assert(b.length <= m))
    val merged = bufs.reduce(agg.merge)
    assert(merged.length <= m, "merge must re-shrink to capacity")
    val out = agg.finish(merged)
    assert(out.contains("h1") && out.contains("h2"),
      s"heavy items must survive partial-aggregation merge, got $out")
  }

  test("no eviction path: vocabulary smaller than capacity is held exactly") {
    val s   = Seq("a", "b", "a", "c", "a", "b")
    val buf = s.foldLeft(agg.zero)(agg.reduce)
    val byT = buf.map(c => c.t -> c.c).toMap
    assert(byT == Map("a" -> 3L, "b" -> 2L, "c" -> 1L),
      "below capacity the summary is the exact count table")
  }
}
