package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The q83 clustering kernel on synthetic graphs whose shapes the real
  * candidate corpus doesn't exercise: a long chain (forces multiple
  * propagation passes — the corpus quasi-cliques converge in one or
  * two), a star, disjoint components, and an empty edge list.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupQueries
      .connectedComponents(edges.toDF("ida", "idb"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("long chain converges to the minimum id despite diameter > 1 pass") {
    // 9-node path 1-2-...-9: min-label needs ~log passes to reach the far end
    val edges = (1L until 9L).map(i => (i, i + 1))
    val got   = cc(edges)
    assert(got == (1L to 9L).map(_ -> 1L).toMap, got.toString)
  }

  test("25-hop chain converges inside the default pass cap (round-4 directive)") {
    // a 26-node path would defeat diameter-bound label propagation at
    // maxPasses=20; star-contraction needs only ~log passes. The contract
    // under test: correct labels OR an exception — never silently wrong.
    val edges = (1L until 26L).map(i => (i, i + 1))
    val got   = cc(edges)
    assert(got == (1L to 26L).map(_ -> 1L).toMap, got.toString)
  }

  test("adversarial 200-hop chain with interleaved ids still labels by component min") {
    // ids deliberately NOT in path order (alternating ends) so min-id
    // position is adversarial for one-directional propagation; descending
    // edge orientation exercises the canonicalization
    val n     = 200L
    val edges = (1L until n).map(i => (i + 1, i)) ++ Seq((n, 1L)) // cycle too
    val got   = cc(edges)
    assert(got == (1L to n).map(_ -> 1L).toMap,
      got.filter(_._2 != 1L).toString)
  }

  test("star, disjoint pair, and reversed edges all label by component min") {
    val edges = Seq((7L, 3L), (7L, 5L), (7L, 9L), // star centered at 7, min 3
      (20L, 11L))                                 // disjoint pair, min 11
    val got = cc(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 3L, 11L -> 11L, 20L -> 11L),
      got.toString)
  }

  test("empty edge list yields an empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }
}
