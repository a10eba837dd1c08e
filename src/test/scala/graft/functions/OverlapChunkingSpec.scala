package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural contract of the q320 window rule (W = 32, stride = 24),
  * asserted over synthetic docs of EVERY token length 1..80 by running
  * the query against a temp documents table via its own SparkEntry
  * entry point is not possible (q320 reads the corpus), so the same
  * windowing expression is driven here on a substitute frame:
  *   - every token of every doc falls in at least one chunk,
  *   - interior consecutive chunks overlap by exactly W − S tokens,
  *   - chunk count = ⌈max(0, n − W) / S⌉ + 1,
  *   - only the LAST chunk may be short, and it never exceeds W.
  */
class OverlapChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 32
  private val S = 24

  test("window rule covers every token with exact overlap at every length 1..80") {
    import spark.implicits._
    val docs = (1 to 80).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n"), col("w"))
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(greatest(0, ceil((greatest(CAST(n AS DOUBLE), $W.0) - $W.0) / $S.0)) AS INT)),
             |  i -> struct(
             |    i * $S AS start_tok,
             |    size(slice(w, i * $S + 1, $W)) AS n_tokens))"""
            .stripMargin)).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("n"), col("chunk_id"),
        col("c.start_tok").as("start_tok"), col("c.n_tokens").as("n_tokens"))
      .collect()
      .groupBy(_.getLong(0))

    (1 to 80).foreach { n =>
      val cs = chunks(n.toLong).sortBy(_.getInt(2))
      val expectCount = math.ceil(math.max(0, n - W).toDouble / S).toInt + 1
      assert(cs.length == expectCount, s"n=$n count ${cs.length} != $expectCount")
      // coverage: union of [start, start + len) is exactly [0, n)
      val covered = cs.flatMap(r => r.getInt(3) until (r.getInt(3) + r.getInt(4))).toSet
      assert(covered == (0 until n).toSet, s"n=$n coverage hole")
      // stride alignment + short-only-last + exact interior overlap
      cs.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(3) == i * S, s"n=$n chunk $i start ${r.getInt(3)}")
        if (i < cs.length - 1)
          assert(r.getInt(4) == W, s"n=$n interior chunk $i short: ${r.getInt(4)}")
        else assert(r.getInt(4) <= W && r.getInt(4) >= 1)
      }
      if (cs.length > 1)
        cs.sliding(2).foreach { case Array(a, b) =>
          val overlap = (a.getInt(3) + a.getInt(4)) - b.getInt(3)
          // interior chunks are full W, so consecutive overlap is W - S
          // except possibly against the short tail, which still starts
          // S after its predecessor (overlap = predecessor_len - S >= 0)
          assert(overlap == a.getInt(4) - S && overlap >= 0,
            s"n=$n overlap $overlap")
        }
    }
  }
}
