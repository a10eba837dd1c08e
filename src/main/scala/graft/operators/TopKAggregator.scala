package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (`Aggregator[IN, BUF, OUT]`) keeping the k best
  * (score desc, id asc on ties) neighbors per group.
  *
  * This is the map-side-combining alternative to `row_number().over(...)
  * <= k`: the window formulation shuffles EVERY candidate row to its
  * group's partition and sorts there; the aggregator truncates to k rows
  * inside each map task (partial aggregation), so the shuffle carries at
  * most k rows per group per mapper — the difference between shuffling
  * O(candidates) and O(k x groups) at 100 TB.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  /** Insertion keeping the buffer sorted desc by (score, -id), max k. */
  private def insert(buf: List[Scored], s: Scored, k: Int): List[Scored] = {
    val (better, worse) = buf.span(b =>
      b.score > s.score || (b.score == s.score && b.id < s.id))
    val merged = better ::: (s :: worse)
    if (merged.length > k) merged.take(k) else merged
  }

  def topK(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] =
    new Aggregator[Scored, List[Scored], Seq[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] =
        insert(b, a, k)
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        b2.foldLeft(b1)((acc, s) => insert(acc, s, k))
      override def finish(r: List[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }
}
