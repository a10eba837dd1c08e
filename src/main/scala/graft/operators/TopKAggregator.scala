package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  *
  * The buffer is a Catalyst-encoded array of structs (ExpressionEncoder),
  * not a Kryo-serialized linked list: per-row update deserializes an
  * UnsafeArrayData instead of running a Kryo round-trip.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  /** Insertion keeping the buffer sorted desc by (score, -id), max k. */
  private def insert(buf: Seq[Scored], s: Scored, k: Int): Seq[Scored] = {
    if (buf.length == k) {
      val last = buf.last
      if (s.score < last.score || (s.score == last.score && s.id > last.id))
        return buf // worse than the current k-th: no allocation
    }
    val (better, worse) = buf.span(b =>
      b.score > s.score || (b.score == s.score && b.id < s.id))
    val merged = (better :+ s) ++ worse
    if (merged.length > k) merged.take(k) else merged
  }

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      override def zero: Seq[Scored] = Vector.empty
      override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
        insert(b, a, k)
      override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
        b2.foldLeft(b1)((acc, s) => insert(acc, s, k))
      override def finish(r: Seq[Scored]): Seq[Scored] = r
      override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
      override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
    }
}

/** Bottom-k DISTINCT hash aggregator — the KMV sketch kernel.
  *
  * Keeps the k smallest distinct hash strings per group with map-side
  * truncation: each map task's buffer never exceeds k rows, so the
  * shuffle carries O(k x groups) rows. The window formulation it
  * replaces (`row_number().over(orderBy(h)) <= k` after a DISTINCT)
  * shuffles and sorts EVERY distinct hash just to discard all but k —
  * O(n log n) where the sketch needs O(n).
  *
  * Dedup is intrinsic: a hash equal to one already buffered is skipped,
  * so no upstream DISTINCT (a full extra shuffle) is needed.
  */
object KmvAggregator {

  /** n_min = number of distinct hashes kept (< k means the group has
    * fewer than k distinct values and n_min IS the exact count);
    * hk = the k-th smallest hash, null when n_min < k.
    */
  final case class KmvSketch(n_min: Long, hk: String)

  /** Insert keeping buf ascending, distinct, length <= k. */
  private def insert(buf: Seq[String], h: String, k: Int): Seq[String] = {
    if (buf.length == k && h >= buf.last) return buf // too big, or dup of last
    val i = buf.indexWhere(_ >= h)
    if (i == -1) buf :+ h // buf.length < k here (else caught above)
    else if (buf(i) == h) buf // duplicate
    else {
      val merged = (buf.take(i) :+ h) ++ buf.drop(i)
      if (merged.length > k) merged.take(k) else merged
    }
  }

  def bottomKDistinct(k: Int): Aggregator[String, Seq[String], KmvSketch] =
    new Aggregator[String, Seq[String], KmvSketch] {
      override def zero: Seq[String] = Vector.empty
      override def reduce(b: Seq[String], h: String): Seq[String] =
        insert(b, h, k)
      override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
        b2.foldLeft(b1)((acc, h) => insert(acc, h, k))
      override def finish(r: Seq[String]): KmvSketch =
        KmvSketch(r.length.toLong, if (r.length == k) r.last else null)
      override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
      override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
    }

  /** Same bottom-k-distinct kernel but finishing with the full sorted
    * signature instead of the (n_min, hk) summary — the mergeable form
    * KMV SET ALGEBRA needs: union/intersection/Jaccard estimates are
    * pure functions of the two signatures (q118), so two O(k) arrays
    * replace any re-scan of the base sets.
    */
  def bottomKSignature(k: Int): Aggregator[String, Seq[String], Seq[String]] =
    new Aggregator[String, Seq[String], Seq[String]] {
      override def zero: Seq[String] = Vector.empty
      override def reduce(b: Seq[String], h: String): Seq[String] =
        insert(b, h, k)
      override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] =
        b2.foldLeft(b1)((acc, h) => insert(acc, h, k))
      override def finish(r: Seq[String]): Seq[String] = r
      override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
      override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    }
}

/** Misra-Gries heavy-hitter candidate summary (m counters).
  *
  * Guarantee: after summarizing a stream of N items, every item with
  * true count > N/(m+1) is present in the summary — so the finish set
  * is a SUPERSET of the items above that frequency, and an exact
  * recount restricted to it (a broadcast semi-join, O(candidates)
  * shuffle) reproduces the exact heavy-hitter answer without ever
  * shuffling the full per-item count table. That split — constant-size
  * sketch up, broadcast filter down — is the 100 TB pattern: the
  * groupBy-everything formulation shuffles O(distinct items), this one
  * shuffles O(m x partitions) + O(candidate rows).
  *
  * The merge rule follows the mergeable-summaries construction
  * (Agarwal et al., PODS'12): sum counters pairwise, and when more
  * than m remain subtract the (m+1)-th largest count from all and drop
  * the non-positive — total undercount stays <= N/(m+1), preserving
  * the superset guarantee under Spark's partial aggregation.
  */
object MisraGriesAggregator {

  final case class Counter(t: String, c: Long)

  private def shrink(merged: Seq[Counter], m: Int): Seq[Counter] =
    if (merged.length <= m) merged
    else {
      val sorted = merged.sortBy(e => (-e.c, e.t))
      val cut    = sorted(m).c
      sorted.map(e => Counter(e.t, e.c - cut)).filter(_.c > 0)
    }

  /** Finish = the candidate token set, sorted (deterministic given the
    * partition contents; the downstream exact recount makes the final
    * query output independent of partition order entirely).
    */
  def candidates(m: Int): Aggregator[String, Seq[Counter], Seq[String]] =
    new Aggregator[String, Seq[Counter], Seq[String]] {
      override def zero: Seq[Counter] = Vector.empty
      override def reduce(b: Seq[Counter], t: String): Seq[Counter] = {
        val i = b.indexWhere(_.t == t)
        if (i >= 0) b.updated(i, Counter(t, b(i).c + 1))
        else if (b.length < m) b :+ Counter(t, 1L)
        // classic MG decrement step: no free counter, so every counter
        // pays one — the new item is accounted by NOT being added
        else b.map(e => Counter(e.t, e.c - 1)).filter(_.c > 0)
      }
      override def merge(b1: Seq[Counter], b2: Seq[Counter]): Seq[Counter] = {
        val merged = (b1 ++ b2)
          .groupBy(_.t)
          .map { case (t, es) => Counter(t, es.map(_.c).sum) }
          .toSeq
        shrink(merged, m)
      }
      override def finish(r: Seq[Counter]): Seq[String] = r.map(_.t).sorted
      override def bufferEncoder: Encoder[Seq[Counter]] = ExpressionEncoder[Seq[Counter]]()
      override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    }
}
