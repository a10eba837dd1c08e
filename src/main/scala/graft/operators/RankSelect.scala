package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact rank selection: per-group order statistics (median,
  * arbitrary quantiles) WITHOUT a per-group sort.
  *
  * The naive exact formulation — `row_number() OVER (PARTITION BY g ORDER
  * BY v)` — sorts each group in one task, so a low-cardinality group key
  * (5 market segments, 5 event types) serializes the whole fact table
  * through 5 tasks: the classic straggler/OOM shape at 100 TB no matter
  * how clean the shuffle-byte count looks. This kernel is the two-pass
  * value-range-histogram selection instead (the distributed formulation
  * of quickselect's pivot step):
  *
  *   1. per-group count/min/max        — one hash aggregate, O(groups);
  *   2. bucket each value into one of B fixed value-range buckets and
  *      histogram them                  — one hash aggregate, O(groups·B);
  *   3. locate, per requested rank k, the bucket containing rank k and
  *      the residual offset of k inside it — pure array arithmetic over
  *      the collected per-group histogram (≤ B entries per group, bounded
  *      regardless of data size), no window, no driver round-trip;
  *   4. rescan ONLY the target buckets and rank within each — the
  *      within-bucket window partitions on (group, bucket), so per-task
  *      input is ~n/B rows regardless of group cardinality.
  *
  * Cost: 3 column-pruned scans of the input instead of one total sort —
  * the documented trade for bounded per-task memory. Exactness: bucket
  * assignment is a monotone deterministic function of v (ties always
  * share a bucket), and the value AT a rank is tie-permutation-invariant,
  * so the selected values are bit-identical to the sort-based oracle.
  * Degenerate case: a group whose values are all equal collapses to one
  * bucket and the within-bucket rank sorts that group — but then every
  * row carries the answer anyway; heavy skew INTO one bucket (not one
  * group) can be handled by recursing on the bucket, which this corpus
  * never needs.
  *
  * Contract: `v` must be non-null and castable to double for bucketing
  * (selection/output keep the original type and exact values).
  */
object RankSelect {

  /** Select the values at the given ranks within each group.
    *
    * @param in    input relation
    * @param g     group column name (any cardinality — low is the point)
    * @param v     value column name (non-null, numeric)
    * @param ranks (label, rankSql) pairs; rankSql is a SQL expression over
    *              the per-group row count exposed as `n` (BIGINT), e.g.
    *              `"(n + 1) div 2"`. Must evaluate to a rank in 1..n.
    * @return one row per (group, rank label): (g, label, v, n)
    */
  def selectRanks(
      in: DataFrame,
      g: String,
      v: String,
      ranks: Seq[(String, String)],
      buckets: Int = 1024): DataFrame = {
    val B = buckets
    val stats = in
      .groupBy(col(g))
      .agg(
        count(lit(1)).as("__rs_n"),
        min(col(v)).as("__rs_lo"),
        max(col(v)).as("__rs_hi"))

    // monotone bucket id: equal values share a bucket, order is preserved,
    // v == max lands on B (capped to B-1), a constant group degenerates to
    // bucket 0
    val lo = col("__rs_lo").cast("double")
    val hi = col("__rs_hi").cast("double")
    val vd = col(v).cast("double")
    val bucketed = in
      .join(broadcast(stats), g)
      .withColumn(
        "__rs_b",
        when(hi > lo, least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
          .otherwise(lit(0)))
      .select(col(g), col(v), col("__rs_b"))

    val hist = bucketed
      .groupBy(col(g), col("__rs_b"))
      .agg(count(lit(1)).as("__rs_bc"))

    // fold the ≤B-entry histogram into one sorted array per group; the
    // group state is bounded by B, never by the data
    val harr = hist
      .groupBy(col(g))
      .agg(sort_array(
        collect_list(struct(col("__rs_b").as("b"), col("__rs_bc").as("c")))).as("__rs_hs"))
      .withColumn("n", expr("aggregate(__rs_hs, 0L, (a, x) -> a + x.c)"))

    // per requested rank: walk the histogram once to find the bucket
    // containing rank k and the cumulative count before it — pure array
    // arithmetic, no window anywhere near the fact table
    val lblK = ranks.map { case (l, kSql) =>
      struct(lit(l).as("label"), expr(kSql).cast("long").as("k"))
    }
    val targets = harr
      .select(col(g), col("n"), col("__rs_hs"), explode(array(lblK: _*)).as("__rs_t"))
      .withColumn(
        "__rs_sel",
        expr("""aggregate(__rs_hs,
                named_struct('cum', 0L, 'tb', -1, 'cb', 0L),
                (a, x) -> IF(a.tb >= 0, a,
                             IF(a.cum + x.c >= __rs_t.k,
                                named_struct('cum', a.cum + x.c, 'tb', x.b, 'cb', a.cum),
                                named_struct('cum', a.cum + x.c, 'tb', -1, 'cb', 0L))))"""))
      .select(
        col(g),
        col("__rs_t.label").as("label"),
        col("__rs_sel.tb").as("__rs_b"),
        (col("__rs_t.k") - col("__rs_sel.cb")).as("__rs_off"),
        col("n"))

    // rescan only the target buckets (≤ ranks.size per group, ~n/B rows
    // each); the rank window partitions on (group, bucket) so no task
    // ever sees more than one bucket
    val tkeys = targets.select(col(g), col("__rs_b")).distinct()
    val cand = bucketed
      .join(broadcast(tkeys), Seq(g, "__rs_b"))
      .withColumn(
        "__rs_rn",
        row_number().over(Window.partitionBy(col(g), col("__rs_b")).orderBy(col(v).asc)))
    cand
      .join(broadcast(targets), Seq(g, "__rs_b"))
      .where(col("__rs_rn") === col("__rs_off"))
      .select(col(g), col("label"), col(v), col("n"))
  }
}
