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
  *
  * Skewed buckets RECURSE instead of sorting: when a target bucket holds
  * more than max(skewFloor, SkewFactor·n/B) rows — a pathological value
  * distribution such as 99% one constant plus outliers — step 4 would
  * re-create the single-task sort inside that bucket. Such buckets are
  * re-bucketed within their own (now narrower) value range, up to two
  * levels deep (~n/B³ residual), with two guaranteed exits: a bucket
  * whose values are ALL equal answers directly (any rank is the shared
  * value — no sort, no recursion), and the depth floor falls back to the
  * single-task sort, by then bounded by the refined bucket. The skew
  * check is a scalar gate over the collected per-group histogram (O(
  * groups·ranks) rows, locally checkpointed), never a scan of the fact.
  *
  * Contract: `v` must be non-null and castable to double for bucketing
  * (selection/output keep the original type and exact values).
  */
object RankSelect {

  /** A target bucket is "skewed" above SkewFactor× the even-split
    * expectation n/B (with an absolute `skewFloor` under which a
    * single-task sort is trivially fine).
    */
  private val SkewFactor = 16L

  /** Select the values at the given ranks within each group.
    *
    * @param in        input relation
    * @param g         group column name (any cardinality — low is the point)
    * @param v         value column name (non-null, numeric)
    * @param ranks     (label, rankSql) pairs; rankSql is a SQL expression over
    *                  the per-group row count exposed as `n` (BIGINT), e.g.
    *                  `"(n + 1) div 2"`. Must evaluate to a rank in 1..n.
    * @param buckets   histogram resolution B
    * @param skewFloor absolute row floor below which a target bucket is
    *                  sorted in one task rather than refined (tests
    *                  lower it to exercise the recursion on small data)
    * @param maxKernelGroups group-cardinality ceiling for the bucket
    *                  kernel (its per-group stats/targets relations
    *                  broadcast); above it the call dispatches to the
    *                  plain per-group window — with many groups the
    *                  per-group sort parallelizes for free and the
    *                  single-task hazard the kernel breaks is gone
    * @return one row per (group, rank label): (g, label, v, n)
    */
  def selectRanks(
      in: DataFrame,
      g: String,
      v: String,
      ranks: Seq[(String, String)],
      buckets: Int = 1024,
      skewFloor: Long = 1L << 16,
      maxKernelGroups: Long = 512L): DataFrame = {
    val B = buckets
    if (in.agg(count_distinct(col(g))).first().getLong(0) > maxKernelGroups)
      return windowSelectRanks(in, g, v, ranks)
    val stats = in
      .groupBy(col(g))
      .agg(
        count(lit(1)).as("__rs_n"),
        min(col(v)).as("__rs_lo"),
        max(col(v)).as("__rs_hi"))

    // monotone bucket id: equal values share a bucket, order is preserved,
    // v == max lands on B (capped to B-1), a constant group degenerates to
    // bucket 0. A null v violates the documented contract; it would fall
    // out of the inner joins below as SILENT row loss, so fail loudly here
    // instead (the when-branch costs nothing on contract-abiding input).
    val lo = col("__rs_lo").cast("double")
    val hi = col("__rs_hi").cast("double")
    val vd = col(v).cast("double")
    val bucketed = in
      .join(broadcast(stats), g)
      .withColumn(
        "__rs_b",
        when(col(v).isNull,
          raise_error(lit(s"selectRanks: null '$v' violates the non-null contract")).cast("int"))
          .when(hi > lo, least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
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
    // containing rank k, the cumulative count before it, and the bucket's
    // own size (the skew signal) — pure array arithmetic, no window
    // anywhere near the fact table
    val lblK = ranks.map { case (l, kSql) =>
      struct(lit(l).as("label"), expr(kSql).cast("long").as("k"))
    }
    // locally checkpointed: O(groups·ranks) rows, read three ways below
    // (skew gate + two broadcasts) — one materialization, no re-derive
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
        (col("__rs_sel.cum") - col("__rs_sel.cb")).as("__rs_bc"),
        col("n"))
      .localCheckpoint()

    val skewCond =
      col("__rs_bc") > greatest(lit(skewFloor), col("n") * SkewFactor / B)

    // rescan only the target buckets (≤ ranks.size per group, ~n/B rows
    // each); the rank window partitions on (group, bucket) so no task
    // ever sees more than one bucket
    def sortWithin(ts: DataFrame): DataFrame = {
      val tkeys = ts.select(col(g), col("__rs_b")).distinct()
      val cand = bucketed
        .join(broadcast(tkeys), Seq(g, "__rs_b"))
        .withColumn(
          "__rs_rn",
          row_number().over(Window.partitionBy(col(g), col("__rs_b")).orderBy(col(v).asc)))
      cand
        .join(broadcast(ts), Seq(g, "__rs_b"))
        .where(col("__rs_rn") === col("__rs_off"))
        .select(col(g), col("label"), col(v), col("n"))
    }

    if (targets.where(skewCond).isEmpty) sortWithin(targets)
    else {
      val ok = targets.where(!skewCond)
      val sk = targets.where(skewCond)
      // a skewed target's candidate rows, replicated per rank label so
      // each (group, label) refines as its own selection problem
      val cand = bucketed
        .join(broadcast(sk), Seq(g, "__rs_b"))
        .select(col(g), col("label"), col(v), col("__rs_off"))
      val refined = selectWithin(cand, Seq(g, "label"), v, "__rs_off", B, skewFloor, depth = 2)
        .join(broadcast(sk.select(col(g), col("label"), col("n"))), Seq(g, "label"))
        .select(col(g), col("label"), col(v), col("n"))
      sortWithin(ok).unionByName(refined)
    }
  }

  /** The above-`maxKernelGroups` dispatch target for [[selectRanks]]:
    * one plain per-group rank window, emitting the kernel's exact
    * (g, label, v, n) surface. Same non-null contract raises per row.
    */
  private def windowSelectRanks(
      in: DataFrame, g: String, v: String, ranks: Seq[(String, String)]): DataFrame = {
    val wG = Window.partitionBy(col(g))
    val lblK = ranks.map { case (l, kSql) =>
      struct(lit(l).as("label"), expr(kSql).cast("long").as("k"))
    }
    in
      .withColumn("__rs_rn",
        row_number().over(wG.orderBy(col(v).asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(wG))
      .withColumn("n",
        when(col(v).isNull,
          raise_error(lit(s"selectRanks: null '$v' violates the non-null contract")).cast("long"))
          .otherwise(col("n")))
      .select(col(g), col(v), col("n"), col("__rs_rn"),
        explode(array(lblK: _*)).as("__rs_t"))
      .where(col("__rs_rn") === col("__rs_t.k"))
      .select(col(g), col("__rs_t.label").as("label"), col(v), col("n"))
  }

  /** WEIGHTED rank selection: the smallest `v` whose per-group
    * cumulative weight (ascending `v`) reaches rank `kSql` — the
    * weighted-median/percentile generalization of [[selectRanks]]
    * (which is this with w ≡ 1). Same two-pass histogram shape with
    * COUNT replaced by SUM(w): the bucket histogram carries weight
    * sums, the fold finds the bucket where the cumulative weight
    * crosses k, and only that bucket's rows (per-task input ~W/B of
    * the weight mass) reach the (group, bucket)-partitioned window.
    * The in-bucket cumulative uses the default RANGE frame, so tied
    * values accumulate as one block and the crossing value is
    * order-independent. All-equal groups answer directly; and — like
    * [[selectRanks]] — a target bucket holding more ROWS than
    * max(skewFloor, SkewFactor·n/B) (a pathological value distribution
    * such as 99% one constant plus outliers) RECURSES into a narrower
    * weighted selection instead of degrading to a near-single-task
    * window over the whole skewed bucket.
    *
    * @param w         non-null INTEGER weight column — integer weights
    *                  keep every cumulative exact cross-engine
    * @param kSql      SQL expression over the per-group total weight
    *                  exposed as `wtot` (BIGINT), e.g. `"(wtot + 1) div 2"`
    * @param skewFloor absolute ROW floor below which a target bucket is
    *                  windowed in one task rather than refined (tests
    *                  lower it to exercise the recursion on small data)
    * @param maxKernelGroups group-cardinality ceiling for the bucket
    *                  kernel (same dispatch contract as
    *                  [[withGroupRanks]]/[[selectRanks]])
    * @return one row per group: (g, v, wtot)
    */
  def selectWeightedRank(
      in: DataFrame,
      g: String,
      v: String,
      w: String,
      kSql: String,
      buckets: Int = 1024,
      skewFloor: Long = 1L << 16,
      maxKernelGroups: Long = 512L): DataFrame = {
    val B = buckets
    if (in.agg(count_distinct(col(g))).first().getLong(0) > maxKernelGroups)
      return windowSelectWeightedRank(in, g, v, w, kSql)
    val stats = in
      .groupBy(col(g))
      .agg(
        sum(col(w)).as("wtot"),
        count(lit(1)).as("__rs_nr"),
        min(col(v)).as("__rs_lo"),
        max(col(v)).as("__rs_hi"))
      .withColumn("__rs_k", expr(kSql).cast("long"))

    val constAns = stats
      .where(col("__rs_lo") === col("__rs_hi"))
      .select(col(g), col("__rs_lo").as(v), col("wtot"))
    val varStats = stats.where(col("__rs_lo") =!= col("__rs_hi"))

    val lo = col("__rs_lo").cast("double")
    val hi = col("__rs_hi").cast("double")
    val vd = col(v).cast("double")
    val bucketed = in
      .join(broadcast(varStats), g)
      .withColumn(
        "__rs_b",
        least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
      .select(col(g), col(v), col(w), col("__rs_b"))

    // per-bucket weight sums drive the crossing; per-bucket ROW counts are
    // the skew signal (task memory is bounded by rows, not weight)
    val targets = bucketed
      .groupBy(col(g), col("__rs_b"))
      .agg(sum(col(w)).as("__rs_bw"), count(lit(1)).as("__rs_brc"))
      .groupBy(col(g))
      .agg(sort_array(
        collect_list(struct(col("__rs_b").as("b"), col("__rs_bw").as("c"),
          col("__rs_brc").as("rc")))).as("__rs_hs"))
      .join(broadcast(varStats.select(col(g), col("__rs_k"), col("wtot"), col("__rs_nr"))), g)
      .withColumn(
        "__rs_sel",
        expr("""aggregate(__rs_hs,
                named_struct('cum', 0L, 'tb', -1, 'cb', 0L, 'rc', 0L),
                (a, x) -> IF(a.tb >= 0, a,
                             IF(a.cum + x.c >= __rs_k,
                                named_struct('cum', a.cum + x.c, 'tb', x.b, 'cb', a.cum, 'rc', x.rc),
                                named_struct('cum', a.cum + x.c, 'tb', -1, 'cb', 0L, 'rc', 0L))))"""))
      .select(
        col(g),
        // guard folded into the projection (a free-standing column would
        // be pruned): a caller kSql above the group's total weight leaves
        // tb = -1, and silently losing the group on the bucket join is
        // worse than failing — misuse of the generic kernel errors loudly
        when(col("__rs_sel.tb") < 0,
          raise_error(concat(
            lit("selectWeightedRank: k ("), col("__rs_k").cast("string"),
            lit(") exceeds total group weight ("),
            col("wtot").cast("string"), lit(")"))).cast("int"))
          .otherwise(col("__rs_sel.tb")).as("__rs_b"),
        (col("__rs_k") - col("__rs_sel.cb")).as("__rs_off"),
        col("__rs_sel.rc").as("__rs_brc"),
        col("__rs_nr"),
        col("wtot"))
      .localCheckpoint()

    // only the target bucket's rows reach the window; the RANGE-frame
    // cumulative makes tie blocks atomic, so min(v) past the crossing
    // is the weighted-rank value whatever the intra-tie row order
    def pickWithin(ts: DataFrame): DataFrame = bucketed
      .join(broadcast(ts.select(col(g), col("__rs_b"), col("__rs_off"), col("wtot"))),
        Seq(g, "__rs_b"))
      .withColumn(
        "__rs_cum",
        sum(col(w)).over(
          Window.partitionBy(col(g), col("__rs_b")).orderBy(col(v).asc)))
      .where(col("__rs_cum") >= col("__rs_off"))
      .groupBy(col(g))
      .agg(min(col(v)).as(v), max(col("wtot")).as("wtot"))

    val skewCond =
      col("__rs_brc") > greatest(lit(skewFloor), col("__rs_nr") * SkewFactor / B)

    val picked =
      if (targets.where(skewCond).isEmpty) pickWithin(targets)
      else {
        val ok = targets.where(!skewCond)
        val sk = targets.where(skewCond)
        val cand = bucketed
          .join(broadcast(sk.select(col(g), col("__rs_b"), col("__rs_off"))), Seq(g, "__rs_b"))
          .select(col(g), col(v), col(w), col("__rs_off"))
        val refined = selectWeightedWithin(cand, Seq(g), v, w, "__rs_off", B, skewFloor, depth = 2)
          .join(broadcast(sk.select(col(g), col("wtot"))), Seq(g))
          .select(col(g), col(v), col("wtot"))
        pickWithin(ok).unionByName(refined)
      }

    picked.unionByName(constAns)
  }

  /** The above-`maxKernelGroups` dispatch target for
    * [[selectWeightedRank]]: one plain per-group RANGE-frame cumulative
    * window (tie blocks atomic), emitting the kernel's exact
    * (g, v, wtot) surface, with the same loud guards — null `v` raises,
    * and a `kSql` above the group's total weight raises rather than
    * silently dropping the group when no row's cumulative reaches it.
    */
  private def windowSelectWeightedRank(
      in: DataFrame, g: String, v: String, w: String, kSql: String): DataFrame = {
    val wG = Window.partitionBy(col(g))
    in
      .withColumn("wtot", sum(col(w)).over(wG))
      .withColumn("__rs_k", expr(kSql).cast("long"))
      .withColumn("__rs_k",
        when(col(v).isNull,
          raise_error(lit(s"selectWeightedRank: null '$v' violates the non-null contract")).cast("long"))
          .when(col("__rs_k") > col("wtot"),
            raise_error(concat(
              lit("selectWeightedRank: k ("), col("__rs_k").cast("string"),
              lit(") exceeds total group weight ("),
              col("wtot").cast("string"), lit(")"))).cast("long"))
          .otherwise(col("__rs_k")))
      .withColumn("__rs_cum", sum(col(w)).over(wG.orderBy(col(v).asc)))
      .where(col("__rs_cum") >= col("__rs_k"))
      .groupBy(col(g))
      .agg(min(col(v)).as(v), max(col("wtot")).as("wtot"))
  }

  /** Weighted refinement step — the [[selectWithin]] analogue for
    * [[selectWeightedRank]]: the smallest `v` whose cumulative weight
    * within each `gcols` group reaches the group-constant residual
    * `kCol`. All-equal groups answer directly; at depth 0 the rest fall
    * back to the single-task RANGE-cumulative window (bounded by the
    * refined bucket by then); otherwise one level of weight-histogram
    * narrowing, recursing again only on still-skewed buckets.
    */
  private def selectWeightedWithin(
      cand0: DataFrame,
      gcols: Seq[String],
      v: String,
      w: String,
      kCol: String,
      buckets: Int,
      skewFloor: Long,
      depth: Int): DataFrame = {
    val B = buckets
    val gc = gcols.map(col)
    val cand = cand0.localCheckpoint()
    val stats = cand
      .groupBy(gc: _*)
      .agg(
        max(col(kCol)).as("__rw_k"),
        count(lit(1)).as("__rw_n"),
        min(col(v)).as("__rw_lo"),
        max(col(v)).as("__rw_hi"))
      .localCheckpoint()

    // guaranteed exit: an all-equal group answers with the shared value
    // (the residual k is ≥ 1 and ≤ the bucket's weight, so the crossing
    // value can only be the shared one)
    val constAns = stats
      .where(col("__rw_lo") === col("__rw_hi"))
      .select(gc :+ col("__rw_lo").as(v): _*)
    val varStats = stats.where(col("__rw_lo") =!= col("__rw_hi"))
    val varying = cand.drop(kCol).join(broadcast(varStats), gcols)

    if (depth <= 0) {
      val sel = varying
        .withColumn(
          "__rw_cum",
          sum(col(w)).over(Window.partitionBy(gc: _*).orderBy(col(v).asc)))
        .where(col("__rw_cum") >= col("__rw_k"))
        .groupBy(gc: _*)
        .agg(min(col(v)).as(v))
      sel.unionByName(constAns)
    } else {
      val lo = col("__rw_lo").cast("double")
      val hi = col("__rw_hi").cast("double")
      val vd = col(v).cast("double")
      val bucketed = varying
        .withColumn(
          "__rw_b",
          least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
        .select(gc ++ Seq(col(v), col(w), col("__rw_b")): _*)
      val harr = bucketed
        .groupBy(gc :+ col("__rw_b"): _*)
        .agg(sum(col(w)).as("__rw_bw"), count(lit(1)).as("__rw_brc"))
        .groupBy(gc: _*)
        .agg(sort_array(collect_list(struct(
          col("__rw_b").as("b"), col("__rw_bw").as("c"),
          col("__rw_brc").as("rc")))).as("__rw_hs"))
        .join(broadcast(varStats.select(gc ++ Seq(col("__rw_k"), col("__rw_n")): _*)), gcols)
      val targets = harr
        .withColumn(
          "__rw_sel",
          expr("""aggregate(__rw_hs,
                  named_struct('cum', 0L, 'tb', -1, 'cb', 0L, 'rc', 0L),
                  (a, x) -> IF(a.tb >= 0, a,
                               IF(a.cum + x.c >= __rw_k,
                                  named_struct('cum', a.cum + x.c, 'tb', x.b, 'cb', a.cum, 'rc', x.rc),
                                  named_struct('cum', a.cum + x.c, 'tb', -1, 'cb', 0L, 'rc', 0L))))"""))
        .select(
          gc ++ Seq(
            col("__rw_sel.tb").as("__rw_b"),
            (col("__rw_k") - col("__rw_sel.cb")).as("__rw_off"),
            col("__rw_sel.rc").as("__rw_brc"),
            col("__rw_n")): _*)
        .localCheckpoint()

      val skewCond =
        col("__rw_brc") > greatest(lit(skewFloor), col("__rw_n") * SkewFactor / B)

      def pickPath(ts: DataFrame): DataFrame = bucketed
        .join(broadcast(ts), gcols :+ "__rw_b")
        .withColumn(
          "__rw_cum",
          sum(col(w)).over(
            Window.partitionBy(gc :+ col("__rw_b"): _*).orderBy(col(v).asc)))
        .where(col("__rw_cum") >= col("__rw_off"))
        .groupBy(gc: _*)
        .agg(min(col(v)).as(v))

      val resolved =
        if (targets.where(skewCond).isEmpty) pickPath(targets)
        else {
          val ok = targets.where(!skewCond)
          val sk = targets.where(skewCond)
          val next = bucketed
            .join(broadcast(sk), gcols :+ "__rw_b")
            .select(gc ++ Seq(col(v), col(w), col("__rw_off")): _*)
          pickPath(ok).unionByName(
            selectWeightedWithin(next, gcols, v, w, "__rw_off", B, skewFloor, depth - 1))
        }
      resolved.unionByName(constAns)
    }
  }

  /** Distributed FULL ranking: append global per-group rank columns to
    * EVERY row without a per-group single-task sort — the row-grain
    * complement of [[selectRanks]] (which answers one rank per group).
    * The naive `rank() OVER (PARTITION BY g ORDER BY v)` serializes each
    * group through one task, so rank statistics grouped by a ≤5-value
    * key (AUC, decile calibration) inherit the same straggler/OOM shape
    * the selection kernel exists to avoid. Same cure: bucket by value
    * range (monotone — TIES ALWAYS SHARE A BUCKET, so local tie counts
    * are global tie counts), fold the ≤B-entry per-group bucket
    * histogram into cumulative-before offsets (pure array arithmetic,
    * no window), broadcast them back, and rank WITHIN (group, bucket) —
    * per-task window input is ~n/B rows however few groups there are.
    * Global rank = bucket offset + within-bucket rank, exactly.
    *
    * Appends four columns:
    *   - `__rk_rn`   global row_number under (v, tieBreak…) ascending —
    *                 only deterministic when (v, tieBreak…) totally
    *                 orders the group (callers who don't pass a total
    *                 order shouldn't read it);
    *   - `__rk_rank` global min-rank of v (RANK() semantics);
    *   - `__rk_ties` global tie count of v (COUNT(*) OVER (g, v));
    *   - `__rk_n`    group row count.
    *
    * Cost: one cheap dispatch aggregate plus two extra column-pruned
    * passes (stats, histogram) before the ranking pass — the trade for
    * bounded per-task memory. The offsets relation is O(groups·B) rows
    * and must broadcast, so the kernel's contract (documented since
    * round 10) is now CODE: group cardinality is counted first (one
    * count-distinct aggregate), the bucket kernel runs at or under
    * `maxKernelGroups`, and above it the call dispatches to the plain
    * per-group window — with that many groups per-group parallelism is
    * free and the single-task-per-group hazard the kernel exists to
    * avoid has vanished, while the O(groups·B) offsets broadcast would
    * OOM the driver. A single massive tie block still lands in one
    * bucket: irreducible for full ranking (every row of the block must
    * be emitted with the same rank), bounded in practice by the tie
    * mass, not the group.
    *
    * Contract: `v` non-null (violations raise rather than silently
    * dropping rows from the bucket join), castable to double (bucketing
    * only — the within-bucket ordering compares original values).
    */
  def withGroupRanks(
      in: DataFrame,
      g: String,
      v: String,
      tieBreak: Seq[String] = Nil,
      buckets: Int = 1024,
      maxKernelGroups: Long = 512L): DataFrame = {
    val B = buckets
    val nGroups = in.agg(count_distinct(col(g))).first().getLong(0)
    if (nGroups > maxKernelGroups) return windowGroupRanks(in, g, v, tieBreak)
    val stats = in
      .groupBy(col(g))
      .agg(
        count(lit(1)).as("__rk_n"),
        min(col(v)).as("__rk_lo"),
        max(col(v)).as("__rk_hi"))

    val lo = col("__rk_lo").cast("double")
    val hi = col("__rk_hi").cast("double")
    val vd = col(v).cast("double")
    val bucketed = in
      .join(broadcast(stats), g)
      .withColumn(
        "__rk_b",
        when(col(v).isNull,
          raise_error(lit(s"withGroupRanks: null '$v' violates the non-null contract")).cast("int"))
          .when(hi > lo, least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
          .otherwise(lit(0)))
      .drop("__rk_lo", "__rk_hi")

    // cumulative-before offsets from the ≤B-entry per-group histogram —
    // an array fold over a bounded frame, never a window over the fact
    val offs = bucketed
      .groupBy(col(g), col("__rk_b"))
      .agg(count(lit(1)).as("__rk_c"))
      .groupBy(col(g))
      .agg(sort_array(
        collect_list(struct(col("__rk_b").as("b"), col("__rk_c").as("c")))).as("__rk_hs"))
      .select(col(g), explode(expr(
        """aggregate(__rk_hs,
             named_struct('cum', 0L,
               'out', CAST(array() AS ARRAY<STRUCT<b: INT, off: BIGINT>>)),
             (a, x) -> named_struct('cum', a.cum + x.c,
               'out', array_append(a.out, named_struct('b', x.b, 'off', a.cum)))).out"""))
        .as("__rk_o"))
      .select(col(g), col("__rk_o.b").as("__rk_b"), col("__rk_o.off").as("__rk_off"))

    // one exchange on (g, bucket); the three window expressions share it
    // (the (v, tieBreak…) sort satisfies the (v)-ordered frames). The
    // RANGE current-row frame counts the peer group of v, giving the
    // in-bucket max-rank without re-partitioning on (g, bucket, v).
    val wB = Window.partitionBy(col(g), col("__rk_b"))
    val ordCols = col(v).asc +: tieBreak.map(col(_).asc)
    val localRn = row_number().over(wB.orderBy(ordCols: _*))
    val localRank = rank().over(wB.orderBy(col(v).asc))
    val localCum = count(lit(1)).over(
      wB.orderBy(col(v).asc).rangeBetween(Window.unboundedPreceding, Window.currentRow))
    bucketed
      .join(broadcast(offs), Seq(g, "__rk_b"))
      .withColumn("__rk_rn", col("__rk_off") + localRn)
      .withColumn("__rk_rank", col("__rk_off") + localRank)
      .withColumn("__rk_ties", localCum - localRank + 1)
      .drop("__rk_b", "__rk_off")
  }

  /** The above-`maxKernelGroups` dispatch target: the plain per-group
    * window, emitting the exact (names, types, order, values) surface of
    * the bucket kernel — `g` first (the kernel's using-column join puts
    * it there), then the remaining input columns, then `__rk_n`,
    * `__rk_rn`, `__rk_rank`, `__rk_ties`. With many groups each group is
    * small relative to the data and groups spread across tasks on their
    * own, so the single-task sort the kernel exists to break is not a
    * hazard here — and one window pass beats the kernel's three scans.
    * The same non-null contract raises (post-window guard on `__rk_n`,
    * free on contract-abiding input) instead of ranking nulls first.
    */
  private def windowGroupRanks(
      in: DataFrame, g: String, v: String, tieBreak: Seq[String]): DataFrame = {
    val wG = Window.partitionBy(col(g))
    val ordCols = col(v).asc +: tieBreak.map(col(_).asc)
    val localCum = count(lit(1)).over(
      wG.orderBy(col(v).asc).rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val rest = in.columns.filterNot(_ == g).map(col).toSeq
    in
      .withColumn("__rk_n", count(lit(1)).over(wG))
      .withColumn("__rk_rn", row_number().over(wG.orderBy(ordCols: _*)).cast("long"))
      .withColumn("__rk_rank", rank().over(wG.orderBy(col(v).asc)).cast("long"))
      .withColumn("__rk_ties", localCum - rank().over(wG.orderBy(col(v).asc)))
      .withColumn("__rk_ties", col("__rk_ties") + 1L)
      .withColumn(
        "__rk_n",
        when(col(v).isNull,
          raise_error(lit(s"withGroupRanks: null '$v' violates the non-null contract")).cast("long"))
          .otherwise(col("__rk_n")))
      .select(col(g) +: rest ++: Seq(
        col("__rk_n"), col("__rk_rn"), col("__rk_rank"), col("__rk_ties")): _*)
  }

  /** SQL-standard NTILE(k) computed arithmetically from
    * [[withGroupRanks]]'s (`__rk_rn`, `__rk_n`): the first (n % k)
    * buckets take ceil(n/k) rows, the rest floor(n/k) — the split both
    * Spark's and DuckDB's window NTILE implement, without the
    * single-task per-group sort the window form costs. The guarded
    * divisor is never reached when n < k (every row then falls in the
    * first branch), it only keeps the unevaluated ELSE ANSI-safe.
    */
  def ntileSql(k: Int): String = s"""
    CAST(CASE
      WHEN __rk_rn <= (__rk_n % $k) * (__rk_n div $k + 1)
      THEN (__rk_rn - 1) div (__rk_n div $k + 1) + 1
      ELSE (__rk_n % $k) +
           (__rk_rn - (__rk_n % $k) * (__rk_n div $k + 1) - 1)
             div greatest(__rk_n div $k, 1L) + 1
    END AS INT)"""

  /** Refinement step: the exact value at per-group rank `kCol` (constant
    * within a group) for each group of `gcols`. Groups whose values are
    * ALL equal answer directly; at depth 0 the rest fall back to the
    * single-task within-group sort (bounded by the refined bucket by
    * then). Otherwise: same histogram machinery, one level narrower,
    * recursing again only on still-skewed buckets.
    */
  private def selectWithin(
      cand0: DataFrame,
      gcols: Seq[String],
      v: String,
      kCol: String,
      buckets: Int,
      skewFloor: Long,
      depth: Int): DataFrame = {
    val B = buckets
    val gc = gcols.map(col)
    // the candidate set feeds stats + bucketing + the final rescan; it is
    // itself the output of fact-scan + joins, so pin it once
    val cand = cand0.localCheckpoint()
    val stats = cand
      .groupBy(gc: _*)
      .agg(
        max(col(kCol)).as("__rw_k"),
        count(lit(1)).as("__rw_n"),
        min(col(v)).as("__rw_lo"),
        max(col(v)).as("__rw_hi"))
      .localCheckpoint()

    // guaranteed exit: an all-equal group answers with the shared value
    val constAns = stats
      .where(col("__rw_lo") === col("__rw_hi"))
      .select(gc :+ col("__rw_lo").as(v): _*)
    val varStats = stats.where(col("__rw_lo") =!= col("__rw_hi"))
    val varying = cand.drop(kCol).join(broadcast(varStats), gcols)

    if (depth <= 0) {
      val sel = varying
        .withColumn(
          "__rw_rn",
          row_number().over(Window.partitionBy(gc: _*).orderBy(col(v).asc)))
        .where(col("__rw_rn") === col("__rw_k"))
        .select(gc :+ col(v): _*)
      sel.unionByName(constAns)
    } else {
      val lo = col("__rw_lo").cast("double")
      val hi = col("__rw_hi").cast("double")
      val vd = col(v).cast("double")
      val bucketed = varying
        .withColumn(
          "__rw_b",
          least(lit(B - 1), floor((vd - lo) / (hi - lo) * B)).cast("int"))
        .select(gc ++ Seq(col(v), col("__rw_b")): _*)
      // per-bucket counts first, then fold into one sorted array per
      // group — the same two-hop histogram the top level runs
      val hist = bucketed
        .groupBy(gc :+ col("__rw_b"): _*)
        .agg(count(lit(1)).as("__rw_bc"))
      val harr = hist
        .groupBy(gc: _*)
        .agg(sort_array(collect_list(
          struct(col("__rw_b").as("b"), col("__rw_bc").as("c")))).as("__rw_hs"))
        .join(broadcast(varStats.select(gc ++ Seq(col("__rw_k"), col("__rw_n")): _*)), gcols)
      val targets = harr
        .withColumn(
          "__rw_sel",
          expr("""aggregate(__rw_hs,
                  named_struct('cum', 0L, 'tb', -1, 'cb', 0L),
                  (a, x) -> IF(a.tb >= 0, a,
                               IF(a.cum + x.c >= __rw_k,
                                  named_struct('cum', a.cum + x.c, 'tb', x.b, 'cb', a.cum),
                                  named_struct('cum', a.cum + x.c, 'tb', -1, 'cb', 0L))))"""))
        .select(
          gc ++ Seq(
            col("__rw_sel.tb").as("__rw_b"),
            (col("__rw_k") - col("__rw_sel.cb")).as("__rw_off"),
            (col("__rw_sel.cum") - col("__rw_sel.cb")).as("__rw_bc"),
            col("__rw_n")): _*)
        .localCheckpoint()

      val skewCond =
        col("__rw_bc") > greatest(lit(skewFloor), col("__rw_n") * SkewFactor / B)

      def sortPath(ts: DataFrame): DataFrame = bucketed
        .join(broadcast(ts), gcols :+ "__rw_b")
        .withColumn(
          "__rw_rn",
          row_number().over(
            Window.partitionBy(gc :+ col("__rw_b"): _*).orderBy(col(v).asc)))
        .where(col("__rw_rn") === col("__rw_off"))
        .select(gc :+ col(v): _*)

      val resolved =
        if (targets.where(skewCond).isEmpty) sortPath(targets)
        else {
          val ok = targets.where(!skewCond)
          val sk = targets.where(skewCond)
          val next = bucketed
            .join(broadcast(sk), gcols :+ "__rw_b")
            .select(gc ++ Seq(col(v), col("__rw_off")): _*)
          sortPath(ok).unionByName(
            selectWithin(next, gcols, v, "__rw_off", B, skewFloor, depth - 1))
        }
      resolved.unionByName(constAns)
    }
  }
}
