package graft.tools

import graft.{GraftSession, SparkEntry}

/** Physical-plan audit: asserts the optimizer properties the engine's
  * scale story depends on (SURVEY.md §4) actually hold — filters reach
  * the parquet scan, scans are column-pruned, dim joins broadcast, the
  * hot paths stay inside whole-stage codegen, and no fact-scale operator
  * degenerates to a single-partition global window.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  * Exits non-zero if any assertion fails.
  */
object PlanAudit {

  /** @param minWindowPartCols if > 0, every Window node in the plan must
    *   partition on at least this many columns — the structural guard
    *   against a rank selection regressing to a window partitioned solely
    *   by a ≤5-value group key (which sorts the whole fact in ≤5 tasks).
    */
  final case class Audit(
      query: String,
      mustContain: Seq[String],
      mustNotContain: Seq[String] = Nil,
      minWindowPartCols: Int = 0)

  /** Partition-spec column counts of every Window node in a physical-plan
    * string. WindowExec prints as
    * `Window [exprs...], [partitionSpec], [orderSpec]` — the second-to-
    * last bracket group is the partition spec; attributes in it are plain
    * `name#id` refs, so a top-level comma count is the column count.
    */
  private[graft] def windowPartCounts(plan: String): Seq[Int] =
    plan.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .flatMap { line =>
        "\\], \\[([^\\[\\]]*)\\], \\[[^\\[\\]]*\\]\\s*$".r
          .findFirstMatchIn(line)
          .map { m =>
            val spec = m.group(1).trim
            if (spec.isEmpty) 0 else spec.split(",").length
          }
      }
      .toSeq

  val audits: Seq[Audit] = Seq(
    // column pruning (ReadSchema lists only the 5 referenced lineitem
    // columns) + whole-stage codegen ("*(n)" stage markers)
    Audit("q01_agg",
      mustContain = Seq("ReadSchema: struct<l_quantity", "*(1)")),
    // filter pushdown into the parquet scan (PushedFilters string is
    // truncated in toString, so assert the scan-level DataFilters too)
    Audit("q09_range_predicate",
      mustContain = Seq("PushedFilters: [IsNotNull(l_shipdate)", "> 0.05)")),
    // explicit dim broadcast survives planning
    Audit("q06_join_broadcast_dim",
      mustContain = Seq("BroadcastHashJoin", "BroadcastExchange")),
    // small dims auto/hint broadcast in the 5-way join; no cartesian
    Audit("q05_join_multiway",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct")),
    // partitioned window, not a global one
    Audit("q13_window_rownum",
      mustContain = Seq("Window"),
      mustNotContain = Seq("SinglePartition")),
    // anti-join based merge stays a join, never a driver loop
    Audit("q18_merge_insert_only",
      mustContain = Seq("LeftAnti")),
    // codegen'd custom expression present in the similarity plan
    Audit("q35_cosine_topk",
      mustContain = Seq("vec_dot")),
    // top-k uses TakeOrderedAndProject (no full global sort at scale)
    Audit("q11_sort_limit",
      mustContain = Seq("TakeOrderedAndProject")),
    // promo range-join feature: the dim side broadcasts; the fact is
    // never cartesian-joined
    Audit("q49_promo_range_feature",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct")),
    // date-RANGE frames run as partitioned windows, not SinglePartition
    Audit("q54_window_range_frame",
      mustContain = Seq("Window"),
      mustNotContain = Seq("SinglePartition")),
    // LSH-banded near-dup generates candidates via equi-join buckets
    Audit("q41_cosine_neardup",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("CartesianProduct")),
    // seasonality windows partition by product key
    Audit("q52_seasonality_index",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct")),
    // as-of join is the union+window shape: one partitioned window, no
    // join node at all (a theta-join formulation would show
    // BroadcastNestedLoopJoin/CartesianProduct)
    Audit("q60_asof_join",
      mustContain = Seq("Window", "Union"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")),
    // unpivot expands in place — no shuffle of any kind
    Audit("q66_unpivot",
      mustContain = Seq("Expand"),
      mustNotContain = Seq("Exchange")),
    // jaccard rerank rides banded equi-join candidates — never all-pairs
    Audit("q32_dedup_ngram_jaccard",
      mustContain = Seq("word_shingles"),
      mustNotContain = Seq("CartesianProduct")),
    // IVF assignment is a 16-row broadcast, clustering/rerank equi-joins
    Audit("q45_ann_ivf",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("CartesianProduct")),
    // winnowing extracts fingerprints in place; only the doc-grain agg
    // shuffles, and nothing runs through a single-partition window
    Audit("q71_winnow_fingerprint",
      mustContain = Seq("winnow_fp"),
      mustNotContain = Seq("SinglePartition", "CartesianProduct")),
    // media decode is a typed per-partition map over the scan
    Audit("q69_wav_decode",
      mustContain = Seq("MapPartitions")),
    // token counting is a pure projection — zero shuffles
    Audit("q72_token_count_bpe",
      mustContain = Seq("Project"),
      mustNotContain = Seq("Exchange")),
    // quantized ANN candidates come from the bucket equi-join (the only
    // nested-loop is the 1-row quantizer-stats broadcast)
    Audit("q74_ann_int8",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("CartesianProduct")),
    // multi-probe assignment collapses the 16 scored centroid copies with
    // a map-side-combined aggregate (ObjectHashAggregate carrying the
    // collect_list) instead of dragging 16x-replicated embeddings through
    // a row_number window — the round-3 suite-max shuffle, now ~1/16th
    Audit("q77_ann_ivf_multiprobe",
      mustContain = Seq("vec_dot", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // the IVF+PQ composition keeps both parents' shapes: aggregation-
    // collapsed assignment and encode, keyed candidate joins, no
    // all-pairs anywhere
    Audit("q82_ann_ivf_pq",
      mustContain = Seq("vec_dot", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // the refine stage keeps q82's shapes and adds ONE bounded typed
    // aggregate (the PQ-ranked shortlist: R rows per query cross the
    // shuffle, never the candidate set) before the exact rerank — no
    // window over exploded candidates, no all-pairs
    Audit("q323_ann_ivf_pq_refine",
      mustContain = Seq("vec_dot", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // n_probe=4 keeps q77's aggregation-shaped assignment — raising the
    // probe count must not reintroduce the windowed-replication shuffle
    Audit("q95_ann_ivf_probe4",
      mustContain = Seq("vec_dot", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // multi-table LSH candidates ride a (table, bucket) equi-join of
    // slim key rows; embeddings join back by key for the exact rerank —
    // never all-pairs, never through a single-partition window
    Audit("q96_ann_lsh_multitable",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // random-hyperplane LSH: q96's candidate shape (slim key explode +
    // (t, bk) self-join + DISTINCT + keyed rerank) with the buckets
    // computed by seeded-hyperplane vec_dots — same plan discipline:
    // keyed joins only, embeddings never ride the 8-way explode
    Audit("q324_ann_lsh_hyperplane",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // corr/slope from decimal moment sums: one map-side-combined hash
    // aggregate, shuffle = 5 decimals + count per group; a window or
    // full-table rank anywhere means the formulation regressed
    Audit("q97_grouped_corr",
      mustContain = Seq("HashAggregate", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // argmax via struct-max must combine map-side (partial_max) and
    // never fall back to the windowed-rank shape the oracle uses
    Audit("q98_argmax_struct",
      mustContain = Seq("partial_max"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // funnel stages are user-keyed aggregations joined on their key —
    // the per-user stage tables must broadcast, and nothing may expand
    // to a cross product
    Audit("q101_funnel",
      mustContain = Seq("BroadcastHashJoin", "partial_min"),
      mustNotContain = Seq("CartesianProduct")),
    // retention: first-seen is a keyed aggregation broadcast back to
    // the log; count-distinct expands through a two-phase aggregate
    Audit("q102_retention_cohort",
      mustContain = Seq("BroadcastHashJoin", "partial_min"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // exact top-k scan: queries broadcast, corpus streamed, top-k
    // truncated map-side — candidate pairs must never shuffle (no
    // CartesianProduct pair-grid) and never rank through a window
    Audit("q44_topk_aggregator",
      mustContain = Seq("BroadcastNestedLoopJoin", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // resample + forward fill: the grid explode (Generate) and the
    // fill window must both stay user-partitioned — a SinglePartition
    // window would serialize the whole grid through one task
    Audit("q105_resample_ffill",
      mustContain = Seq("Generate", "Window"),
      mustNotContain = Seq("SinglePartition", "CartesianProduct")),
    // the distributed sweep-line exists precisely to avoid the global
    // ORDER BY ts — the sweep must be day-partitioned, with the
    // midnight correction arriving via the opening explode (Generate)
    Audit("q106_concurrency_sweep",
      mustContain = Seq("Generate", "Window"),
      mustNotContain = Seq("SinglePartition", "CartesianProduct")),
    // format choice must not cost the optimizer anything: the ORC scan
    // must receive the pushed predicate exactly like a parquet scan
    Audit("q109_orc_scan",
      mustContain = Seq("GreaterThanOrEqual(n_chars,200)", "EqualTo(lang,en)"),
      mustNotContain = Seq("PushedFilters: []")),
    // decontamination: the holdout shingle set and the contaminated-id
    // set are both small — they must broadcast into the semi/anti
    // joins, never shuffle the full training shingle stream by key
    Audit("q110_decontaminate",
      mustContain = Seq("word_shingles", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // sequence packing: per-source cumulative window + span explode —
    // never a global concat (that would be a single task)
    Audit("q142_sequence_packing",
      mustContain = Seq("Window", "Generate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // contamination report rides the q110 shingle-join shape: the
    // holdout side broadcasts, training shingles stream past it
    Audit("q143_contamination_report",
      mustContain = Seq("word_shingles", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // incremental dedup: band-keyed semi joins only — never the pair
    // graph, never a fixpoint, never all-pairs
    Audit("q144_incremental_dedup",
      mustContain = Seq("word_shingles", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // image perceptual-hash dedup: decode pass + (dims, hash)-keyed
    // aggregate/join — linear, no pair joins anywhere
    Audit("q145_image_phash_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // semantic dedup survivors: banded pairs + checkpointed CC labels
    // broadcast back — no all-pairs, no per-cluster sort
    Audit("q152_semantic_dedup_survivors",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // curriculum phases: the only window partitions by source (the
    // operator's own per-source ordering semantics) — never a global
    // sort of the corpus
    Audit("q150_curriculum_phases",
      mustContain = Seq("Window", "HashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // vocab coverage: top-100 must come off a TakeOrderedAndProject
    // heap, not a global sort of the vocabulary
    Audit("q151_vocab_coverage",
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("CartesianProduct")),
    // exact-substring spans: window hashes group/semi-join by hash key
    // only — no pair join, no single-partition stage anywhere
    Audit("q153_exact_substring_spans",
      mustContain = Seq("HashAggregate", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // BPE merge pairs: top-50 off a TakeOrderedAndProject heap over the
    // vocab-grain pair aggregate — never a global sort
    Audit("q154_bpe_merge_pairs",
      mustContain = Seq("TakeOrderedAndProject", "HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // source overlap: the per-source sizes broadcast onto the k^2-row
    // pair grid; the shingle self-join stays an equi-join
    Audit("q155_source_overlap",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // CDC chunking: chunk assembly is the collect_list object aggregate
    // bounded by doc length; duplicate detection is hash-keyed — no
    // pair join, nothing single-partition
    Audit("q157_cdc_chunking",
      mustContain = Seq("ObjectHashAggregate", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // EWMA: all 10 lags ride ONE user-partitioned window sort — never
    // a global (single-partition) window
    Audit("q158_ewma",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // prototypicality: centroid scoring is a 16-row broadcast; ranks
    // ride cid-partitioned windows — no all-pairs, nothing global
    Audit("q159_cluster_prototypes",
      mustContain = Seq("vec_dot", "BroadcastExchange"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // epoch shuffle: hash projection + one keyed aggregate — the
    // corpus is never sorted, nothing global
    Audit("q160_epoch_shuffle",
      // min(struct(h, doc_id)) keeps the aggregate out of the hash-agg
      // fast path (struct-typed buffer -> SortAggregate); still keyed
      // and map-side combined — the guards that matter are the absences
      mustContain = Seq("Aggregate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition", "windowspecdefinition")),
    // score drift: corpus collapses in the first bucket-grain
    // aggregate; everything after is O(sources x buckets)
    Audit("q161_score_drift",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // hybrid RRF: both sides end in TakeOrdered heaps; the fusion join
    // touches <=40 rows — never a corpus-sized sort
    Audit("q162_hybrid_rrf",
      mustContain = Seq("TakeOrderedAndProject", "vec_dot"),
      mustNotContain = Seq("CartesianProduct")),
    // filtered ANN: candidates come from the (centroid, label)
    // composite-key equi-join — never all-pairs
    Audit("q163_filtered_ann",
      mustContain = Seq("vec_dot", "BroadcastExchange"),
      mustNotContain = Seq("CartesianProduct")),
    // language sampling: corpus collapses in the lang-grain aggregate;
    // the only global windows run over #langs rows (bounded by
    // construction, the q151/q106 pattern)
    Audit("q164_language_sampling",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // interval overlap: candidates ride the hour-bucket EQUI-join —
    // the quadratic theta-join formulation would plan a cartesian or
    // nested-loop here
    Audit("q165_interval_overlap",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")),
    // LM perplexity: the scoring join is keyed (w1,w2) — the LM must
    // never be planned all-pairs against the doc grams, and InMemory
    // proves the single persisted corpus pass is actually reused
    Audit("q166_lm_perplexity",
      mustContain = Seq("ln(", "InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct")),
    // held-out backoff scoring: both LM joins stay keyed; the only
    // cross join is the 1-row totals broadcast
    Audit("q175_lm_backoff_score",
      mustContain = Seq("ln("),
      mustNotContain = Seq("CartesianProduct")),
    // PageRank: the final plan is the checkpointed last-iteration rank
    // vector — ExistingRDD is the evidence the iteration materialized
    // node-grain instead of growing a 3-deep corpus lineage
    Audit("q167_pagerank",
      mustContain = Seq("ExistingRDD"),
      mustNotContain = Seq("CartesianProduct")),
    // count-min: the grid builds as keyed integer aggregates (vocab
    // grain then (r,b) grain) — never a sort, never all-pairs
    Audit("q168_count_min",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // prefix-filter join: candidates ride the prefix-token EQUI-join
    // over the persisted set table — the all-pairs formulation the
    // oracle uses must never appear in the engine plan
    Audit("q169_jaccard_prefix_join",
      mustContain = Seq("InMemoryTableScan"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")),
    // audio fingerprint dedup: same shape as the image twin
    Audit("q146_audio_fingerprint_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // multimodal assembly is doc-keyed equi-joins only
    Audit("q147_multimodal_assembly",
      mustContain = Seq.empty,
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // the split assignment is a pure projection — ANY exchange means
    // someone turned a stateless stable split into a shuffle
    Audit("q113_train_split",
      mustContain = Seq("Project"),
      mustNotContain = Seq("Exchange", "Window", "HashAggregate")),
    // sequence assembly must stay one aggregate (collect_list buffers
    // via ObjectHashAggregate) — no window, no per-user sort pass
    Audit("q111_event_sequences",
      mustContain = Seq("ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // PII redaction is a stateless scrub pass — any exchange means the
    // projection picked up a shuffle somewhere
    Audit("q115_pii_redaction",
      mustContain = Seq("Project"),
      mustNotContain = Seq("Exchange", "Window", "HashAggregate")),
    // association rules: the O(#brands) count table must broadcast onto
    // the pair table; pair generation must stay a keyed self-join
    Audit("q116_assoc_rules",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct")),
    // the runtime bloom filter must actually be injected on the fact
    // side — this is a conf-gated optimizer rule that can vanish
    // silently on a Spark upgrade
    Audit("q117_bloom_filter_join",
      mustContain = Seq("might_contain"),
      mustNotContain = Seq("CartesianProduct")),
    // KMV signatures build through the map-side-truncated aggregator
    // (ObjectHashAggregate), never a global sort of the hash stream
    Audit("q118_kmv_set_algebra",
      mustContain = Seq("ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct")),
    // posting lists assemble where the term's rows land (collect_set in
    // an ObjectHashAggregate) — a window/global-sort formulation would
    // serialize the index build
    Audit("q119_inverted_index",
      mustContain = Seq("ObjectHashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // rollup merge is two algebraic hash aggregates with map-side
    // partials — no window, no join
    Audit("q120_rollup_merge",
      mustContain = Seq("HashAggregate", "partial_sum"),
      mustNotContain = Seq("Window", "SortMergeJoin", "CartesianProduct")),
    // the bigram denominator is a window over the REDUCED bigram table
    // partitioned by w1 — never a single-partition window, never a
    // second pass over raw tokens
    Audit("q121_bigram_lm",
      mustContain = Seq("Window", "HashAggregate"),
      mustNotContain = Seq("SinglePartition", "CartesianProduct")),
    // snapshot diff is ONE keyed full-outer shuffle join — no window,
    // no nested loop (full-outer equi-joins can't broadcast, so any
    // BNLJ here would mean the join keys got lost)
    Audit("q122_snapshot_diff",
      mustContain = Seq("FullOuter"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "Window")),
    // repetition signals are keyed two-level aggregations joined at
    // doc grain — token rows must never enter a window or cross join
    Audit("q123_doc_repetition",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // keep-first ownership is min(struct) AGGREGATION (sort-agg over
    // struct is fine) — the ROW_NUMBER-over-hash formulation the
    // oracle uses must NOT appear in the Spark plan
    Audit("q124_chunk_dedup",
      mustContain = Seq("partial_min"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // the z-key is a codegen'd projection; the only shuffle is the
    // bucket-profile aggregate — no join in the plan at all
    Audit("q125_zorder_layout",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Join", "Window", "CartesianProduct")),
    // the MG summary builds through the udaf's ObjectHashAggregate and
    // the recount is gated by a broadcast join of the <= m candidates
    Audit("q126_heavy_hitters",
      mustContain = Seq("ObjectHashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "Window", "SortMergeJoin")),
    // PMI joins REDUCED aggregates (bigrams x vocab); token-grain rows
    // must be aggregated before any join
    Audit("q127_pmi_collocations",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // tf-idf ranks a REDUCED (doc, term) table: the window must sit on
    // top of hash aggregates, never on token-grain rows. (The 1-row
    // corpus-count aggregate legitimately lands on a single partition,
    // so SinglePartition is NOT asserted absent here.)
    Audit("q128_tfidf_keywords",
      mustContain = Seq("Window", "HashAggregate", "WindowGroupLimit"),
      mustNotContain = Seq("CartesianProduct")),
    // exact median rides RankSelect's histogram kernel: the ONLY window
    // allowed partitions on (segment, value-bucket) — any window
    // partitioned solely by the 5-value segment key is the full-table-
    // sort-in-5-tasks regression this audit exists to catch
    Audit("q99_median_exact",
      mustContain = Seq("Window", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 2),
    // all four quantiles come from ONE histogram pass; same structural
    // guard as q99 — no window may partition on the segment key alone
    Audit("q103_quantile_grid",
      mustContain = Seq("Window", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 2),
    // both median passes ride RankSelect (windows partition on (type,
    // bucket), never type alone); the tiny median tables must come back
    // as broadcast hash joins, not shuffles
    Audit("q129_mad_anomaly",
      mustContain = Seq("Window", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 2),
    // the end-to-end corpus build composes five keyed/broadcast stages;
    // nothing may plan all-pairs or collapse to one task (the per-source
    // budget window is the q90 shape — sequential within a source by
    // the operator's own semantics, parallel across sources)
    Audit("q140_corpus_build",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // the classifier-driven twin: same composed-chain floors (the IRLS
    // fit runs eagerly; the returned chain must keep q140's shape with
    // the rank-kernel cut instead of the quality floor)
    Audit("q290_corpus_build_classified",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition"),
      minWindowPartCols = 1),
    // multiclass NB apply: the per-doc argmax is an AGGREGATE
    // (min-struct over the K-replicated scores) — a Window here means
    // the decision regressed to a fact-grain rank
    Audit("q296_nb_lang_apply",
      mustContain = Seq("partial_min"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // OvR logistic apply: same argmax-as-aggregate floor; the K-model
    // scores come from ONE broadcast of the K×5 β frame
    Audit("q306_ovr_logit_apply",
      mustContain = Seq("partial_min", "BroadcastNestedLoopJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // quantile-sketch build: the bottom-K ranks ride the RankSelect
    // kernel — every window partitions on (seg, hash-bucket), never a
    // per-segment single-task sort of the fact
    Audit("q301_quantile_sketch_build",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition"),
      minWindowPartCols = 1),
    // salted NB apply: the salt machinery must survive planning — the
    // large side carries the uniformity salt, the model side its
    // explode-replicated copies (a plan without __salt means Catalyst
    // or a refactor silently reverted to the skewed plain join)
    Audit("q299_nb_apply_salted",
      mustContain = Seq("__salt"),
      mustNotContain = Seq("CartesianProduct")),
    // video frame-sample dedup: decode is a map pass (the checkpointed
    // frame-hash scan); downstream is the video-grain fingerprint
    // aggregate + a small keeper join — no window, no cartesian
    Audit("q308_video_frame_dedup",
      mustContain = Seq("partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // the approx-quantile twin is the ONE-PASS cheap path: a mergeable
    // percentile sketch (ObjectHashAggregate) plus one exact counting
    // pass over a broadcast join — no window, no per-group sort anywhere
    Audit("q141_quantile_approx",
      mustContain = Seq("ObjectHashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "SortMergeJoin", "CartesianProduct", "SinglePartition")),
    // the HLL contract runs as one codegen'd aggregate pass — no sort,
    // no join beyond the group key
    Audit("q171_hll_distinct_contract",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "SinglePartition")),
    // the Gram matrix is explode + ONE keyed integer aggregate into a
    // fixed d^2 state — no window, no join beyond the broadcast stats
    Audit("q178_gram_matrix",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // the eigensolve runs on the COLLECTED d^2-bounded Gram (the
    // RankSelect scalar-gate altitude) — the result is a local relation
    Audit("q179_pca_power",
      mustContain = Seq("LocalTableScan"),
      mustNotContain = Seq("Exchange", "Window")),
    // the variance report is a local single row from the collected
    // Gram + the integer trace — the same scalar-gate altitude as q179
    Audit("q181_explained_variance",
      mustContain = Seq("LocalTableScan"),
      mustNotContain = Seq("Exchange", "Window")),
    // the projection pass is a scan+fold with the component as a plan
    // literal — the only non-scan machinery is the quantizer's 1-row
    // stats broadcast; no sort, no window, no corpus shuffle join
    Audit("q180_pca_project",
      mustContain = Seq("Project", "BroadcastExchange"),
      mustNotContain = Seq("Window", "SortMergeJoin", "CartesianProduct")),
    // the bootstrap is explode + two keyed aggregates — replicates must
    // never route through a window or a per-replicate sort
    Audit("q174_bootstrap_ci",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "SinglePartition")),
    // weighted median rides the same structural guard as q99/q103: the
    // only window partitions on (seg, bucket), never the segment alone
    Audit("q172_weighted_median",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 2),
    // skew profile is two keyed aggregations — no join, no window
    Audit("q130_key_skew_profile",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("Join", "Window", "CartesianProduct")),
    // URL parse + rollup: zero-shuffle projection into the Expand +
    // sort-aggregate shape Spark plans for multiple COUNT(DISTINCT)s
    Audit("q131_url_parse",
      mustContain = Seq("Expand", "SortAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "Join")),
    // erasure cascades through anti-joins; the request set broadcasts
    Audit("q132_gdpr_erasure",
      mustContain = Seq("LeftAnti", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // attribution is ONE user-partitioned carry-forward window over
    // the timeline — no join, no per-purchase subquery
    Audit("q133_attribution",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "CartesianProduct", "SinglePartition")),
    // the profiler stacks six 1-row column aggregates
    Audit("q134_table_profile",
      mustContain = Seq("Union", "Aggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "Join")),
    // CUSUM runs on the reduced daily table: type-partitioned windows
    // feeding an argmax aggregate — never a single-partition sort
    Audit("q135_cusum_changepoint",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "CartesianProduct", "SinglePartition")),
    // symmetric-delete blocking: candidates come from an EQUI-join on
    // deletion keys — a cartesian levenshtein sweep must never appear
    Audit("q136_fuzzy_match",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "Window")),
    // weighted sampling selects top-k by computed key: a per-partition
    // heap merge (TakeOrderedAndProject), never a global sort or a
    // single-partition row_number window
    Audit("q137_weighted_sample",
      mustContain = Seq("TakeOrderedAndProject"),
      mustNotContain = Seq("Window", "Join", "CartesianProduct")),
    // the evolved read is a pure scan + project: mergeSchema merges
    // footers at planning time, no shuffle and no ghost partition join
    Audit("q138_schema_evolution",
      mustContain = Seq("FileScan"),
      mustNotContain = Seq("Exchange", "Join", "Window")),
    // weighted approx-quantile: the sketch runs in an object aggregate
    // over the replicated stream; the counting pass broadcasts the
    // 5-row approx table — no window, no sort-merge anywhere
    Audit("q186_weighted_quantile_approx",
      mustContain = Seq("ObjectHashAggregate", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // winsorized mean: the cut values ride the RankSelect kernel (its
    // windows partition on (group, bucket) — never the 5-value segment
    // alone) and broadcast back for the clamped aggregate
    Audit("q188_winsorized_mean",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct"),
      minWindowPartCols = 2),
    // Welch t: two map-side-combined moment aggregates and a pivot —
    // no window, no join of row-grain relations at all
    Audit("q190_ab_welch_t",
      mustContain = Seq("HashAggregate", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // fuzzy edit-distance dedup: candidates come from the block-key
    // equi-join; levenshtein verifies in the projection — never
    // all-pairs
    Audit("q191_fuzzy_edit_dedup",
      mustContain = Seq("levenshtein"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop")),
    // k-component projection: 4 literal-array folds in ONE projection
    // pass over the pinned codes — no window, no join-by-key, nothing
    // quadratic (the only broadcast is the 1-row quantizer stats)
    Audit("q184_pca_project_k",
      mustContain = Seq("Project"),
      mustNotContain = Seq("CartesianProduct", "Window", "SortMergeJoin")),
    // matryoshka eval reuses q44's shape: queries broadcast, corpus
    // streamed through a BNLJ, both top-k heaps in one ObjectHashAgg
    Audit("q139_matryoshka_overlap",
      mustContain = Seq("BroadcastNestedLoopJoin", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "Window")),
    // PNG decode + quarantine dedup: the (dims, hash) keeper aggregate
    // joins back doc-grain — keyed, never all-pairs; the quarantine
    // union must not force anything quadratic
    Audit("q195_png_phash_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop")),
    // baseline-JPEG decode + quarantine dedup: q195's exact shape at
    // the third codec boundary — decode pass, keyed keeper aggregate,
    // quarantine union, nothing quadratic
    Audit("q261_jpeg_phash_dedup",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop")),
    // per-source quality-quintile cut: EVERY window partitions on
    // (source, score-bucket) — the 2-column floor structurally bans
    // the PERCENT_RANK-by-source sort that would serialize each
    // source through one task
    Audit("q262_quality_percentile_select",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 2),
    // |t|-ranked readout: the rank window runs over the O(segments)
    // aggregate output (a 5-row frame — SinglePartition is the correct
    // plan there, unlike the raw-data windows gated above), and the
    // heavy lifting stays in the partial-sum aggregate
    Audit("q196_ab_significance_rank",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // BPE apply: tokenization at vocab grain — the corpus-word join is
    // keyed on word (hash/SMJ both fine), never a nested loop; per-doc
    // counts are one hash aggregate
    Audit("q197_bpe_apply",
      mustContain = Seq("HashAggregate"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop")),
    // chi-square: one combined contingency aggregate, closed-form
    // statistic in the projection — no window, no join fan-out
    Audit("q198_ab_chi_square",
      mustContain = Seq("HashAggregate", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // z-order zone map: the Morton key is projected inline (bit ops stay
    // in codegen) and the cell stats are ONE keyed aggregate with
    // map-side partials — no window, no join, nothing quadratic
    Audit("q200_zorder_cell_stats",
      mustContain = Seq("HashAggregate", "partial_min", "partial_max"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // OLS fit: part broadcasts into the fact scan and the 10 moment
    // sums map-side-combine — shuffle is O(brands), the 3×3 Cramer
    // solve is a projection over the reduced frame. No window, no
    // sort-merge, nothing row-grain past the aggregate.
    Audit("q204_ols_fit",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // OLS apply: the O(brands) coefficient frame must come back as a
    // BROADCAST join onto the observation rows — scoring 100 TB is a
    // map-only stage, so any SortMergeJoin here means the plan started
    // shuffling the fact on brand
    Audit("q205_ols_score",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // logistic APPLY: scoring is a map-only projection over the feature
    // frame (5 driver doubles folded into the expressions) — ANY
    // exchange/join/window here means the curation pass stopped being
    // embarrassingly parallel
    Audit("q264_logit_quality_apply",
      mustContain = Seq("Project"),
      mustNotContain = Seq("Exchange", "Window", "CartesianProduct",
        "SortMergeJoin", "BroadcastHashJoin")),
    // STAGED logistic apply: after the train-once/stage step runs
    // eagerly, the RETURNED apply plan must read the staged model as
    // plan literals — same zero-exchange floor as q264, and crucially
    // zero fit machinery (no aggregates at all: a HashAggregate here
    // means apply re-derived the model)
    Audit("q291_logit_staged_apply",
      mustContain = Seq("Project"),
      mustNotContain = Seq("Exchange", "Window", "CartesianProduct",
        "SortMergeJoin", "BroadcastHashJoin", "HashAggregate")),
    // STAGED GBT apply: one feature-frame scan (part broadcasts into
    // it) + the model folded as literals — zero aggregates, zero
    // windows in the returned plan (the q267 scoring shape without the
    // refit's eager jobs)
    Audit("q292_gbt_staged_apply",
      mustContain = Seq("Project", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin",
        "HashAggregate")),
    // STAGED forest apply: same contract as q282's scoring projection,
    // plus the no-aggregate floor (regrowing the forest inside apply
    // would surface as histogram aggregates)
    Audit("q293_forest_staged_apply",
      mustContain = Seq("Project", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin",
        "HashAggregate")),
    // rank-kernel dispatch, high-cardinality arm: above maxKernelGroups
    // the call must be ONE plain per-group window pass — no bucket
    // histogram, no offsets broadcast (the kernel's machinery would OOM
    // at high group cardinality and buys nothing: parallelism across
    // 1500 customers is free)
    Audit("q269_rank_dispatch_window",
      mustContain = Seq("Window"),
      mustNotContain = Seq("__rk_off", "__rk_b", "CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1),
    // logistic holdout AUC: the IRLS fit runs eagerly (O(d²) moment
    // aggregates, audited via q204's shape); the returned eval plan
    // ranks holdout scores through the RankSelect kernel. The single
    // evaluation group is a LITERAL, which Catalyst constant-folds out
    // of the window partition spec — so the floor is 1: the remaining
    // partition column IS the score bucket (~n/1024 rows per task), and
    // a fully-unpartitioned global rank sort would show 0 columns
    Audit("q265_logit_holdout_auc",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1),
    // binary-quantized ANN: the tiny query side broadcasts through a
    // BNLJ Hamming scan (bit_count stays in codegen); the float
    // vectors are only touched in the 16-candidate rerank — no
    // shuffled join of corpus-grain relations anywhere
    Audit("q215_ann_binary",
      mustContain = Seq("BroadcastNestedLoopJoin", "bit_count", "vec_dot"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // Spearman: day-grain collapse first; rank windows order O(days)
    // rows per group, Pearson-on-ranks is one decimal moment aggregate
    Audit("q221_spearman_corr",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // exact KS: value-grain collapse first (partial_sum), bucket
    // offsets via a 64-row window, the exact sweep windowed at
    // (seg, bucket) grain — no sort of row-grain data, no quadratic
    Audit("q219_ks_drift",
      mustContain = Seq("partial_sum", "Window", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition")),
    // unlearning: TWO moment aggregates (full + erased-only, the
    // erased side filter-pushed) joined at O(groups) grain — no
    // corpus-sized join, no window, nothing quadratic
    Audit("q217_model_unlearning",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // ridge: identical plan contract to the OLS fit — the λ diagonal
    // is a literal in the reduced-side projection, costs nothing
    Audit("q213_ridge_fit",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // 4-fold CV: ONE moment pass at (brand, fold) grain; the total
    // rollup, train subtraction, per-fold solve and SSE all happen on
    // the O(groups·folds) reduced frame — no second scan of the fact
    Audit("q214_ols_cv",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // Holt forecast: the day-grain decimal pre-aggregation map-side-
    // combines (the only corpus-sized shuffle); the fold runs over
    // collected per-segment day arrays (ObjectHashAggregate) — nothing
    // row-grain ever windows or nested-loops
    Audit("q208_holt_forecast",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "BroadcastNestedLoop")),
    // Holt-Winters: q208's contract — day-grain partial-sum pre-agg,
    // per-group array fold (the 7 seasonal slots ride the accumulator,
    // costing nothing in plan shape)
    Audit("q218_holt_winters",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct", "BroadcastNestedLoop")),
    // backtest: the O(segments) fit BROADCASTS onto the holdout rows
    // (scoring is map-side) and the |error| terms decimal-sum in a
    // keyed aggregate; the only window is the day-grain rank over the
    // pre-aggregated frame, never over the fact
    Audit("q209_forecast_backtest",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin")),
    // conformal interval: same backtest scaffolding — broadcast fit,
    // keyed O(H)-element calibration aggregate, no fact-grain window
    // regression, nothing quadratic
    Audit("q211_forecast_interval",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin")),
    // histogram split finding: the part dim broadcasts into the scan,
    // the (feature, bin) histogram map-side-combines, and the window
    // operators only ever see the O(features × bins) reduced frame —
    // nothing row-grain is ever sorted or sort-merge-joined
    Audit("q223_tree_split",
      mustContain = Seq("BroadcastHashJoin", "partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // depth-2 leaf-wise tree: the root argmax collects and the leaf-
    // conditional histogram sits behind a localCheckpoint (the q247
    // audit-scope caveat — its scan + part broadcast + aggregate are
    // the same audited q223 shape), so the visible plan is the per-leaf
    // split finding: prefix windows over the O(features × bins) frame
    // and a TakeOrderedAndProject argmax — never a sort-merge of rows
    Audit("q255_tree_depth2",
      mustContain = Seq("Window", "TakeOrderedAndProject"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition")),
    // boosted-model apply: training reduces to 3 collected stumps, so
    // the scoring plan is scan + literal projection — the model needs
    // no join at all and nothing in the apply path windows or shuffles
    Audit("q225_gbdt_score",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // k-means assignment: the K×d centroid table broadcasts (BNLJ over
    // the streamed corpus) and the argmin is an aggregation — never a
    // window or sort over corpus-grain rows; the seed window lives
    // behind the localCheckpoint and must not appear in the final plan
    Audit("q226_kmeans_lloyd",
      mustContain = Seq("BroadcastNestedLoopJoin", "partial_min"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin", "SinglePartition")),
    // k-means-parallel seeded Lloyd: the seeding's corpus passes are
    // the same broadcast-argmin shape and the greedy reduction runs on
    // ≤33 collected rows before this plan, so the audited final
    // assignment is exactly q226's — broadcast + aggregation-argmin
    Audit("q259_kmeans_parallel_init",
      mustContain = Seq("BroadcastNestedLoopJoin", "partial_min"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin", "SinglePartition")),
    // triangle counting: wedge build and closure are keyed equi-joins
    // (the closure a LeftSemi), orientation compares (deg, id) tuples
    // in the join condition — no cartesian; the ONLY window is the
    // per-node top-3 partner rank (partitioned by node, never global)
    Audit("q227_triangle_count",
      mustContain = Seq("LeftSemi", "Window"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "SinglePartition"),
      minWindowPartCols = 1),
    // nearest-centroid classifier: the O(classes × d) centroid table
    // broadcasts (BNLJ over the streamed holdout), argmin is an
    // aggregation — no corpus-grain window or sort-merge anywhere
    Audit("q229_centroid_classifier",
      mustContain = Seq("BroadcastNestedLoopJoin", "partial_min"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin", "SinglePartition")),
    // silhouette: both distances come from ONE broadcast pass over the
    // final centroids; first/second-nearest fall out of a per-vector
    // 8-element sorted-list aggregate, never a pairwise join or window
    Audit("q230_cluster_silhouette",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin", "SinglePartition")),
    // ALS recommend: the BOUNDED candidate set broadcasts (BNLJ), the
    // already-purchased filter is a keyed LeftAnti on (u, i), and the
    // top-3 window partitions by user over ≤50 candidate rows — the
    // users × catalog cartesian never appears
    Audit("q233_als_recommend",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition"),
      minWindowPartCols = 1),
    // clustering coefficient: triangle closure is a keyed LeftSemi,
    // corner counts are a plain aggregate, and the only window is the
    // per-node top-3 partner rank of the kNN build — no cartesian, no
    // global sort
    Audit("q235_clustering_coefficient",
      mustContain = Seq("LeftSemi", "Window"),
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoop", "SinglePartition"),
      minWindowPartCols = 1),
    // ALS holdout eval: candidate set broadcasts (BNLJ), train
    // purchases excluded by LeftAnti, hits found by keyed LeftSemi at
    // holdout grain; the ranking window partitions by user.
    // SinglePartition is NOT banned here: Catalyst injects its own
    // runtime bloom-filter (partial/final bloom_filter_agg over a
    // SinglePartition reduce — a constant-size sketch, not a data
    // sort) for the holdout semi-joins, which is exactly the pushdown
    // we want at scale.
    Audit("q237_als_eval",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct"),
      minWindowPartCols = 1),
    // rank-4 ALS recommend: q233's exact candidate shape (bounded
    // broadcast, keyed LeftAnti, per-user window) with the generated-
    // elimination solve as a projection — rank changes the arithmetic,
    // not the plan
    Audit("q257_als_recommend_r4",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition"),
      minWindowPartCols = 1),
    // rank-4 ALS holdout eval: q237's shape (see its SinglePartition
    // caveat — Catalyst's runtime bloom filter) at rank 4
    Audit("q258_als_eval_r4",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct"),
      minWindowPartCols = 1),
    // STAGED ALS recommend (rank 2/4): after train-once/stage runs
    // eagerly, the returned SERVE plan reads the staged factor tables
    // and the purchase history only — same bounded-candidate shape as
    // the refit twins, and crucially no half-step machinery (no moment
    // aggregate aliases: s11/s_0_0 in the plan would mean serve
    // re-derived the factors)
    Audit("q311_als_staged_recommend",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition", "s11#", "s12#"),
      minWindowPartCols = 1),
    Audit("q313_als_staged_recommend_r4",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti"),
      mustNotContain = Seq("CartesianProduct", "SinglePartition", "s_0_0#", "s_0_1#"),
      minWindowPartCols = 1),
    // STAGED ALS eval (rank 2/4): q237/q258's hit-flag shape served from
    // the staged tables — zero moment aggregates in the returned plan
    Audit("q312_als_staged_eval",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "s11#", "s12#"),
      minWindowPartCols = 1),
    Audit("q314_als_staged_eval_r4",
      mustContain = Seq("BroadcastNestedLoopJoin", "LeftAnti", "LeftSemi"),
      mustNotContain = Seq("CartesianProduct", "s_0_0#", "s_0_1#"),
      minWindowPartCols = 1),
    // Kafka wire ingest: one map pass (binaryFile scan → parser flatMap
    // → from_json) into the windowed aggregate — no join, no window
    // function, nothing that couldn't run one-task-per-broker-segment
    Audit("q315_kafka_wire_ingest",
      mustContain = Seq("HashAggregate", "from_json"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "Window",
        "BroadcastHashJoin")),
    // recovery twin: same single map pass — batch-skip/torn-stop logic
    // lives inside the parser, it must not add plan machinery
    Audit("q317_kafka_wire_recovery",
      mustContain = Seq("HashAggregate", "from_json"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "Window",
        "BroadcastHashJoin")),
    // temperature sampling: one corpus scan to source-grain token sums,
    // a broadcast of the O(#sources) rate table back onto the corpus,
    // and a map-side accept projection — no row-grain shuffle join, no
    // window anywhere
    Audit("q318_temperature_sample",
      mustContain = Seq("BroadcastHashJoin", "partial_sum"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "Window")),
    // triplet mining: banded positives + in-list negatives, both
    // argmaxes as bounded top-1 aggregates — a Window here means a
    // candidate explosion shuffled whole; no all-pairs anywhere
    Audit("q319_triplet_mining",
      mustContain = Seq("vec_dot", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // overlap chunking: one generate-shaped projection per doc — no
    // shuffle machinery at all (any Exchange means the per-doc window
    // arithmetic regressed into a join or aggregation)
    Audit("q320_overlap_chunking",
      mustContain = Seq("Generate"),
      mustNotContain = Seq("Exchange", "CartesianProduct", "SortMergeJoin",
        "Window", "HashAggregate")),
    // chunk dedup report: fingerprints shuffle (md5-keyed argmin +
    // doc-grain rollup), text and word arrays never do — no window,
    // no all-pairs
    Audit("q322_chunk_dedup_report",
      mustContain = Seq("partial_min", "Generate"),
      mustNotContain = Seq("CartesianProduct", "Window", "BroadcastNestedLoopJoin")),
    // ALS warm refresh: the single half-step runs EAGERLY (halfStep
    // localCheckpoints its entity-grain output), so the returned plan
    // must be exactly the checkpoint scan + rounding projection —
    // any join/aggregate/window here means the refresh re-derived
    // state lazily per read
    Audit("q321_als_factor_refresh",
      mustContain = Seq("ExistingRDD"),
      mustNotContain = Seq("CartesianProduct", "Window", "HashAggregate",
        "SortMergeJoin", "BroadcastHashJoin")),
    // embedding-space image dedup: the eager stages (decode checkpoint,
    // bounded-top-1 assignment, CC contraction) run before the returned
    // plan, which is the checkpoint scan + the broadcast label join —
    // never an all-pairs shape. (The label subtree's final CC pass may
    // keep a keyed sort-merge join — node-grain, legitimate — so SMJ is
    // not banned here.)
    Audit("q316_image_embed_dedup",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "Window")),
    // Kaplan-Meier: the corpus collapses to customer grain then to
    // (segment, duration-day) grain in map-side-combined aggregates;
    // the at-risk window and the per-segment product fold
    // (ObjectHashAggregate collect) only ever see the calendar-bounded
    // life table — nothing fact-grain windows or nested-loops
    Audit("q238_kaplan_meier",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // log-rank: same customer→day-grain collapse as q238; the segment
    // pair grid is a tiny broadcast (the < self-join is the one
    // legitimate BNLJ) and the E/V folds are ObjectHashAggregate
    // collects over the calendar-bounded paired life table — no keyed
    // join ever reaches fact grain
    Audit("q239_logrank",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // retention AUC: one customer-grain aggregate, then the RankSelect
    // full-ranking kernel — EVERY window partitions on (segment,
    // value-bucket), so no task ever sorts more than ~n/1024 rows; a
    // window partitioned on the segment alone (the round-9 single-task
    // sort) is structurally banned by the 2-column floor
    Audit("q241_retention_auc",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 2),
    // isotonic calibration: deciles come from the RankSelect full-
    // ranking kernel ((segment, bucket)-partitioned windows only — the
    // 2-column floor bans a segment-grain ntile sort); the decile
    // prefix sums are an array fold, and everything after the decile
    // aggregate is O(segments × 100) interval/grid joins — keyed on
    // seg, never a cartesian
    Audit("q245_isotonic_calibration",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct"),
      minWindowPartCols = 2),
    // MAD anomaly report: two RankSelect histogram kernels (their
    // windows partition on (group, bucket)) + the seg-partitioned
    // top-5 window; medians broadcast back onto the day grain
    Audit("q246_mad_anomalies",
      mustContain = Seq("Window", "BroadcastHashJoin"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 1),
    // Theil-Sen: the pair self-join is seg-keyed over the 120-day
    // frame (calendar²-bounded, right side broadcast outright); the
    // slope-rank window partitions by segment. The day aggregate sits
    // behind the localCheckpoint (the q99 audit-scope caveat), so the
    // guarded shape is the pair join + window.
    Audit("q247_theil_sen",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1),
    // Gini: one map-side-combined fact aggregate, a value-grain
    // aggregate (distinct order counts are bounded), and the tie-block
    // rank-sum identity applied in a sorted-array fold — NO window of
    // any kind remains (the round-9 per-segment customer sort is gone)
    Audit("q248_gini",
      mustContain = Seq("partial_count", "ObjectHashAggregate"),
      mustNotContain = Seq("windowspecdefinition", "CartesianProduct", "SortMergeJoin")),
    // RFM: the whole point is NO global ntile sort — quintile
    // boundaries come from RankSelect's (group, bucket)-partitioned
    // kernel and broadcast back; scoring is map-only over the
    // customer grain. The group key is a literal ("all"), which
    // Catalyst folds out of the window partition, so the kernel's
    // windows show bucket-only (1 col) — still bucket-bounded,
    // never a global sort (SinglePartition stays banned).
    Audit("q249_rfm",
      mustContain = Seq("Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "SinglePartition"),
      minWindowPartCols = 1),
    // RMST rides q238's exact shape: customer→day-grain aggregates,
    // the per-segment fold an ObjectHashAggregate collect
    Audit("q250_rmst",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // FK audit: six keyed LeftAnti probes — never a cartesian; the
    // per-edge counts are 1-row broadcasts composed by union
    Audit("q251_fk_audit",
      mustContain = Seq("LeftAnti"),
      mustNotContain = Seq("CartesianProduct")),
    // Greenwood band: q238's exact shape with a second fold column
    Audit("q252_km_greenwood",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // cohort LTV: one customer-grain aggregate, one keyed fact join,
    // a (cohort, month-age) aggregate and a cohort-partitioned cumsum
    Audit("q253_cohort_ltv",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct"),
      minWindowPartCols = 1),
    // quartile lifetimes: the q238 fold read three ways — same shape
    Audit("q254_km_quartiles",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    // Naive Bayes fit: one map-side-combined explode aggregate to
    // (token, class) grain, a vocab-grain rollup broadcast back as a
    // 1-row constants frame (BNLJ on 1 row, not a cartesian of
    // relations) — no window, no shuffled join of corpus-grain data
    Audit("q273_nb_fit",
      mustContain = Seq("partial_sum", "BroadcastNestedLoopJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // NB apply: fold-4 doc-token counts joined to the vocab-grain model
    // (token-keyed, AQE picks broadcast at gated scale), constants as
    // 1-row broadcasts, per-doc sorted fold in ObjectHashAggregate —
    // never a window, never a cartesian of real relations
    Audit("q274_nb_apply",
      mustContain = Seq("partial_sum", "ObjectHashAggregate"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // χ² selection: presence aggregate + vocab-grain rollup + 1-row
    // totals broadcast; the statistic is a pure projection
    Audit("q276_chi2_tokens",
      mustContain = Seq("partial_count", "BroadcastNestedLoopJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // learning curve: all four models' holdout scores rank in ONE
    // kernel pass (group = model id) — same floors as q265
    Audit("q287_learning_curve",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1),
    // source report: map-only scoring + ONE source-grain aggregate —
    // the q264 no-exchange-scoring rule with a single rollup on top
    Audit("q289_source_quality_report",
      mustContain = Seq("partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin",
        "BroadcastHashJoin")),
    // Murphy decomposition: the q270 rank-kernel decile shape plus two
    // O(1) reductions — same floors as q265/q270
    Audit("q286_brier_decomposition",
      mustContain = Seq("partial_sum", "Window"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1),
    // target encoding: one (brand, fold)-grain map-side-combined
    // aggregate, an O(brands) rollup, a 1-row broadcast — no window,
    // no fact-grain join (the out-of-fold sums come from SUBTRACTION)
    Audit("q285_target_encode_oof",
      mustContain = Seq("partial_sum", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // forest apply: Bags trees folded into ONE projection over the
    // feature frame (part broadcasts into the scan) — scoring shuffles
    // nothing, no window, no join of fact-grain relations
    Audit("q282_forest_apply",
      mustContain = Seq("Project", "BroadcastHashJoin"),
      mustNotContain = Seq("Window", "CartesianProduct", "SortMergeJoin")),
    // OOV rate: explode aggregates + a token-keyed LEFT join (free to
    // be SMJ at corpus scale) + a ≤|langs| rollup — never a window
    Audit("q279_oov_rate",
      mustContain = Seq("partial_count"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // McNemar: two doc-grain scoring chains joined on doc_id and
    // reduced to one row — decisions are projections, no window
    Audit("q280_mcnemar_models",
      mustContain = Seq("partial_sum"),
      mustNotContain = Seq("Window", "CartesianProduct")),
    // average precision: two RankSelect kernel passes (holdout ranks,
    // positive ranks) — both windows ride the (bucket) partition after
    // the literal group folds away (the q265 floor argument); the AP
    // reduction is one decimal aggregate
    Audit("q277_logit_avg_precision",
      mustContain = Seq("Window", "partial_sum"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin"),
      minWindowPartCols = 1)
  )

  /** productDemand must never hint-broadcast a fact-grain relation.
    * With auto-broadcast disabled, the ONLY BroadcastHashJoins left are
    * the two explicit dim hints (current price, calendar); the
    * inventory / promo / weather joins must plan as shuffle joins.
    * Returns 0 on pass, 1 on fail.
    */
  private def auditProductDemand(spark: org.apache.spark.sql.SparkSession): Int = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prevT  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAq = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val d = to_date(lit("2025-06-01"))
      val dailySales = Seq((1, 1, 5L, java.math.BigDecimal.valueOf(10)))
        .toDF("product_id", "store_id", "daily_units", "daily_revenue").withColumn("date", d)
      val factPromos = Seq((1, "SUMMER", 10.0))
        .toDF("product_id", "promo_type", "discount_percentage")
        .withColumn("start_date", d).withColumn("end_date", d)
      val invDaily = Seq((1, 1, 100.0, 0.05))
        .toDF("product_id", "store_id", "inventory_level", "waste_ratio").withColumn("date", d)
      val dimPricing = Seq((1, true, java.math.BigDecimal.valueOf(3)))
        .toDF("product_id", "is_current_record", "avg_price")
      val dimCalendar = Seq(("Sunday", false, Option.empty[String], "Summer"))
        .toDF("day_name", "is_holiday", "holiday_name", "season").withColumn("date", d)
      val dimWeather = Seq((1, "sunny"))
        .toDF("store_id", "weather_condition").withColumn("date", d)
      val df = graft.etl.MlFeatures.productDemand(
        dailySales, factPromos, invDaily, dimPricing, dimCalendar, dimWeather)
      df.collect()
      // AQE's toString repeats the tree under "== Initial Plan ==" —
      // count join nodes only in the final section
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
      if (nBhj == 2) { println("[plan-audit] PASS productDemand_no_fact_broadcast"); 0 }
      else {
        println(s"[plan-audit] FAIL productDemand_no_fact_broadcast: " +
          s"expected exactly 2 hinted BroadcastHashJoins, saw $nBhj")
        println(plan.linesIterator.take(60).mkString("\n"))
        1
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      // unset when previously unset: an explicit -1 means "disabled",
      // not "fall back to the regular threshold"
      prevAq match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  /** The broadcast-dependent joins' broadcast→SMJ degradation path:
    * with auto-broadcast disabled (base + AQE), each query must re-plan
    * as a key-partitioned SortMergeJoin — never a
    * BroadcastNestedLoopJoin or cartesian expansion. Value equality of
    * the two paths is proven separately in BroadcastFallbackSpec; here
    * the per-round audit pins the degraded plan SHAPE — for the batch
    * queries via the executed plan, for q192's stream-static band join
    * via a foreachBatch sink over the real micro-batch plans. Returns
    * the number of failures.
    */
  private[tools] val fallbackQueries =
    Seq("q110_decontaminate", "q143_contamination_report", "q144_incremental_dedup",
      "q191_fuzzy_edit_dedup")
  // +1 for the q192 streaming case below
  private def fallbackAuditCount = fallbackQueries.size + 1

  private def auditBroadcastFallback(spark: org.apache.spark.sql.SparkSession, sfDir: String): Int = {
    val prevT  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAq = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val qs = SparkEntry.queries
      def judge(q: String, plans: Seq[String]): Int = {
        val bad = plans.flatMap { plan =>
          Seq(
            (!plan.contains("SortMergeJoin"))        -> "missing SortMergeJoin",
            plan.contains("BroadcastNestedLoop")     -> "unexpected BroadcastNestedLoop",
            plan.contains("CartesianProduct")        -> "unexpected CartesianProduct"
          ).collect { case (true, msg) => msg }
        }.distinct
        if (bad.isEmpty) { println(s"[plan-audit] PASS ${q}__smj_fallback"); 0 }
        else {
          println(s"[plan-audit] FAIL ${q}__smj_fallback: ${bad.mkString("; ")}")
          plans.foreach(p => println(p.linesIterator.take(40).mkString("\n")))
          1
        }
      }
      val batchFails = fallbackQueries.map { q =>
        val df = qs(q)(spark, sfDir)
        df.collect()
        judge(q, Seq(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)))
      }.sum
      // q192: the join lives inside each micro-batch, and the DF a sink
      // sees is the already-computed batch output (Scan ExistingRDD) —
      // read the REAL IncrementalExecution plan off the StreamExecution
      val sq = graft.sources.TextFormats.streamDedupGateDf(spark, sfDir)
        .writeStream
        .format("noop")
        .outputMode("append")
        .start()
      val mbPlan =
        try { sq.processAllAvailable(); org.apache.spark.sql.graft.StreamPlan.lastExecutedPlan(sq) }
        finally sq.stop()
      val streamFails =
        if (mbPlan.isEmpty) {
          println("[plan-audit] FAIL q192__smj_fallback: no micro-batch executed"); 1
        } else judge("q192_stream_dedup_gate", Seq(mbPlan))
      batchFails + streamFails
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      prevAq match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  /** Round-9 index/layout scans: q199's and q201's SparkEntry results
    * are pinned via localCheckpoint (their temp warehouses are deleted
    * before return), so the scans that carry their scale story are
    * re-audited here against freshly built state:
    *  - q199 retrieval must BUCKET-prune — SelectedBucketsCount ≤ K of
    *    32 on the term-bucketed postings scan (K = query terms);
    *  - q201's box scan must PARTITION-prune — a zbucket partition
    *    filter, reading exactly the box's candidate cells.
    * Returns the number of failures.
    */
  private val indexScanAuditCount = 3

  private def auditIndexScans(spark: org.apache.spark.sql.SparkSession, sfDir: String): Int = {
    import org.apache.spark.sql.functions._
    var failed = 0
    val whRoot = java.nio.file.Files.createTempDirectory("graft_audit_bm25_").toString
    val wh = new graft.etl.Warehouse(spark, whRoot)
    try {
      graft.functions.TextQueries.bm25IngestBatch(
        wh, graft.functions.TextQueries.bm25DocTerms(spark, sfDir))
      val plan = graft.functions.TextQueries.withBucketPruning(spark) {
        val q = graft.functions.TextQueries.bm25IndexScores(wh)
        q.collect()
        q.queryExecution.executedPlan.toString
      }
      val pruned = "SelectedBucketsCount: (\\d+) out of 32".r
        .findFirstMatchIn(plan).exists(_.group(1).toInt <= 3)
      if (pruned) println("[plan-audit] PASS q199__bucket_pruned_retrieval")
      else {
        failed += 1
        println("[plan-audit] FAIL q199__bucket_pruned_retrieval: no <=3/32 SelectedBucketsCount")
        println(plan.linesIterator.take(30).mkString("\n"))
      }
      // phrase retrieval must prune to the TWO phrase terms' buckets
      val phrasePlan = graft.functions.TextQueries.withBucketPruning(spark) {
        val q = graft.functions.TextQueries.phraseMatches(wh)
        q.collect()
        q.queryExecution.executedPlan.toString
      }
      val phrasePruned = "SelectedBucketsCount: (\\d+) out of 32".r
        .findFirstMatchIn(phrasePlan).exists(_.group(1).toInt <= 2)
      if (phrasePruned) println("[plan-audit] PASS q260__bucket_pruned_phrase")
      else {
        failed += 1
        println("[plan-audit] FAIL q260__bucket_pruned_phrase: no <=2/32 SelectedBucketsCount")
        println(phrasePlan.linesIterator.take(30).mkString("\n"))
      }
    } finally {
      wh.dropCatalogDb()
      graft.Staging.deleteRecursively(java.nio.file.Paths.get(whRoot))
    }
    val zRoot = java.nio.file.Files.createTempDirectory("graft_audit_zorder_").toString
    try {
      import graft.operators.ZOrderQueries
      graft.Tables.lineitem(spark, sfDir)
        .withColumn("zbucket", ZOrderQueries.zbucket(col("l_partkey"), col("l_suppkey")))
        .repartition(col("zbucket"))
        .write.mode("overwrite").partitionBy("zbucket").parquet(s"$zRoot/lineitem_z")
      val cells = ZOrderQueries.candidateCells(40L, 160L, 3L, 8L)
      val q = spark.read.parquet(s"$zRoot/lineitem_z")
        .where(col("zbucket").isin(cells: _*))
        .where(col("l_partkey").between(40L, 160L) && col("l_suppkey").between(3L, 8L))
        .agg(count(lit(1)))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      if ("PartitionFilters: \\[[^\\]]*zbucket".r.findFirstIn(plan).isDefined)
        println("[plan-audit] PASS q201__partition_pruned_box_scan")
      else {
        failed += 1
        println("[plan-audit] FAIL q201__partition_pruned_box_scan: no zbucket partition filter")
        println(plan.linesIterator.take(30).mkString("\n"))
      }
    } finally graft.Staging.deleteRecursively(java.nio.file.Paths.get(zRoot))
    failed
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // trailing args (if any) restrict the run to the named audits — the
    // single-query iteration path; the full run stays the gate
    val only  = args.drop(1).toSet
    val spark = GraftSession.getOrCreate()
    val qs    = SparkEntry.queries
    var failed = 0
    audits.filter(a => only.isEmpty || only(a.query)).foreach { a =>
      val df = qs(a.query)(spark, sfDir)
      df.collect() // finalize the adaptive plan before inspecting it
      val plan = df.queryExecution.executedPlan.toString
      val missing = a.mustContain.filterNot(plan.contains)
      val present = a.mustNotContain.filter(plan.contains)
      val thinWindows =
        if (a.minWindowPartCols > 0)
          windowPartCounts(plan).filter(_ < a.minWindowPartCols)
        else Nil
      if (missing.isEmpty && present.isEmpty && thinWindows.isEmpty)
        println(s"[plan-audit] PASS ${a.query}")
      else {
        failed += 1
        println(s"[plan-audit] FAIL ${a.query}: missing=${missing.mkString("; ")} " +
          s"unexpected=${present.mkString("; ")}" +
          (if (thinWindows.nonEmpty)
             s" window-partition-cols=${thinWindows.mkString(",")} < ${a.minWindowPartCols}"
           else ""))
        println(plan.linesIterator.take(40).mkString("\n"))
      }
    }
    if (only.isEmpty) {
      failed += auditProductDemand(spark)
      failed += auditBroadcastFallback(spark, sfDir)
      failed += auditIndexScans(spark, sfDir)
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
    // +1 = the productDemand broadcast-shape audit
    if (only.isEmpty)
      println(s"[plan-audit] all ${audits.size + 1 + fallbackAuditCount + indexScanAuditCount} plan assertions hold")
  }
}
