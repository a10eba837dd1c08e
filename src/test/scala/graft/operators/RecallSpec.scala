package graft.operators

import graft.TestSpark
import graft.tools.Recall
import org.scalatest.funsuite.AnyFunSuite

/** Measured recall floors for the ANN family (BASELINE.md records the
  * same numbers): recall@3 against the exact q35 baseline on the
  * sf0.001 corpus. Every input is deterministic — the corpus, the
  * seeded/trained codebooks, the tie-breaks — so each floor either
  * always holds or always fails; the floors sit ~25% under the measured
  * values (q45 0.215, q77 0.303, bucketed family 0.021) to stay stable
  * across corpus regenerations, while still failing on a structural
  * regression (a broken candidate stage scores ~0).
  *
  * The dominance property (multi-probe >= single-probe) is asserted
  * exactly: probing a second inverted list can only add candidates.
  */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // corpus location is environment-coupled: overridable, and the suite
  // cancels (rather than fails) on machines without the fixture
  private val dir = sys.env.getOrElse(
    "SPARK_GRAFT_RECALL_DIR",
    sys.props.getOrElse("graft.recall.dir", "/root/testdata/sf0.001"))
  private def requireCorpus(): Unit =
    assume(new java.io.File(dir).isDirectory, s"recall corpus absent: $dir")

  private lazy val recalls: Map[String, Double] =
    Recall.annVariants.map { v =>
      val r = Recall.recallAt3(spark, dir, v)
      spark.catalog.clearCache()
      v -> r
    }.toMap

  test("multi-probe IVF recall dominates single-probe") {
    requireCorpus()
    assert(recalls("q77_ann_ivf_multiprobe") >= recalls("q45_ann_ivf"),
      s"multi-probe ${recalls("q77_ann_ivf_multiprobe")} < single-probe ${recalls("q45_ann_ivf")}")
  }

  test("IVF variants clear their measured floors") {
    requireCorpus()
    assert(recalls("q45_ann_ivf") >= 0.15, s"q45 recall ${recalls("q45_ann_ivf")}")
    assert(recalls("q77_ann_ivf_multiprobe") >= 0.22,
      s"q77 recall ${recalls("q77_ann_ivf_multiprobe")}")
  }

  test("PQ scoring over multi-probe candidates sits between its parents") {
    requireCorpus()
    // q82 inherits q77's candidate lists but ranks with lossy 8-byte ADC
    // codes: recall must beat PQ-over-LSH (candidates dominate) while
    // trailing exact-scored multi-probe (scoring loses some of it)
    assert(recalls("q82_ann_ivf_pq") >= recalls("q78_ann_pq"),
      s"q82 ${recalls("q82_ann_ivf_pq")} < q78 ${recalls("q78_ann_pq")}")
    assert(recalls("q82_ann_ivf_pq") >= 0.08, s"q82 recall ${recalls("q82_ann_ivf_pq")}")
  }

  test("n_probe sweep is monotone: 4 probed lists recall >= 2 >= 1") {
    requireCorpus()
    // probing more inverted lists only adds candidates, so recall can
    // only rise — the dominance property, asserted exactly
    assert(recalls("q95_ann_ivf_probe4") >= recalls("q77_ann_ivf_multiprobe"),
      s"probe4 ${recalls("q95_ann_ivf_probe4")} < probe2 ${recalls("q77_ann_ivf_multiprobe")}")
  }

  test("high-recall configs clear the production bar (round-4 directive)") {
    requireCorpus()
    // measured: q95 0.48-0.52, q96 0.70-0.71 across the two corpora;
    // floors sit under the measured band but q96's floor IS the 0.5
    // production bar the round-4 verdict set
    assert(recalls("q95_ann_ivf_probe4") >= 0.38,
      s"q95 recall ${recalls("q95_ann_ivf_probe4")}")
    assert(recalls("q96_ann_lsh_multitable") >= 0.5,
      s"q96 recall ${recalls("q96_ann_lsh_multitable")}")
  }

  test("PQ refine sits between raw PQ and exact-scored multi-probe (sandwich)") {
    requireCorpus()
    // dominance by construction, asserted exactly: any true neighbor in
    // q82's PQ top-3 is inside q323's top-R shortlist (R >= 16 > 3) and
    // the exact rerank cannot demote a true corpus top-3 below rank 3
    // within the shortlist, so q323 >= q82; q77 reranks ALL candidates
    // exactly while q323 only reranks the PQ top-R subset, so q77 >= q323
    assert(recalls("q323_ann_ivf_pq_refine") >= recalls("q82_ann_ivf_pq"),
      s"refine ${recalls("q323_ann_ivf_pq_refine")} < raw PQ ${recalls("q82_ann_ivf_pq")}")
    assert(recalls("q77_ann_ivf_multiprobe") >= recalls("q323_ann_ivf_pq_refine"),
      s"exact-scored ${recalls("q77_ann_ivf_multiprobe")} < refine ${recalls("q323_ann_ivf_pq_refine")}")
    assert(recalls("q323_ann_ivf_pq_refine") >= 0.19,
      s"q323 recall ${recalls("q323_ann_ivf_pq_refine")}") // measured 0.2507
  }

  test("auto-n_probe holds recall at the corpus size where the sizing constants change (sf0.1)") {
    // THE round-13 verdict gate: at n = 2000 auto-B reads B = 63 and the
    // scanned-fraction rule reads np = 8 (q77/q82/q323) / 16 (q95) —
    // constants the sf0.001 corpus never exercises. Under round 13's
    // fixed np the same corpus measured q77 0.199 / q95 0.292 / q82
    // 0.084 (BASELINE.md "Recall at sf0.1 under auto-sizing"); the
    // fraction rule reads 0.4372 / 0.6173 / 0.1042, with the refine
    // stage at 0.3258. Floors sit ~20% under measured — except q95's,
    // which IS the 0.5 production bar the round-4 verdict set (measured
    // 0.6173, and 0.7997 at the 20k ScaleTrend corpus: rule-held, not
    // corpus luck). q82 keeps its quantization-noise-bounded floor and
    // its role as the no-refine reference point.
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf01).isDirectory, s"recall corpus absent: $sf01")
    val at01 = Seq("q77_ann_ivf_multiprobe", "q95_ann_ivf_probe4",
      "q82_ann_ivf_pq", "q323_ann_ivf_pq_refine").map { v =>
      val r = Recall.recallAt3(spark, sf01, v)
      spark.catalog.clearCache()
      v -> r
    }.toMap
    assert(at01("q77_ann_ivf_multiprobe") >= 0.35,
      s"q77 sf0.1 recall ${at01("q77_ann_ivf_multiprobe")}")
    assert(at01("q95_ann_ivf_probe4") >= 0.5,
      s"q95 sf0.1 recall ${at01("q95_ann_ivf_probe4")} below the production bar")
    assert(at01("q82_ann_ivf_pq") >= 0.08,
      s"q82 sf0.1 recall ${at01("q82_ann_ivf_pq")}")
    assert(at01("q323_ann_ivf_pq_refine") >= 0.26,
      s"q323 sf0.1 recall ${at01("q323_ann_ivf_pq_refine")}")
    // the fraction rule's defining property, asserted on measured values:
    // recall at the LARGER corpus is NOT below the small-corpus floor
    // (fixed np measurably violated this: 0.34 -> 0.199)
    assert(at01("q77_ann_ivf_multiprobe") >= 0.22 &&
      at01("q95_ann_ivf_probe4") >= 0.38,
      "auto-n_probe failed to hold the sf0.001 floors at sf0.1")
  }

  test("filtered ANN clears its floor against the exact-same-label baseline") {
    requireCorpus()
    // measured 0.160 at sf0.001: single-probe assignment at fixed B=16
    // over a near-uniform corpus — the same regime as q45's 0.215
    // unfiltered (the label constraint shrinks buckets, so recall sits
    // just under single-probe IVF). Floor ~25% under measured; a broken
    // (cid, label) candidate stage scores ~0
    val r = Recall.filteredRecallAt3(spark, dir)
    spark.catalog.clearCache()
    assert(r >= 0.11, s"q163 filtered recall $r")
  }

  test("maintained posting-list index (q187) clears its floor at both scale factors") {
    // measured 0.623 at both corpora (documents/embeddings are the same
    // table at sf0.001 and sf0.01): n_probe = 4 retrieval against the
    // frozen 16-centroid codebook — the q95 recall knob applied to the
    // maintained index (round-10 verdict item; single-probe measured
    // 0.263, so the floor is now a QUALITY claim, not a staleness
    // guard). The recall/cost curve on this corpus: probe 1 → 0.26,
    // probe 4 → 0.62, at 1/16 vs 4/16 of the postings scanned. The
    // equality gate (AnnIndexAppendSpec) proves append ≡ recompute;
    // this floor catches index staleness or codebook drift that the
    // equality gate would faithfully reproduce on both sides.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      assume(new java.io.File(sf).isDirectory, s"recall corpus absent: $sf")
      val r = Recall.maintainedIndexRecallAt3(spark, sf)
      spark.catalog.clearCache()
      assert(r >= 0.5, s"q187 maintained-index recall $r at $sf")
    }
  }

  test("binary-quantized ANN (q215) clears its floor at both scale factors") {
    // measured 0.633 at both corpora — the full-vector 64-bit Hamming
    // shortlist beats the 8-bit sign-LSH bucket variants (q36/q74 at
    // ~0.5-0.7 with far more candidates) because every dimension's
    // sign contributes to the distance, not just the first 8
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      assume(new java.io.File(sf).isDirectory, s"recall corpus absent: $sf")
      val r = Recall.binaryRecallAt3(spark, sf)
      spark.catalog.clearCache()
      assert(r >= 0.55, s"q215 binary recall $r at $sf")
    }
  }

  test("sign-LSH-bucketed variants (q36/q74/q78) clear their floor") {
    requireCorpus()
    // 8 hyperplane bits over a near-uniform corpus leave ~n/256 candidates
    // per bucket, so absolute recall is low by construction — the floor
    // guards candidate generation, not ranking quality (ranking quality
    // is covered by the oracle hash match and the PQ reconstruction-MSE
    // numbers in BASELINE.md)
    Seq("q36_ann_sign_lsh", "q74_ann_int8", "q78_ann_pq").foreach { v =>
      assert(recalls(v) >= 0.015, s"$v recall ${recalls(v)}")
    }
  }
}
