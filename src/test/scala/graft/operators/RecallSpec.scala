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
