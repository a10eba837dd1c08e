package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, over `documents`:
  * exact (hash-groupBy), n-gram Jaccard near-dup, MinHash+LSH banding,
  * SimHash. All hashing is md5-based so every stage is reproducible in
  * the DuckDB oracle; a production Spark deployment would swap md5 for
  * xxhash64 (same plan shape, ~4x cheaper hash) — the operators take the
  * hash as a column function so that is a one-line change.
  *
  * Scale design: no operator ever pairs documents all-vs-all, and no
  * stage ever shuffles the full (doc, shingle) relation: every
  * aggregation is keyed by doc_id, where all of a document's shingles
  * are already co-located in its input partition, so partial
  * aggregation collapses them to one row per document BEFORE the
  * shuffle. Exact dedup is a hash aggregation; Jaccard reranks
  * minhash-band candidates; MinHash/LSH and SimHash join on band
  * buckets. Each is one or two doc-grain shuffles — linear, not
  * quadratic.
  */
object DedupQueries extends QueryModule {

  import Tables._
  import TextFunctions._

  // shared knobs (mirrored into the generated oracle SQL)
  private val JaccardTau   = 0.12 // near-dup threshold
  private val K            = 12   // minhash permutations
  private val Bands        = 4    // LSH bands (rows per band = K/Bands)
  private val HammingMax   = 3    // simhash near-dup radius
  private val SimBits      = 60   // simhash signature width (60-bit: md5 prefix fits a signed 64-bit int)
  private val SimBands     = 4    // 4 bands x 15 bits: any <=3-bit corruption leaves >=1 clean band
  private val SubstrW      = 8    // q153 sliding-window width in tokens (Lee et al. use 50; 8 fits the ~60-token docs)

  /** Universal-hash permutation constants for minhash: h_i = (A_i*h0 + B_i) mod P.
    * h0 is a 32-bit md5 prefix and A_i < 2^30, so A_i*h0 + B_i < 2^63 — no
    * overflow on either engine (both Spark ANSI and DuckDB check bigint ops).
    */
  private val MhP = 4294967311L // smallest prime > 2^32
  private val MhA = (0 until K).map(i => (((i + 1) * 2654435761L + 1013904223L) % 1073741789L) | 1L)
  private val MhB = (0 until K).map(i => ((i + 1) * 3266489917L + 374761393L) % MhP)

  /** DuckDB fragments shared by the minhash-banded queries (q32, q33):
    * the K universal-hash mins over a `hashed(doc_id, h0)` relation, and
    * the banded key projection over the resulting `mh` relation.
    */
  private val mhMinsSql: String =
    (0 until K).map(i => s"MIN((${MhA(i)} * h0 + ${MhB(i)}) % $MhP) AS h$i").mkString(", ")
  private def bandSelectsSql(bands: Int): String = {
    val r = K / bands
    (0 until bands)
      .map { b =>
        val keyExpr = (0 until r).map(j => s"h${b * r + j}").mkString(", ")
        s"SELECT doc_id, $b AS band, concat_ws('|', $keyExpr) AS band_key FROM mh"
      }
      .mkString(" UNION ALL ")
  }
  private val mhBandSelectsSql: String = bandSelectsSql(Bands)

  private val normSql =
    "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents"

  /** DuckDB fragment: distinct (doc_id, shingle) word-3-grams. */
  private[functions] val shingleSql = s"""
    SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
         UNNEST(range(1, len(w) - 1)) AS u(i)
    WHERE len(w) >= 3"""

  /** Spark side: distinct (doc_id, shingle) pairs. */
  private[graft] def shingleDf(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorFunctions.register(s)
    shingleDfOf(documents(s, d))
  }

  /** Same shingle projection over an arbitrary (doc_id, text) relation —
    * the streaming index-maintenance cycle (q202) feeds it each
    * micro-batch's documents inside foreachBatch.
    */
  private[graft] def shingleDfOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))

  /** Spark side of q33's banded-minhash candidate generator: distinct-ish
    * (ida, idb) pairs (one row per shared band key, ida < idb). The q32
    * rerank consumes the same banding scheme (6x2 there, 4x3 here) to
    * source its exact-Jaccard candidates.
    */
  private[functions] def minhashCandidatePairs(s: SparkSession, d: String): DataFrame =
    minhashCandidatePairsOf(shingleDf(s, d))

  /** Same candidate generator over an arbitrary (doc_id, shingle)
    * relation — the corpus-build pipeline (q140) feeds it the shingles
    * of the quality-surviving subset only.
    */
  private[functions] def minhashCandidatePairsOf(sh: DataFrame): DataFrame = {
    val bands = mhBandsOf(sh)
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id")
      )
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
  }

  /** The q157 content-defined chunking kernel over (doc_id, text)
    * rows: (doc_id, chunk_id, h, n_tokens) where a boundary falls
    * after token i iff the rolling 3-gram ending at i hashes 0 mod 8.
    * Exposed for the CDC property test — prefix insertion must only
    * perturb chunks up to the first surviving boundary, which is the
    * whole point of content-defined over fixed-stride framing.
    */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(w)), i -> struct(
          |  i AS pos, element_at(w, i) AS word,
          |  CASE WHEN i >= 3 AND
          |    cast(conv(substr(md5(concat_ws(' ', slice(w, i - 2, 3))), 1, 2), 16, 10) as int) % 8 = 0
          |  THEN 1 ELSE 0 END AS flag))""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.word").as("word"), col("p.flag").as("flag"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    toks
      .withColumn("chunk_id", sum(col("flag")).over(w) - col("flag"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("word")))).as("pw"))
      .select(col("doc_id"), col("chunk_id"),
        md5(expr("concat_ws(' ', transform(pw, x -> x.word))")).as("h"),
        size(col("pw")).as("n_tokens"))
  }

  /** Row-wise banded-minhash keys — array<struct<band, band_key>>
    * computed entirely WITHIN one row, no aggregation: min over the
    * shingle array ≡ min over the exploded group, so the keys are
    * bit-equal to [[mhBandsOf]]'s (asserted in
    * IncrementalBandIndexSpec). This is what makes dedup-at-ingest
    * possible in a STREAMING append-mode plan (q192): banding without
    * a stateful aggregate. Docs with no shingles (<3 words) emit an
    * empty array, matching mhBandsOf's absent group.
    */
  private[graft] def mhBandsRowwise(text: Column): Column = {
    val sh = TextFunctions.shingles3(text)
    val h0s = transform(sh, s =>
      conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long"))
    val mins = (0 until K).map(i =>
      array_min(transform(h0s, h => (lit(MhA(i)) * h + lit(MhB(i))) % lit(MhP))))
    val r = K / Bands
    val bandsArr = array((0 until Bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("|", (0 until r).map(j => mins(b * r + j)): _*).as("band_key"))
    }: _*)
    when(size(sh) > 0, bandsArr)
      .otherwise(expr("CAST(array() AS array<struct<band:int,band_key:string>>)"))
  }

  /** The banded-minhash key projection itself — (doc_id, band,
    * band_key) — exposed so asymmetric consumers (q144's incremental
    * batch-vs-corpus dedup) can join band keys directly instead of
    * materializing the full pair graph.
    */
  private[graft] def mhBandsOf(sh: DataFrame): DataFrame = {
    val withH = sh.withColumn(
      "h0",
      conv(substring(md5(col("shingle").cast("binary")), 1, 8), 16, 10).cast("long")
    )
    val mhCols = (0 until K).map(i =>
      min((lit(MhA(i)) * col("h0") + lit(MhB(i))) % lit(MhP)).as(s"h$i")
    )
    val mh = withH
      .groupBy(col("doc_id"))
      .agg(mhCols.head, mhCols.tail: _*)
      .persist() // tiny (one row per doc); read by both join sides
      .leased
    val r = K / Bands
    // single explode pass over the cached signatures (not a per-band
    // union): same rows as the oracle's UNION ALL, one narrow stage
    mh
      .select(col("doc_id"), explode(array((0 until Bands).map { b =>
        struct(
          lit(b).as("band"),
          concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*).as("band_key")
        )
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
  }

  /** Connected components over an undirected edge list (`ida`, `idb`):
    * every node ends labeled with the minimum node id of its component.
    *
    * Algorithm: alternating large-star / small-star contraction (the
    * MapReduce connected-components construction from Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * literature). Each half-pass is one node-grain min-aggregation plus
    * one keyed join over the edge list — linear in edges with map-side
    * partial aggregation — and the pass count is LOGARITHMIC in the
    * largest component's diameter (vs. diameter-many passes for plain
    * min-label propagation), so a pathological 2^20-hop chain still
    * converges inside the default 20-pass cap. At the fixpoint the graph
    * is a forest of depth-1 stars centered at each component's minimum.
    *
    * Convergence is detected by an order-insensitive edge-set
    * fingerprint (count + xor of per-edge hashes — xor is safe because
    * the edge set is distinct) and, per the round-4 directive,
    * NON-convergence now throws instead of silently returning wrong
    * labels. Returns (id, label).
    */
  def connectedComponents(edges: DataFrame, maxPasses: Int = 20): DataFrame = {
    // all nodes (both endpoints) — needed at the end because star
    // centers carry no outgoing edge
    val nodes = edges.select(col("ida").as("id"))
      .unionByName(edges.select(col("idb").as("id")))
      .distinct()
    // canonical directed edge set: (u, v) with u > v, deduplicated.
    // localCheckpoint (eager), not persist: each pass's plan would
    // otherwise embed every previous pass's plan, and the analyzer
    // re-walks that growing tree on every action. Checkpointing
    // truncates the lineage to the materialized blocks, keeping
    // per-pass cost constant, and stays fully distributed.
    var e = edges
      .where(col("ida") =!= col("idb"))
      .select(greatest(col("ida"), col("idb")).as("u"), least(col("ida"), col("idb")).as("v"))
      .distinct()
      .localCheckpoint(true)
    // 1-row scalar convergence gate (the only driver-side action)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df
        .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    // large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u});
    // small-star: every neighbor v <= u (plus u itself) links to
    // m(u) = min of u's smaller neighbors. Composing the two halves
    // then re-canonicalizing is one pass.
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.unionByName(cur.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      sym
        .join(m, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(cur: DataFrame): DataFrame = {
      val m      = cur.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withM  = cur.join(m, "u")
      withM.select(col("v").as("u"), col("m").as("v"))
        .unionByName(withM.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    var prevFp    = fingerprint(e)
    var converged = false
    var pass      = 0
    while (!converged && pass < maxPasses) {
      val next  = smallStar(largeStar(e)).localCheckpoint(true)
      val newFp = fingerprint(next)
      e = next
      converged = newFp == prevFp
      prevFp = newFp
      pass += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxPasses star-contraction passes " +
        "— labels would be wrong; raise maxPasses")
    // fixpoint is a star forest: non-centers have exactly one edge to
    // their component min; centers label themselves
    val labels = nodes
      .join(e.select(col("u").as("id"), col("v").as("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
    nodes.unpersist()
    labels
  }

  /** DuckDB mirror of [[minhashCandidatePairs]]: the CTE chain ending in
    * `bands` (shingles → h0 → K minhash mins → band keys), for callers to
    * append their own band self-join.
    */
  private[graft] lazy val mhBandsCtesSql: String = mhBandsCtesSqlFrom(shingleSql)

  /** Parameterized variant: the same CTE chain seeded from an arbitrary
    * (doc_id, shingle) SQL source (q140 seeds it with the
    * quality-filtered shingle subset).
    */
  private[functions] def mhBandsCtesSqlFrom(shSrc: String): String =
    s"""sh AS ($shSrc),
        hashed AS (
          SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h0 FROM sh),
        mh AS (SELECT doc_id, $mhMinsSql FROM hashed GROUP BY doc_id),
        bands AS ($mhBandSelectsSql)"""

  /** Persisted intermediates route through the shared
    * [[graft.CacheLeases]] registry; every entry drains the previous
    * invocation's cached blocks.
    */
  private implicit class LeaseOps(private val df: DataFrame) {
    def leased: DataFrame = graft.CacheLeases.lease(df)
  }

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private def rawQueries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Exact dedup: self-union with shifted ids constructs guaranteed
    // duplicates; dedup keeps min doc_id per content fingerprint.
    "q31_dedup_exact" -> QueryDef(
      fn = (s, d) => {
        val docs   = documents(s, d)
        val copies = docs.withColumn("doc_id", col("doc_id") + 100000)
        docs
          .unionByName(copies)
          .groupBy(fingerprint(col("text")).as("fp"))
          .agg(
            min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies")
          )
      },
      oracle = Some(s"""
        SELECT md5(t) AS fp, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        FROM (
          SELECT doc_id, t FROM ($normSql)
          UNION ALL
          SELECT doc_id + 100000, t FROM ($normSql)
        ) GROUP BY 1""")
    ),

    // ----------------------------------------------------------------
    // EDIT-DISTANCE fuzzy dedup (the sixth dedup modality): near-dup
    // detection for SHORT strings — titles, headers, product names —
    // where shingle/minhash machinery is too coarse to separate one-
    // typo variants. Classic record-linkage shape: BLOCK on the
    // title's 8-char prefix (candidate generation is an equi-join,
    // never all-pairs; edits inside the first 8 characters are missed
    // — the standard blocking-recall trade, widened in production by
    // adding a suffix or sorted-neighborhood block), then VERIFY
    // candidates with the exact integer Levenshtein distance (Spark's
    // codegen'd levenshtein ≡ DuckDB's — both classic code-point edit
    // distance), keeping ordered pairs within the threshold. At 100 TB
    // the block key is the shuffle key and per-block fan-out is the
    // knob — same discipline as the LSH band joins.
    "q191_fuzzy_edit_dedup" -> QueryDef(
      fn = (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
          .withColumn("blk", substring(col("title"), 1, 8))
        t.as("a")
          .join(t.as("b"),
            col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            levenshtein(col("a.title"), col("b.title")).as("edit_dist"))
          .where(col("edit_dist") <= 4)
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, SUBSTR(text, 1, 24) AS title,
                 SUBSTR(text, 1, 8) AS blk
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.title, b.title) AS INTEGER) AS edit_dist
        FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.title, b.title) <= 4""")
    ),

    // ----------------------------------------------------------------
    // N-gram Jaccard near-dup: minhash-band candidate pairs, reranked
    // by EXACT Jaccard over the shingle-hash sets of just the candidate
    // documents. The former formulation (self-join on shared df-capped
    // shingles) had to shuffle the whole (doc, shingle) relation by
    // shingle — ~15 MB at sf0.1 and O(corpus) at 100 TB. Here every
    // aggregation is keyed by doc_id, which partial-aggregates to one
    // row per document map-side (a document's shingles all live in its
    // own input partition), and the rerank scan is pre-filtered to
    // candidate docs by a broadcast semi-join — so the only shuffled
    // bytes are doc-grain signatures and the candidates' shingle sets.
    //
    // Contract: tau is the PRECISION floor (every returned pair truly
    // has Jaccard >= tau); recall follows the banding s-curve
    // P(candidate) = 1 - (1 - j^r)^bands. q32 uses 6 bands x 2 rows
    // (curve midpoint ~= 0.41, vs ~0.63 for q33's 4x3), trading some
    // candidate fan-out for recall in the near-dup range. Exact recall
    // at an arbitrary tau is only possible by shuffling the full
    // shingle relation (any jac > 0 pair shares a shingle) — the
    // O(corpus) cost this query exists to avoid; tune K/bands toward
    // the target threshold instead.
    "q32_dedup_ngram_jaccard" -> QueryDef(
      fn = (s, d) => {
        val hashed = shingleDf(s, d)
          .withColumn(
            "h0",
            conv(substring(md5(col("shingle").cast("binary")), 1, 8), 16, 10).cast("long")
          )
          .select(col("doc_id"), col("h0"))
        val mhCols = (0 until K).map(i =>
          min((lit(MhA(i)) * col("h0") + lit(MhB(i))) % lit(MhP)).as(s"h$i")
        )
        val mh = hashed.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*).persist().leased
        val nBands = 6 // 2 rows per band — see the recall contract above
        val r = K / nBands
        // one explode pass instead of a 6-way union re-reading the cached
        // mh — same rows (the oracle's UNION ALL mirrors content, not
        // plan shape), one narrow stage instead of six
        val bands = mh
          .select(col("doc_id"), explode(array((0 until nBands).map { b =>
            struct(
              lit(b).as("band"),
              concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*).as("band_key")
            )
          }: _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
        val cand = bands
          .as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id")
          )
          .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
          .distinct()
          .persist() // feeds the candidate-id broadcast and the final join
          .leased
        val candIds = cand.select(col("ida").as("doc_id"))
          .unionByName(cand.select(col("idb").as("doc_id")))
          .distinct()
        // Rerank pass: re-derive shingle sets ONLY for candidate docs —
        // the broadcast semi-join prunes the corpus to a few hundred
        // rows before any shingling happens, so this pass costs one
        // column scan, not a second full shingle pipeline.
        val sets = documents(s, d)
          .join(broadcast(candIds), "doc_id")
          .select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))
          .withColumn(
            "h0",
            conv(substring(md5(col("shingle").cast("binary")), 1, 8), 16, 10).cast("long")
          )
          .groupBy(col("doc_id"))
          .agg(collect_set(col("h0")).as("hs"))
        cand
          .join(sets.select(col("doc_id").as("ida"), col("hs").as("ha")), "ida")
          .join(sets.select(col("doc_id").as("idb"), col("hs").as("hb")), "idb")
          .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
          .withColumn(
            "jac",
            col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter"))
          )
          .where(col("jac") >= JaccardTau)
          .select(col("ida"), col("idb"), col("inter"), col("jac"))
      },
      oracle = Some(s"""
        WITH sh AS ($shingleSql),
        hashed AS (
          SELECT DISTINCT doc_id, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h0
          FROM sh),
        mh AS (SELECT doc_id, $mhMinsSql FROM hashed GROUP BY doc_id),
        bands AS (${bandSelectsSql(6)}),
        cand AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM hashed GROUP BY doc_id),
        inter AS (
          SELECT c.ida, c.idb, COUNT(*) AS inter
          FROM cand c
          JOIN hashed x ON x.doc_id = c.ida
          JOIN hashed y ON y.doc_id = c.idb AND y.h0 = x.h0
          GROUP BY 1, 2)
        SELECT i.ida, i.idb, i.inter,
               CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jac
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.ida
        JOIN sizes sb ON sb.doc_id = i.idb
        WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= $JaccardTau""")
    ),

    // ----------------------------------------------------------------
    // Duplicate-CLUSTER resolution: the dedup family's pair queries
    // (q32/q33) emit edges; production dedup drops documents, which
    // needs transitive closure — every doc labeled with the min doc_id
    // of its connected component over the minhash-band candidate graph.
    // Implementation is alternating large-star / small-star contraction
    // (see [[connectedComponents]]): each half-pass is one keyed join +
    // one node-grain min-aggregation (linear in edges), pass count
    // LOGARITHMIC in component diameter, and non-convergence throws
    // rather than ever returning wrong labels.
    "q83_dup_clusters" -> QueryDef(
      fn = (s, d) =>
        connectedComponents(
          minhashCandidatePairs(s, d).select(col("ida"), col("idb")).distinct())
          .select(col("id").as("doc_id"), col("label").as("cluster_id")),
      // the oracle computes the same components via transitive closure —
      // fine at verify scale (the candidate graph is tiny), while the
      // Spark side stays linear per pass
      oracle = Some(s"""
        WITH RECURSIVE $mhBandsCtesSql,
        edges AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION ALL
          SELECT idb AS a, ida AS b FROM edges),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a""")
    ),

    // ----------------------------------------------------------------
    // Dedup KEEPER selection — the terminal dedup operator: within each
    // duplicate cluster (q83's components), keep the highest-quality
    // document (quality-score desc, doc_id asc tie-break) and report
    // the cluster's size. Joining the doc-grain quality pass against
    // the tiny cluster labeling and ranking inside a label-partitioned
    // window keeps every stage keyed and linear; the anti-join that
    // would then DROP the non-keepers from the corpus is exactly
    // [[graft.operators.MergeInto]]'s left_anti shape.
    "q87_dedup_keeper" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val clusters = connectedComponents(
          minhashCandidatePairs(s, d).select(col("ida"), col("idb")).distinct())
        val quality = documents(s, d)
          .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
        val byCluster = Window.partitionBy(col("label"))
        clusters
          .join(quality, col("id") === col("doc_id"))
          .withColumn("r",
            row_number().over(byCluster.orderBy(col("q").desc, col("doc_id").asc)))
          .withColumn("n", count(lit(1)).over(byCluster))
          .where(col("r") === 1)
          .select(
            col("label").as("cluster_id"),
            col("doc_id").as("keeper_id"),
            col("q").as("keeper_quality"),
            col("n").as("n_members"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $mhBandsCtesSql,
        edges AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION ALL
          SELECT idb AS a, ida AS b FROM edges),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        labels AS (
          SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
        qd AS (
          SELECT doc_id, CAST(${TextQueries.qualitySql} AS INTEGER) AS q
          FROM ($normSql)),
        j AS (
          SELECT l.label, d.doc_id, d.q
          FROM labels l JOIN qd d ON d.doc_id = l.id)
        SELECT label AS cluster_id, doc_id AS keeper_id,
               q AS keeper_quality, CAST(n AS BIGINT) AS n_members
        FROM (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY label ORDER BY q DESC, doc_id ASC) AS r,
                 COUNT(*) OVER (PARTITION BY label) AS n
          FROM j
        ) WHERE r = 1""")
    ),

    // ----------------------------------------------------------------
    // END-TO-END dedup: the full pipeline operator a training-data run
    // executes — cluster (q83), pick keepers (q87), then DROP the losers
    // and return the SURVIVING corpus. The drop is one left_anti join
    // against the loser set (MergeInto's shape): singleton docs never
    // appear in the candidate graph so they survive by construction,
    // and every stage stays keyed/broadcastable — at 100 TB the loser
    // set is a small fraction of the corpus and broadcasts.
    "q92_dedup_survivors" -> QueryDef(
      fn = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val clusters = connectedComponents(
          minhashCandidatePairs(s, d).select(col("ida"), col("idb")).distinct())
        val quality = documents(s, d)
          .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
        val losers = clusters
          .join(quality, col("id") === col("doc_id"))
          .withColumn("r",
            row_number().over(
              Window.partitionBy(col("label")).orderBy(col("q").desc, col("doc_id").asc)))
          .where(col("r") > 1)
          .select(col("doc_id"))
        documents(s, d)
          .join(losers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("source"), col("lang"))
      },
      oracle = Some(s"""
        WITH RECURSIVE $mhBandsCtesSql,
        edges AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id),
        und AS (
          SELECT ida AS a, idb AS b FROM edges
          UNION ALL
          SELECT idb AS a, ida AS b FROM edges),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        labels AS (
          SELECT a AS id, LEAST(a, MIN(b)) AS label FROM reach GROUP BY a),
        qd AS (
          SELECT doc_id, CAST(${TextQueries.qualitySql} AS INTEGER) AS q
          FROM ($normSql)),
        losers AS (
          SELECT doc_id FROM (
            SELECT d.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY l.label
                     ORDER BY d.q DESC, d.doc_id ASC) AS r
            FROM labels l JOIN qd d ON d.doc_id = l.id
          ) WHERE r > 1)
        SELECT doc_id, source, lang FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)""")
    ),

    // ----------------------------------------------------------------
    // SUB-DOCUMENT (chunk-grain) CROSS-CORPUS DEDUP — the C4-style
    // pass that drops repeated passages ACROSS documents while keeping
    // each passage's globally-first occurrence. Chunks here are
    // disjoint 3-token windows (a knob; production pipelines use
    // paragraph or line grain — this corpus has no sentence
    // punctuation, and 3-token chunks genuinely collide). Keep-first
    // is AGGREGATION-shaped, not a window: min(struct(doc_id, pos))
    // per chunk hash — map-side combining, shuffle O(distinct chunks),
    // no per-hash sort. Output is each doc's survival profile, the
    // doc-grain join of two reduced aggregates.
    "q124_chunk_dedup" -> QueryDef(
      fn = (s, d) => {
        val chunks = documents(s, d)
          .select(col("doc_id"),
            split(TextFunctions.normalizeText(col("text")), " ").as("w"))
          .where(size(col("w")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 2, 3), " +
              "i -> struct(i AS pos, concat_ws(' ', slice(w, i, 3)) AS chunk))")).as("c"))
          .select(col("doc_id"), col("c.pos").as("pos"), md5(col("c.chunk")).as("h"))
        val perDoc = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
        val kept = chunks
          .groupBy(col("h"))
          .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
          .groupBy(col("f.doc_id").as("doc_id"))
          .agg(count(lit(1)).as("n_kept"))
        perDoc
          .join(kept, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_chunks"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      },
      oracle = Some(s"""
        WITH d AS (
          SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)
          WHERE len(string_split(t, ' ')) >= 3),
        c AS (
          SELECT doc_id, i AS pos,
                 md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS h
          FROM d, UNNEST(range(1, len(w) - 1, 3)) AS u(i)),
        r AS (
          SELECT doc_id, h,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          FROM c),
        n AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY 1),
        k AS (SELECT doc_id, COUNT(*) AS n_kept FROM r WHERE rn = 1 GROUP BY 1)
        SELECT n.doc_id, n_chunks,
               COALESCE(n_kept, 0) AS n_kept,
               n_chunks - COALESCE(n_kept, 0) AS n_dropped
        FROM n LEFT JOIN k ON n.doc_id = k.doc_id""")
    ),

    // ----------------------------------------------------------------
    // FUZZY MATCH via symmetric-delete blocking (the SymSpell trick):
    // two strings within edit distance 1 (one substitution, insertion,
    // or deletion) must share a key in {self} ∪ {1-char deletions}, so
    // candidate generation is an EQUI-join on ~(len+1) keys per name —
    // never a cartesian levenshtein sweep. The exact levenshtein
    // filter then runs only on blocked candidates. "Dirty" names are
    // synthesized by deleting the (key mod len)-th character from every
    // 11th customer, so matches demonstrably fire (self + collisions).
    "q136_fuzzy_match" -> QueryDef(
      fn = (s, d) => {
        def withDelKeys(df: org.apache.spark.sql.DataFrame, nameCol: String) =
          df.select(df.columns.map(col) :+ explode(expr(
            s"array_union(array($nameCol), transform(sequence(1, length($nameCol)), " +
              s"i -> concat(substring($nameCol, 1, i - 1), " +
              s"substring($nameCol, i + 1, length($nameCol)))))")).as("k"): _*)
        val clean = Tables.customer(s, d)
          .select(col("c_custkey").as("clean_key"), col("c_name").as("nm"))
        val dirty = Tables.customer(s, d)
          .where(col("c_custkey") % 11 === 0)
          .select(
            col("c_custkey").as("dirty_key"),
            expr("concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)), " +
              "substring(c_name, cast(c_custkey % length(c_name) as int) + 2, length(c_name)))")
              .as("dnm"))
        withDelKeys(dirty, "dnm")
          .join(withDelKeys(clean, "nm"), Seq("k"))
          .select(col("dirty_key"), col("clean_key"), col("dnm"), col("nm"))
          .distinct()
          .where(levenshtein(col("dnm"), col("nm")) <= 1)
          .select(
            col("dirty_key"), col("clean_key"),
            levenshtein(col("dnm"), col("nm")).as("dist"))
      },
      oracle = Some("""
        WITH clean AS (SELECT c_custkey AS clean_key, c_name AS nm FROM customer),
        dirty AS (
          SELECT c_custkey AS dirty_key,
                 substr(c_name, 1, CAST(c_custkey % length(c_name) AS INTEGER)) ||
                 substr(c_name, CAST(c_custkey % length(c_name) AS INTEGER) + 2) AS dnm
          FROM customer WHERE c_custkey % 11 = 0),
        ck AS (
          SELECT clean_key, nm, u.k
          FROM clean, UNNEST(list_distinct(list_append(
            [substr(nm, 1, CAST(i AS INTEGER) - 1) || substr(nm, CAST(i AS INTEGER) + 1)
             FOR i IN range(1, length(nm) + 1)], nm))) AS u(k)),
        dk AS (
          SELECT dirty_key, dnm, u.k
          FROM dirty, UNNEST(list_distinct(list_append(
            [substr(dnm, 1, CAST(i AS INTEGER) - 1) || substr(dnm, CAST(i AS INTEGER) + 1)
             FOR i IN range(1, length(dnm) + 1)], dnm))) AS u(k)),
        cand AS (
          SELECT DISTINCT dirty_key, clean_key, dnm, nm
          FROM dk JOIN ck ON dk.k = ck.k)
        SELECT dirty_key, clean_key,
               CAST(levenshtein(dnm, nm) AS INTEGER) AS dist
        FROM cand WHERE levenshtein(dnm, nm) <= 1"""),
    ),

    // ----------------------------------------------------------------
    // MinHash + LSH: ONE md5 per shingle, K permutations derived
    // arithmetically (universal hashing h_i = (A_i*h0 + B_i) mod P) so
    // the per-shingle aggregation does K cheap bigint ops instead of K
    // independent md5s — the difference between 1 and K hash passes over
    // every shingle at 100 TB. Band keys group the K mins; candidate
    // pairs share >= 1 band key. Linear in corpus size.
    "q33_dedup_minhash_lsh" -> QueryDef(
      fn = (s, d) =>
        minhashCandidatePairs(s, d)
          .groupBy(col("ida"), col("idb"))
          .agg(count(lit(1)).as("n_shared_bands")),
      oracle = Some {
        s"""
        WITH $mhBandsCtesSql
        SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared_bands
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2"""
      }
    ),

    // ----------------------------------------------------------------
    // SimHash: 60-bit signature from per-token md5-prefix bits, banded
    // into 4 x 15-bit keys. 2^15 buckets per band keeps candidate
    // fan-out ~n²/32768 per band (vs n²/256 for a byte-banded 16-bit
    // signature), and with 4 bands any hamming <= 3 pair has >= 1 band
    // where all corrupted bits fall outside it — the recall guarantee a
    // 2-band scheme only gives for hamming <= 1.
    "q34_dedup_simhash" -> QueryDef(
      fn = (s, d) => {
        val toks = documents(s, d)
          .select(
            col("doc_id"),
            explode(array_distinct(split(normalizeText(col("text")), " "))).as("tok")
          )
          .withColumn(
            "h60",
            conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10).cast("long")
          )
        // Lane-packed bit tallies: 60 per-bit counters would need 60
        // aggregate buffers (the generated aggregate class dominated the
        // query's wall time via codegen/JIT compile). Instead pack 4
        // counters of 16 bits into each of 15 longs — safe while a doc
        // has < 2^16 distinct tokens — and recover bit j's majority vote
        // as ((word >> 16*lane) & 0xFFFF) * 2 > n_tokens (identical to
        // the +1/-1 sum being > 0; ties stay 0 in both forms).
        val Lanes = 4
        val wordCols = (0 until SimBits / Lanes).map { w =>
          sum(
            (0 until Lanes).map { l =>
              val j = w * Lanes + l
              shiftright(col("h60"), j).bitwiseAND(lit(1L)) * lit(1L << (16 * l))
            }.reduce(_ + _)
          ).as(s"w$w")
        }
        val sums = toks
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), wordCols: _*)
        val sig = sums.select(
          col("doc_id"),
          (0 until SimBits)
            .map { j =>
              val (w, l) = (j / Lanes, j % Lanes)
              when(
                shiftright(col(s"w$w"), 16 * l).bitwiseAND(lit(0xFFFFL)) * 2 >
                  col("n_toks"),
                lit(1L << j)
              ).otherwise(lit(0L))
            }
            .reduce(_ + _)
            .as("simhash")
        )
        val bandBits = SimBits / SimBands
        val mask     = (1L << bandBits) - 1
        val keyed = sig.persist().leased // tiny (one row per doc); feeds all bands
        val bands = (0 until SimBands)
          .map { b =>
            keyed.select(
              col("doc_id"),
              col("simhash"),
              lit(b).as("band"),
              shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("band_key")
            )
          }
          .reduce(_ unionByName _)
        bands
          .as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") &&
              col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id")
          )
          .select(
            col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
            col("a.simhash").as("sa"), col("b.simhash").as("sb")
          )
          .distinct()
          .withColumn("hamming", expr("bit_count(sa ^ sb)"))
          .where(col("hamming") <= HammingMax)
          .select(col("ida"), col("idb"), col("hamming"))
      },
      oracle = Some {
        val lanes = 4
        val sums = (0 until SimBits / lanes)
          .map { w =>
            val terms = (0 until lanes).map { l =>
              val j = w * lanes + l
              s"((h60 >> $j) & 1) * ${1L << (16 * l)}"
            }.mkString(" + ")
            s"CAST(SUM($terms) AS BIGINT) AS w$w"
          }
          .mkString(", ")
        val sig = (0 until SimBits)
          .map { j =>
            val (w, l) = (j / lanes, j % lanes)
            s"(CASE WHEN ((w$w >> ${16 * l}) & 65535) * 2 > n_toks THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
          }
          .mkString(" + ")
        val bandBits = SimBits / SimBands
        val mask     = (1L << bandBits) - 1
        val bandSelects = (0 until SimBands)
          .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * bandBits}) & $mask AS band_key FROM sig")
          .mkString(" UNION ALL ")
        s"""
        WITH toks AS (
          SELECT DISTINCT doc_id, md5(tok) AS h
          FROM (SELECT doc_id, UNNEST(string_split(t, ' ')) AS tok FROM ($normSql))),
        hashed AS (SELECT doc_id, CAST('0x' || substr(h, 1, 15) AS BIGINT) AS h60 FROM toks),
        sums AS (SELECT doc_id, COUNT(*) AS n_toks, $sums FROM hashed GROUP BY doc_id),
        sig AS (SELECT doc_id, $sig AS simhash FROM sums),
        bands AS ($bandSelects),
        cand AS (
          SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb, a.simhash AS sa, b.simhash AS sb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.doc_id < b.doc_id)
        SELECT ida, idb, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= $HammingMax"""
      }
    ),

    // ----------------------------------------------------------------
    // EXACT-SUBSTRING DUPLICATION SPANS — the sliding-window member of
    // the dedup family (the operator popularized by Lee et al.,
    // "Deduplicating Training Data Makes Language Models Better",
    // ACL'22, which uses a suffix array on one machine): every W=8-token
    // window of every document is hashed, and a window POSITION is
    // duplicated iff its content occurs at >=2 positions corpus-wide
    // (cross-doc or repeated within one doc — both are verbatim
    // repetition a pretraining loss over-weights). Output is the per-doc
    // exposure report a span-removal pass consumes: window count,
    // duplicated-position count, duplicated fraction.
    //
    // Spark shape (the distributed stand-in for the suffix array): one
    // explode to (doc, window-hash) — ~n_tokens rows per doc — then a
    // hash-grain count (map-side combined) to find repeated contents,
    // and a semi-join back to positions. Two keyed shuffles, linear in
    // corpus tokens; the 60-bit md5-prefix hash keeps the shuffle rows
    // narrow (the full window string never shuffles) and is mirrored
    // bit-for-bit in the oracle so the gate stays exact.
    "q153_exact_substring_spans" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val W = SubstrW
        val wins = documents(s, d)
          .select(col("doc_id"), split(normalizeText(col("text")), " ").as("w"))
          .where(size(col("w")) >= W)
          .select(
            col("doc_id"),
            explode(expr(
              s"""transform(sequence(1, size(w) - ${W - 1}),
                 |  i -> cast(conv(substr(md5(concat_ws(' ', slice(w, i, $W))), 1, 15), 16, 10) as bigint))"""
                .stripMargin)).as("h"))
          .persist() // read by the dup-content count and the position rescan
          .leased
        val dups = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .where(col("c") >= 2).select(col("h"))
        val nw = wins.groupBy(col("doc_id")).agg(count(lit(1)).as("nwin"))
        val nd = wins.join(dups, Seq("h"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("ndup"))
        documents(s, d)
          .select(col("doc_id"))
          .join(nw, Seq("doc_id"), "left")
          .join(nd, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("nwin"), lit(0L)).as("n_windows"),
            coalesce(col("ndup"), lit(0L)).as("n_dup"),
            when(coalesce(col("nwin"), lit(0L)) === 0, lit(0.0))
              .otherwise(coalesce(col("ndup"), lit(0L)).cast("double") / col("nwin"))
              .as("dup_frac"))
      },
      oracle = Some(s"""
        WITH wds AS (
          SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
        wins AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(array_to_string(w[i:i+${SubstrW - 1}], ' ')), 1, 15) AS BIGINT) AS h
          FROM wds, UNNEST(range(1, len(w) - ${SubstrW - 2})) AS u(i)
          WHERE len(w) >= $SubstrW),
        dups AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
        nw AS (SELECT doc_id, COUNT(*) AS nwin FROM wins GROUP BY doc_id),
        nd AS (
          SELECT doc_id, COUNT(*) AS ndup FROM wins
          WHERE h IN (SELECT h FROM dups) GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(nw.nwin, 0) AS BIGINT) AS n_windows,
               CAST(COALESCE(nd.ndup, 0) AS BIGINT) AS n_dup,
               CASE WHEN COALESCE(nw.nwin, 0) = 0 THEN 0.0
                    ELSE CAST(COALESCE(nd.ndup, 0) AS DOUBLE) / nw.nwin END AS dup_frac
        FROM documents d
        LEFT JOIN nw ON nw.doc_id = d.doc_id
        LEFT JOIN nd ON nd.doc_id = d.doc_id""")
    ),

    // ----------------------------------------------------------------
    // SOURCE OVERLAP MATRIX — the corpus-composition diagnostic run
    // before mixing sources: pairwise shingle-set Jaccard between
    // sources, answering "how much of source B is already in source A"
    // (a crawl snapshot vs. a curated set, two crawl generations, ...).
    // Doc-grain dedup (q31-q34) can't see this — two sources can share
    // most of their PHRASES with no two documents being near-dups.
    //
    // Shape: ONE corpus-sized shuffle. The raw (source, shingle) rows
    // aggregate straight to shingle grain with a map-side-combined
    // collect_set — the per-shingle source set is bounded by k
    // (k = #sources, a handful), so the aggregate is safe — and the
    // k(k-1)/2 source pairs per shingle are generated ARRAY-SIDE from
    // that sorted set, never by a self-join. (The first cut self-joined
    // the distinct'd relation on shingle: semantically identical, but
    // it shuffles the corpus-sized relation twice more, and the 1x/10x
    // measurement showed exactly that regime shift — x32 shuffle when
    // the sort-merge join stops broadcasting. The aggregate formulation
    // measured x9.7 at x10 data, at 5x less absolute shuffle.) Per-
    // source sizes fall out of the
    // same shingle-grain aggregate; |A∪B| is arithmetic on them.
    "q155_source_overlap" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val bySh = shingleDf(s, d)
          .join(documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("shingle"))
          .agg(sort_array(collect_set(col("source"))).as("srcs"))
          .persist() // read 2x: per-source sizes + the pair explode
          .leased
        val sizes = bySh
          .select(explode(col("srcs")).as("source"))
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = bySh
          .select(explode(expr(
            """flatten(transform(srcs, (a, i) ->
              |  transform(slice(srcs, i + 2, size(srcs)), b ->
              |    struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
          .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))), Seq("src_a"))
          .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))), Seq("src_b"))
          .select(
            col("src_a"), col("src_b"), col("n_inter"),
            (col("na") + col("nb") - col("n_inter")).as("n_union"),
            (col("n_inter").cast("double") /
              (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
      },
      oracle = Some(s"""
        WITH sh AS ($shingleSql),
        ss AS (
          SELECT DISTINCT d.source, s.shingle
          FROM sh s JOIN documents d ON d.doc_id = s.doc_id),
        sizes AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
          FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT src_a, src_b,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
               CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = src_a
        JOIN sizes sb ON sb.source = src_b""")
    ),

    // ----------------------------------------------------------------
    // CONTENT-DEFINED CHUNKING dedup — the Rabin-style chunker every
    // storage/backup dedup system uses (LBFS, Muthitacharoen et al.
    // SOSP'01), at token grain: a chunk boundary falls AFTER token i
    // whenever the rolling 3-gram ending at i hashes to 0 mod 8, so an
    // insertion early in a document only perturbs the chunks it
    // touches — fixed-stride chunking (q124) re-frames EVERYTHING
    // after the edit and misses every downstream duplicate. Output is
    // the per-doc chunk exposure: total chunks vs chunks whose content
    // recurs anywhere in the corpus.
    //
    // Shape: the boundary flags are computed array-side in one
    // projection (no self-join for the trailing 3-gram); chunk ids are
    // a per-doc cumulative sum (doc-grain window — parallel across
    // docs); chunk strings assemble via a sort_array(collect_list)
    // aggregate (the q111 ObjectHashAggregate shape, bounded by doc
    // length); duplicate detection is the q153 hash-grain count +
    // semi-join. Everything is keyed by doc or chunk-hash — linear.
    "q157_cdc_chunking" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        val chunks = cdcChunks(
          documents(s, d).select(col("doc_id"), col("text")))
          .persist() // read by the dup-content count and the per-doc rescan
          .leased
        val dups = chunks.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .where(col("c") >= 2).select(col("h"))
        val nd = chunks.join(dups, Seq("h"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("ndup"))
        chunks
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
          .join(nd, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("ndup"), lit(0L)).as("n_dup_chunks"))
      },
      oracle = Some(s"""
        WITH wds AS (
          SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
        toks AS (
          SELECT doc_id, i AS pos, w[i] AS word,
                 CASE WHEN i >= 3 AND
                   CAST('0x' || substr(md5(array_to_string(w[i-2:i], ' ')), 1, 2) AS INTEGER) % 8 = 0
                 THEN 1 ELSE 0 END AS flag
          FROM wds, UNNEST(range(1, len(w) + 1)) AS u(i)),
        cid AS (
          SELECT doc_id, pos, word,
                 SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - flag AS chunk_id
          FROM toks),
        chunks AS (
          SELECT doc_id, chunk_id,
                 md5(string_agg(word, ' ' ORDER BY pos)) AS h
          FROM cid GROUP BY doc_id, chunk_id),
        dups AS (SELECT h FROM chunks GROUP BY h HAVING COUNT(*) >= 2),
        nd AS (
          SELECT doc_id, COUNT(*) AS ndup FROM chunks
          WHERE h IN (SELECT h FROM dups) GROUP BY doc_id)
        SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COALESCE(MAX(nd.ndup), 0) AS BIGINT) AS n_dup_chunks
        FROM chunks c
        LEFT JOIN nd ON nd.doc_id = c.doc_id
        GROUP BY c.doc_id""")
    ),

    // ----------------------------------------------------------------
    // EXACT SIMILARITY JOIN via PREFIX FILTERING (PPJoin family,
    // Xiao et al., WWW'08) — the COMPLETE counterpart to the MinHash
    // band join (q32/q33): LSH banding is probabilistic and can miss a
    // qualifying pair; the prefix filter cannot. For token SETS under
    // a global total order, two sets with Jaccard >= t MUST share at
    // least one element within each other's first |S|-ceil(t·|S|)+1
    // elements — so candidates come from an EQUI-join on exploded
    // prefix tokens, and the verify step computes Jaccard exactly as
    // an integer ratio (5·|∩| >= 4·|∪| ⇔ J >= 0.8 — no doubles).
    //
    // Scale shape: prefix length is ~(1-t)·|S|+1 (a fifth of each set
    // at t=0.8), and ordering the global vocabulary rarest-first keeps
    // every prefix-token posting list short — the candidate volume is
    // Σ_tok postings(tok)², bounded by the rare end of the vocabulary,
    // never n². Verification joins the candidate PAIRS back to the
    // doc-grain set table twice — doc-keyed equi-joins all the way.
    "q169_jaccard_prefix_join" -> QueryDef(
      fn = (s, d) => {
        // shingle sets (the dedup family's word-3-grams — sharp enough
        // that only true near-dups qualify), ordered rarest-first by
        // (global posting count, shingle). The exploded (doc, shingle)
        // stream is pinned: both the frequency rollup and the set
        // assembly read it, and without the pin the text normalize +
        // shingle explode would scan the corpus twice.
        val toks = graft.CacheLeases.lease(
          shingleDf(s, d)
            .select(col("doc_id"), col("shingle").as("tok"))
            .persist())
        val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        val sets = graft.CacheLeases.lease(
          toks
            .join(freq, Seq("tok"))
            .groupBy(col("doc_id"))
            .agg(expr("transform(sort_array(collect_list(struct(tf, tok))), x -> x.tok)").as("w"))
            .withColumn("sz", size(col("w")))
            .persist())
        // prefix length |S| - ceil(0.8·|S|) + 1, in integer arithmetic:
        // ceil(4k/5) = (4k+4) div 5
        val prefix = sets
          .select(col("doc_id"), col("sz"),
            explode(slice(col("w"), lit(1),
              expr("CAST(sz - (sz * 4 + 4) DIV 5 + 1 AS INT)"))).as("tok"))
        val cand = prefix.as("a")
          .join(prefix.as("b"),
            col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id")
              // length filter: J >= t forces t·|A| <= |B| <= |A|/t
              && col("b.sz") * 5 >= col("a.sz") * 4 && col("a.sz") * 5 >= col("b.sz") * 4)
          .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
          .distinct()
        cand
          .join(sets.select(col("doc_id").as("ida"), col("w").as("wa")), Seq("ida"))
          .join(sets.select(col("doc_id").as("idb"), col("w").as("wb")), Seq("idb"))
          .withColumn("inter", size(array_intersect(col("wa"), col("wb"))))
          .withColumn("uni", size(col("wa")) + size(col("wb")) - col("inter"))
          .where(col("inter") * 5 >= col("uni") * 4)
          .select(col("ida"), col("idb"),
            col("inter").cast("long").as("n_inter"),
            col("uni").cast("long").as("n_union"))
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, shingle AS tok FROM ($shingleSql)),
        sets AS (
          SELECT doc_id, list(tok) AS w, COUNT(*) AS sz
          FROM toks GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 len(list_intersect(a.w, b.w)) AS n_inter,
                 a.sz AS sa, b.sz AS sb
          FROM sets a JOIN sets b
            ON a.doc_id < b.doc_id
           AND b.sz * 5 >= a.sz * 4 AND a.sz * 5 >= b.sz * 4),
        pairs AS (
          SELECT ida, idb, n_inter, sa + sb - n_inter AS n_union FROM inter)
        SELECT ida, idb,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(n_union AS BIGINT) AS n_union
        FROM pairs WHERE n_inter * 5 >= n_union * 4""")
    )
  )
}
