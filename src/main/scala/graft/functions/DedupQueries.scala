package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, over `documents`:
  * exact (hash-groupBy), n-gram Jaccard near-dup, MinHash+LSH banding,
  * SimHash. All hashing is md5-based so every stage is reproducible in
  * the DuckDB oracle; a production Spark deployment would swap md5 for
  * xxhash64 (same plan shape, ~4x cheaper hash) — the operators take the
  * hash as a column function so that is a one-line change.
  *
  * Scale design: no operator ever pairs documents all-vs-all. Exact dedup
  * is a hash aggregation; Jaccard joins only on shared *rare* shingles
  * (document-frequency cap drops uninformative shingles, bounding the
  * per-shingle fan-out); MinHash/LSH and SimHash join on band buckets.
  * Each is one or two key-hash shuffles — linear, not quadratic.
  */
object DedupQueries extends QueryModule {

  import Tables._
  import TextFunctions._

  // shared knobs (mirrored into the generated oracle SQL)
  private val DfCap        = 20   // max document-frequency for a shingle to count
  private val JaccardTau   = 0.12 // near-dup threshold
  private val K            = 12   // minhash permutations
  private val Bands        = 4    // LSH bands (rows per band = K/Bands)
  private val HammingMax   = 3    // simhash near-dup radius

  private val normSql =
    "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents"

  /** DuckDB fragment: distinct (doc_id, shingle) word-3-grams. */
  private val shingleSql = s"""
    SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(t, ' ') AS w FROM ($normSql)),
         UNNEST(range(1, len(w) - 1)) AS u(i)
    WHERE len(w) >= 3"""

  /** Spark side: distinct (doc_id, shingle) pairs. */
  private def shingleDf(s: SparkSession, d: String): DataFrame = {
    graft.plans.VectorFunctions.register(s)
    documents(s, d)
      .select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))
  }

  override def queries: Map[String, QueryDef] = Map(
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
    // N-gram Jaccard near-dup: join docs on shared rare shingles
    // (df <= DfCap), Jaccard over rare-shingle sets, threshold tau.
    "q32_dedup_ngram_jaccard" -> QueryDef(
      fn = (s, d) => {
        val sh = shingleDf(s, d)
        val rare = sh
          .groupBy(col("shingle"))
          .agg(count(lit(1)).as("dfreq"))
          .where(col("dfreq") <= DfCap)
          .select(col("shingle"))
        // rareSh feeds three consumers (sizes + both join sides) —
        // persist so the explode/normalize pipeline runs once
        val rareSh = sh.join(rare, "shingle").persist()
        val sizes  = rareSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = rareSh
          .as("a")
          .join(
            rareSh.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id")
          )
          .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "ida").withColumnRenamed("n", "na"), "ida")
          .join(sizes.withColumnRenamed("doc_id", "idb").withColumnRenamed("n", "nb"), "idb")
          .withColumn(
            "jac",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
          )
          .where(col("jac") >= JaccardTau)
          .select(col("ida"), col("idb"), col("inter"), col("jac"))
      },
      oracle = Some(s"""
        WITH sh AS ($shingleSql),
        rare AS (
          SELECT s.doc_id, s.shingle FROM sh s
          JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $DfCap) r
          USING (shingle)),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS inter
          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT ida, idb, inter,
               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
        FROM pairs
        JOIN sizes sa ON sa.doc_id = ida
        JOIN sizes sb ON sb.doc_id = idb
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= $JaccardTau""")
    ),

    // ----------------------------------------------------------------
    // MinHash + LSH: K md5-minhashes per doc, grouped into Bands band
    // keys; candidate pairs share >= 1 band key. Linear in corpus size.
    "q33_dedup_minhash_lsh" -> QueryDef(
      fn = (s, d) => {
        val sh = shingleDf(s, d)
        val mhCols = (0 until K).map(i =>
          min(md5(concat(lit(s"$i:"), col("shingle")).cast("binary"))).as(s"h$i")
        )
        val mh = sh
          .groupBy(col("doc_id"))
          .agg(mhCols.head, mhCols.tail: _*)
          .persist() // read once per band instead of re-hashing 4x
        val r = K / Bands
        val bands = (0 until Bands)
          .map { b =>
            mh.select(
              col("doc_id"),
              lit(b).as("band"),
              md5(concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*).cast("binary"))
                .as("band_key")
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
          .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
          .agg(count(lit(1)).as("n_shared_bands"))
      },
      oracle = Some {
        val r = K / Bands
        val mins = (0 until K)
          .map(i => s"MIN(md5('$i:' || shingle)) AS h$i")
          .mkString(", ")
        val bandSelects = (0 until Bands)
          .map { b =>
            val keyExpr = (0 until r).map(j => s"h${b * r + j}").mkString(" || '|' || ")
            s"SELECT doc_id, $b AS band, md5($keyExpr) AS band_key FROM mh"
          }
          .mkString(" UNION ALL ")
        s"""
        WITH sh AS ($shingleSql),
        mh AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
        bands AS ($bandSelects)
        SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared_bands
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2"""
      }
    ),

    // ----------------------------------------------------------------
    // SimHash: 16-bit signature from per-token md5 parity bits; near-dup
    // pairs found via byte-banding (share hi or lo byte), hamming <= 3.
    "q34_dedup_simhash" -> QueryDef(
      fn = (s, d) => {
        val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
        val toks = documents(s, d)
          .select(
            col("doc_id"),
            explode(array_distinct(split(normalizeText(col("text")), " "))).as("tok")
          )
          .withColumn("h", md5(col("tok").cast("binary")))
        val bitCols = (0 until 16).map(j =>
          sum(
            when(substring(col("h"), j + 1, 1).isin(oddHex: _*), 1).otherwise(-1)
          ).as(s"s$j")
        )
        val sums = toks
          .groupBy(col("doc_id"))
          .agg(bitCols.head, bitCols.tail: _*)
        val sig = sums.select(
          col("doc_id"),
          (0 until 16)
            .map(j => when(col(s"s$j") > 0, 1 << (15 - j)).otherwise(0))
            .reduce(_ + _)
            .as("simhash")
        )
        val keyed = sig
          .withColumn("hi", shiftright(col("simhash"), 8))
          .withColumn("lo", col("simhash").bitwiseAND(lit(255)))
          .persist() // tiny (one row per doc); joined four ways below
        val byHi = keyed.as("a")
          .join(keyed.as("b"), col("a.hi") === col("b.hi") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
            col("a.simhash").as("sa"), col("b.simhash").as("sb")
          )
        val byLo = keyed.as("a")
          .join(keyed.as("b"), col("a.lo") === col("b.lo") && col("a.doc_id") < col("b.doc_id"))
          .select(
            col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
            col("a.simhash").as("sa"), col("b.simhash").as("sb")
          )
        byHi
          .unionByName(byLo)
          .distinct()
          .withColumn("hamming", expr("bit_count(sa ^ sb)"))
          .where(col("hamming") <= HammingMax)
          .select(col("ida"), col("idb"), col("hamming"))
      },
      oracle = Some {
        val oddHex = "('1','3','5','7','9','b','d','f')"
        val sums = (0 until 16)
          .map(j => s"SUM(CASE WHEN substring(h, ${j + 1}, 1) IN $oddHex THEN 1 ELSE -1 END) AS s$j")
          .mkString(", ")
        val sig = (0 until 16)
          .map(j => s"(CASE WHEN s$j > 0 THEN ${1 << (15 - j)} ELSE 0 END)")
          .mkString(" + ")
        s"""
        WITH toks AS (
          SELECT DISTINCT doc_id, md5(tok) AS h
          FROM (SELECT doc_id, UNNEST(string_split(t, ' ')) AS tok FROM ($normSql))),
        sums AS (SELECT doc_id, $sums FROM toks GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST($sig AS INTEGER) AS simhash FROM sums),
        keyed AS (SELECT doc_id, simhash, simhash // 256 AS hi, simhash % 256 AS lo FROM sig),
        cand AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb, a.simhash AS sa, b.simhash AS sb
          FROM keyed a JOIN keyed b ON a.hi = b.hi AND a.doc_id < b.doc_id
          UNION
          SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
          FROM keyed a JOIN keyed b ON a.lo = b.lo AND a.doc_id < b.doc_id)
        SELECT ida, idb, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= $HammingMax"""
      }
    )
  )
}
