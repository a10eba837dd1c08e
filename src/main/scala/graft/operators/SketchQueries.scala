package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Approximate-aggregate and skew-handling operators.
  *
  * The KMV (k-minimum-values) distinct-count sketch is chosen over HLL
  * here because its estimate is a pure function of md5 hashes — exactly
  * reproducible in the ANSI-SQL oracle, which a native HLL register
  * layout is not. A production deployment would use
  * `approx_count_distinct` (HLL++, mergeable, 1 pass); this query
  * documents the sketch mechanics and verifies them cross-engine.
  */
object SketchQueries extends QueryModule {

  import Tables._

  private val K = 64

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // KMV distinct-count sketch vs exact COUNT(DISTINCT): estimate =
    // (k-1) / u_k where u_k is the k-th smallest hash mapped to (0,1].
    // The bottom-k aggregator truncates map-side (buffer <= K rows per
    // group per task, dedup intrinsic), so the shuffle carries
    // O(K x groups) rows — not the full distinct hash set a
    // DISTINCT + row_number() window would sort.
    "q42_kmv_distinct" -> QueryDef(
      fn = (s, d) => {
        val li = lineitem(s, d)
        val kmv = org.apache.spark.sql.functions.udaf(
          KmvAggregator.bottomKDistinct(K),
          org.apache.spark.sql.Encoders.STRING)
        val stats = li
          .select(
            col("l_returnflag"),
            md5(col("l_orderkey").cast("string").cast("binary")).as("h")
          )
          .groupBy(col("l_returnflag"))
          .agg(kmv(col("h")).as("sk"))
          .select(
            col("l_returnflag"),
            col("sk.n_min").as("n_min"),
            col("sk.hk").as("hk")
          )
        val exact = li
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        stats
          .join(exact, "l_returnflag")
          .withColumn(
            "u",
            conv(substring(col("hk"), 1, 8), 16, 10).cast("long").cast("double") / 4294967296.0
          )
          .withColumn(
            "kmv_estimate",
            when(col("n_min") < K, col("n_min").cast("double"))
              .otherwise(lit((K - 1).toDouble) / col("u"))
          )
          .select(col("l_returnflag"), col("exact_distinct"), col("kmv_estimate"))
      },
      oracle = Some(s"""
        WITH hashed AS (
          SELECT DISTINCT l_returnflag, md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM hashed),
        stats AS (
          SELECT l_returnflag, COUNT(*) AS n_min,
                 MAX(CASE WHEN rn = $K THEN h END) AS hk
          FROM ranked WHERE rn <= $K GROUP BY 1),
        exact AS (
          SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_distinct
          FROM lineitem GROUP BY 1)
        SELECT s.l_returnflag, e.exact_distinct,
               CASE WHEN s.n_min < $K THEN CAST(s.n_min AS DOUBLE)
                    ELSE ${(K - 1).toDouble} /
                         (CAST(CAST(concat('0x', substr(s.hk, 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
               END AS kmv_estimate
        FROM stats s JOIN exact e USING (l_returnflag)""")
    ),

    // ----------------------------------------------------------------
    // Salted skew join ≡ plain join: the oracle is the UNSALTED join, so
    // the check proves salting preserves join semantics exactly.
    "q43_salted_join" -> QueryDef(
      fn = (s, d) =>
        SkewJoin
          .saltedJoin(
            large = orders(s, d),
            small = customer(s, d).withColumnRenamed("c_custkey", "o_custkey"),
            keys = Seq("o_custkey"),
            buckets = 8
          )
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("key_sum")
          ),
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")
    )
  )
}
