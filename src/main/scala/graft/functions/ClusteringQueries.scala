package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DISTRIBUTED K-MEANS (Lloyd 1982, fixed-K BSP iterations) over the
  * embedding corpus — the clustering step SemDeDup-style semantic
  * curation, IVF codebook training (q45's codebook is exactly a
  * k-means fit), and cluster-balanced sampling all build on. The
  * reference has no clustering surface; its pipelines stop at joins
  * (`update_ml_features.py`), leaving model fitting to absent
  * downstream systems.
  *
  * Scale contract (the q167 BSP discipline): per iteration the K×d
  * centroid table BROADCASTS (KB-scale), the assignment is one
  * map-side pass with an aggregation-shaped argmin — min(struct(d²,
  * cid)), never a window over the corpus — and the centroid update is
  * a (cid, dim)-grain decimal mean whose partial aggregation bounds
  * the shuffle at O(parts × K × d). Centroid state localCheckpoints
  * per step so plan depth stays constant in the iteration count.
  *
  * Determinism contract: distances fold in array order over IEEE
  * doubles widened from floats (exact, both engines); centroid means
  * accumulate in DECIMAL(28,12) and narrow through FLOAT before
  * re-entering double arithmetic (the q45/q86 rule — decimal→double
  * itself is 1-ulp engine-dependent, float absorbs it); argmin ties
  * break on cid via the struct ordering.
  */
object ClusteringQueries extends QueryModule {

  import Tables._

  override def queries: Map[String, QueryDef] =
    graft.CacheLeases.draining(rawQueries)

  private val K     = 8
  private val Iters = 3
  private val dt    = DecimalType(28, 12)

  /** Squared euclidean distance between the row's `embedding` and the
    * joined centroid's `cvec`, folded in array order — the same
    * zip_with/aggregate shape as q86's centering norm.
    */
  private val dist2: Column = expr(
    "aggregate(zip_with(embedding, cvec, " +
      "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Deterministic seeding: the K lowest-vec_id embeddings, cid =
    * 0-based rank. The 8-row window is init-only state, not a corpus
    * operator.
    */
  private def seedCentroids(e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    e.orderBy(col("vec_id")).limit(K)
      .select((row_number().over(w) - 1).as("cid"), col("embedding").as("cvec"))
  }

  /** One assignment pass: broadcast the K×d centroids, compute K
    * distances per row in place, and reduce to the per-vector argmin
    * with an aggregation (map-side combinable; carries the embedding
    * through `first` so the update needs no join back).
    */
  private def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", dist2)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"),
        col("embedding"))

  /** One update pass: (cid, dim)-grain decimal mean, narrowed to
    * FLOAT, re-assembled into position-ordered arrays; K×d output is
    * localCheckpoint'ed so the lineage never grows with iterations.
    */
  private def update(a: DataFrame): DataFrame =
    a.select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("v").cast("double").cast(dt)).cast("double") /
        count(lit(1))).cast("float").as("m"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), expr("transform(pm, x -> x.m)").as("cvec"))
      .localCheckpoint(true)

  private lazy val rawQueries: Map[String, QueryDef] = Map(

    // ----------------------------------------------------------------
    // K-MEANS LLOYD, K=8, 3 BSP iterations from lowest-vec_id seeds:
    // assignment is broadcast + aggregation-argmin, update is a
    // (cid, dim)-grain decimal mean — per iteration ONE keyed shuffle
    // of O(n) argmin rows and one of O(parts × K × d) partial means.
    // Output is the final per-vector assignment with its distance —
    // the row-grain gate proves every iteration's centroids matched.
    "q226_kmeans_lloyd" -> QueryDef(
      fn = (s, d) => {
        val e = graft.CacheLeases.lease(embeddings(s, d).persist())
        val c0 = seedCentroids(e)
        val cT = (1 to Iters).foldLeft(c0)((c, _) => update(assign(e, c)))
        assign(e, cT)
          .select(col("vec_id"), col("cid"), round(col("d2"), 6).as("dist2"))
      },
      oracle = Some {
        val d2Sql =
          "list_sum(list_transform(list_zip(e.embedding, c.cvec), " +
            "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
            "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
        def iterSql(i: Int, prev: String): String = s"""
        p$i AS MATERIALIZED (
          SELECT e.vec_id, c.cid, e.embedding, $d2Sql AS d2
          FROM e CROSS JOIN $prev c),
        a$i AS MATERIALIZED (
          SELECT vec_id, cid, d2, embedding FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, cid ASC) AS rn FROM p$i) WHERE rn = 1),
        m$i AS MATERIALIZED (
          SELECT cid, CAST(u.i AS INT) AS i,
                 CAST(CAST(SUM(CAST(CAST(embedding[CAST(u.i AS INT)] AS DOUBLE)
                   AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS REAL) AS m
          FROM a$i, UNNEST(range(1, len(embedding) + 1)) AS u(i)
          GROUP BY cid, CAST(u.i AS INT)),
        c$i AS MATERIALIZED (
          SELECT cid, list(m ORDER BY i) AS cvec FROM m$i GROUP BY cid)"""
        val iters = (1 to Iters)
          .map(i => iterSql(i, if (i == 1) "c0" else s"c${i - 1}"))
          .mkString(",")
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
                 embedding AS cvec
          FROM (SELECT * FROM e ORDER BY vec_id LIMIT $K)),
        $iters,
        pf AS MATERIALIZED (
          SELECT e.vec_id, c.cid, $d2Sql AS d2
          FROM e CROSS JOIN c$Iters c)
        SELECT vec_id, cid, ROUND(d2, 6) AS dist2 FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2 ASC, cid ASC) AS rn FROM pf) WHERE rn = 1"""
      }
    )
  )
}
