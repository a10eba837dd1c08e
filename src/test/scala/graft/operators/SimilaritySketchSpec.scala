package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Banded-LSH near-dup vs the exact O(n²) formulation, and the
  * map-side-truncating sketch aggregators vs sort-based references.
  */
class SimilaritySketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.01"

  test("q41 banded LSH near-dup pairs are a subset of exact pairs, with identical sims") {
    val banded = graft.functions.SimilarityQueries.queries("q41_cosine_neardup").fn(spark, d)

    graft.plans.VectorFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, d)
      .withColumn("nrm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
      .where(col("nrm") > 0)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"), col("nrm").as("nb"))
    val exact = a.crossJoin(b)
      .where(col("ida") < col("idb"))
      .withColumn("sim", call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
      .where(col("sim") >= 0.4)
      .select(col("ida"), col("idb"), col("sim"))

    val bRows = banded.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val eRows = exact.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(eRows.nonEmpty, "test corpus has no exact near-dup pairs — threshold too high")
    assert(bRows.nonEmpty, "banded LSH found no candidates at all")
    assert(bRows.keySet.subsetOf(eRows.keySet),
      s"banded produced pairs the exact formulation lacks: ${bRows.keySet.diff(eRows.keySet).take(5)}")
    bRows.foreach { case (k, sim) => assert(sim == eRows(k)) }
  }

  test("q32 banded Jaccard pairs are a subset of exact pairs (precision 1.0), recall high") {
    val banded = graft.functions.DedupQueries.queries("q32_dedup_ngram_jaccard").fn(spark, d)

    // exact formulation: full Jaccard over shingle-hash sets, all pairs
    graft.plans.VectorFunctions.register(spark)
    import graft.functions.TextFunctions._
    val sets = graft.Tables.documents(spark, d)
      .select(col("doc_id"), explode(shingles3(col("text"))).as("shingle"))
      .withColumn("h0",
        conv(substring(md5(col("shingle").cast("binary")), 1, 8), 16, 10).cast("long"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("h0")).as("hs"))
    val exact = sets.select(col("doc_id").as("ida"), col("hs").as("ha"))
      .crossJoin(sets.select(col("doc_id").as("idb"), col("hs").as("hb")))
      .where(col("ida") < col("idb"))
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("jac",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .where(col("jac") >= 0.12)
      .select(col("ida"), col("idb"), col("inter"), col("jac"))

    val bRows = banded.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val eRows = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(eRows.nonEmpty && bRows.nonEmpty)
    // precision 1.0: every banded pair is a true near-dup with the
    // exact intersection and Jaccard
    assert(bRows.keySet.subsetOf(eRows.keySet),
      s"banded produced pairs the exact formulation lacks: ${bRows.keySet.diff(eRows.keySet).take(5)}")
    bRows.foreach { case (k, v) => assert(v == eRows(k)) }
    // recall follows the 6x2 banding s-curve; the corpus's planted
    // near-dups are high-similarity, so recall stays high
    val recall = bRows.size.toDouble / eRows.size
    assert(recall >= 0.8, s"recall $recall (${bRows.size}/${eRows.size})")
  }

  test("q77 multi-probe top-3 dominates single-probe on the SAME codebook") {
    import org.apache.spark.sql.expressions.Window
    val multi = graft.functions.SimilarityQueries
      .queries("q77_ann_ivf_multiprobe").fn(spark, d)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }

    // single-probe baseline with the identical seeded codebook: index
    // on the nearest centroid, query only the home list
    graft.plans.VectorFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, d)
      .withColumn("nrm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
      .where(col("nrm") > 0)
    val c = e.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid").asc)
    val assigned = e.crossJoin(broadcast(c))
      .withColumn("csim",
        call_function("vec_dot", col("embedding"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("r", row_number().over(wA))
      .where(col("r") === 1)
      .select(col("cid"), col("vec_id"), col("embedding"), col("nrm"))
    val wR = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    val single = assigned
      .select(col("cid"), col("vec_id").as("qid"), col("embedding").as("ea"), col("nrm").as("na"))
      .join(assigned.select(col("cid"), col("vec_id").as("nid"),
        col("embedding").as("eb"), col("nrm").as("nb")), "cid")
      .where(col("qid") =!= col("nid"))
      .withColumn("sim",
        call_function("vec_dot", col("ea"), col("eb")) / (col("na") * col("nb")))
      .withColumn("rank", row_number().over(wR))
      .where(col("rank") <= 3)
      .select(col("qid"), col("nid"), col("rank"), col("sim"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }

    assert(multi.nonEmpty && single.nonEmpty)
    // probing 2 lists yields a candidate SUPERSET of the home list, so
    // every query's k-th best similarity can only improve — exactly
    single.foreach { case (q, sSims) =>
      val mSims = multi(q)
      assert(mSims.size >= sSims.size, s"query $q lost candidates")
      sSims.zip(mSims).foreach { case (s1, m) =>
        assert(m >= s1, s"query $q: multi-probe sim $m < single-probe $s1")
      }
    }
  }

  test("q41 plans without a CartesianProduct") {
    val banded = graft.functions.SimilarityQueries.queries("q41_cosine_neardup").fn(spark, d)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(25).mkString("\n"))
  }

  test("bottom-k distinct aggregator matches the sort-based reference") {
    import spark.implicits._
    val k = 4
    val kmv = udaf(KmvAggregator.bottomKDistinct(k), org.apache.spark.sql.Encoders.STRING)
    val rows = Seq(
      // group A: 6 distinct values, each duplicated
      ("A", "05"), ("A", "05"), ("A", "11"), ("A", "11"), ("A", "03"),
      ("A", "99"), ("A", "42"), ("A", "42"), ("A", "77"),
      // group B: 2 distinct values only
      ("B", "f0"), ("B", "0f"), ("B", "f0")
    )
    val got = rows.toDF("g", "h")
      .repartition(5) // force multiple partial buffers to exercise merge
      .groupBy("g").agg(kmv(col("h")).as("sk"))
      .select(col("g"), col("sk.n_min"), col("sk.hk"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), Option(r.getString(2))))).toMap
    // group A distinct sorted: 03,05,11,42,77,99 → bottom-4 kept, 4th = 42
    assert(got("A") == ((4L, Some("42"))))
    // group B has only 2 distinct values: exact count, no k-th hash
    assert(got("B") == ((2L, None)))
  }

  test("top-k aggregator keeps k best by (score desc, id asc)") {
    import spark.implicits._
    val tk = udaf(TopKAggregator.topK(2),
      org.apache.spark.sql.Encoders.product[TopKAggregator.Scored])
    val got = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.3)
    ).toDF("g", "id", "score")
      .repartition(3)
      .groupBy("g").agg(tk(col("id"), col("score")).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getDouble(1)))).toMap
    assert(got(1L) == Seq((11L, 0.9), (12L, 0.9)))
    assert(got(2L) == Seq((20L, 0.3)))
  }

  test("the size-gate's shuffle arm returns exactly the broadcast arm's answers (q77/q96)") {
    // the round-11 deterministic strategy pin: corpus-sized join sides
    // broadcast under the row gate and shuffle-hash above it. Forcing the
    // gate to 1 row on the small corpus exercises the 100x arm; the
    // answers must be bit-identical (strategy can never change values)
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    def run(q: String) = {
      val r = graft.SparkEntry.queries(q)(spark, d).collect().map(_.toSeq).toSet
      spark.catalog.clearCache()
      r
    }
    val qs = Seq("q77_ann_ivf_multiprobe", "q96_ann_lsh_multitable")
    val viaBroadcast = qs.map(q => q -> run(q)).toMap
    System.setProperty("graft.pin.broadcast.max.rows", "1")
    try qs.foreach(q => assert(run(q) === viaBroadcast(q), q))
    finally System.clearProperty("graft.pin.broadcast.max.rows")
  }
}
