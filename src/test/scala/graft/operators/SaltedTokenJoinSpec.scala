package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q299 salted token join on a deliberately Zipf-skewed vocabulary:
  * semantics (including the LEFT-join unmatched path the NB apply's
  * unseen-token constant rides) must be EXACTLY the plain join's, and
  * the head token's rows must actually spread across salt buckets —
  * the straggler flattening that justifies the kernel.
  */
class SaltedTokenJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf corpus: token t0 owns half the mass; t1..t49 share the rest;
    * tokens x1..x5 are OOV (absent from the model — left-join nulls).
    */
  private def zipfToks = {
    val tail = spark.range(2000L).select(
      (col("id") % 100L).as("doc_id"),
      concat(lit("t"), pmod(col("id"), lit(50))).as("token"),
      lit(1L).as("c"))
    val head = spark.range(2000L).select(
      (col("id") % 100L).as("doc_id"), lit("t0").as("token"), lit(1L).as("c"))
    val oov = spark.range(100L).select(
      (col("id") % 100L).as("doc_id"),
      concat(lit("x"), pmod(col("id"), lit(5))).as("token"),
      lit(1L).as("c"))
    tail.unionByName(head).unionByName(oov)
  }

  private def model = spark.range(50L).select(
    concat(lit("t"), col("id")).as("token"),
    ((col("id") % 7L).cast("double") - lit(3.0)).as("llr"))

  test("salted left join ≡ plain left join on a Zipf corpus (OOV nulls included)") {
    val plain = zipfToks.join(model, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("llr"), lit(0.5))).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewJoin
      .saltedJoin(zipfToks, model, Seq("token"), buckets = 8, joinType = "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("llr"), lit(0.5))).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (doc, (s, n)) =>
      assert(salted(doc)._2 === n, s"doc $doc row multiplicity drifted")
      assert(math.abs(salted(doc)._1 - s) < 1e-9, s"doc $doc score drifted")
    }
  }

  test("the head token's rows spread across salt buckets") {
    // project the salt the kernel assigns and count per (token, salt):
    // the head token must occupy >1 bucket (the whole point), and no
    // single bucket may hold more than ~half its mass at 8 buckets
    val salted = zipfToks.withColumn(
      "salt", pmod(hash(monotonically_increasing_id()), lit(8)))
    val headBuckets = salted.where(col("token") === "t0")
      .groupBy(col("salt")).agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(headBuckets.length > 1, "head token landed in a single salt bucket")
    assert(headBuckets.max < 2000L / 2,
      s"worst bucket still holds ${headBuckets.max} of 2000 head rows")
  }
}
