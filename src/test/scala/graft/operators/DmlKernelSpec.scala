package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DmlKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    ("k1", 1, "2025-01-01"), ("k2", 2, "2025-01-02"), ("k3", 3, "2025-01-03")
  ).toDF("key", "v", "ver")

  test("M1 insertOnly appends only new keys and is idempotent") {
    val source = Seq(("k2", 99, "2025-02-01"), ("k4", 4, "2025-02-01")).toDF("key", "v", "ver")
    val merged = MergeInto.insertOnly(target, source, Seq("key"))
    assert(merged.count() == 4)
    // existing key untouched
    assert(merged.where($"key" === "k2").select("v").as[Int].head() == 2)
    // idempotent: merging the same source again adds nothing
    assert(MergeInto.insertOnly(merged, source, Seq("key")).count() == 4)
  }

  test("M2 upsert: source wins only when strictly newer; ties keep target") {
    val source = Seq(
      ("k1", 100, "2025-06-01"), // newer -> replaces
      ("k2", 200, "2025-01-02"), // tie -> target kept
      ("k3", 300, "2024-01-01"), // older -> target kept
      ("k5", 500, "2025-06-01")  // new key -> inserted
    ).toDF("key", "v", "ver")
    val merged = MergeInto.upsert(target, source, Seq("key"), "ver")
    val byKey  = merged.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byKey == Map("k1" -> 100, "k2" -> 2, "k3" -> 3, "k5" -> 500))
  }

  test("M3 upsertColumns updates only the named columns") {
    val dim = Seq(("c1", "2025-01-01", "2025-01-05", 3L))
      .toDF("customer_id", "first_visit", "last_visit", "visits")
    val src = Seq(("c1", "2099-09-09", "2025-02-01", 5L), ("c2", "2025-02-02", "2025-02-02", 1L))
      .toDF("customer_id", "first_visit", "last_visit", "visits")
    val merged = MergeInto.upsertColumns(dim, src, Seq("customer_id"), Seq("last_visit", "visits"))
    val c1 = merged.where($"customer_id" === "c1").head()
    assert(c1.getString(1) == "2025-01-01") // first_visit preserved
    assert(c1.getString(2) == "2025-02-01") // last_visit updated
    assert(c1.getLong(3) == 5L)
    assert(merged.count() == 2)
  }

  test("Scd2.applyChanges keeps exactly one current row per changed key") {
    val dim = Seq(
      (1L, 10, "a", java.sql.Date.valueOf("2025-01-01"), null.asInstanceOf[java.sql.Date], true),
      (2L, 20, "b", java.sql.Date.valueOf("2025-01-01"), null.asInstanceOf[java.sql.Date], true)
    ).toDF("sk", "id", "attr", "start_date", "end_date", "is_current")
    val changes = Seq((10, "a2")).toDF("id", "attr")
    val asOf    = java.sql.Date.valueOf("2025-03-01")
    val out = Scd2.applyChanges(dim, changes, Seq("id"), "sk", "start_date", "end_date", "is_current", lit(asOf))
    val currents = out.where($"is_current" === true).groupBy($"id").count().as[(Int, Long)].collect().toMap
    assert(currents == Map(10 -> 1L, 20 -> 1L))
    // closed-out old version carries the end date
    val closed = out.where($"id" === 10 && !$"is_current").head()
    assert(closed.getAs[java.sql.Date]("end_date") == asOf)
    // new surrogate key is beyond the previous max
    val newRow = out.where($"id" === 10 && $"is_current").head()
    assert(newRow.getAs[Long]("sk") > 2L)
  }

  test("Scd2 tolerance detection handles zero and negative baselines") {
    // old = 0: ANY nonzero new value must register (the divided form
    // |new-old|/old yielded null here and froze the dim); old < 0: the
    // unsigned denominator must not flip the predicate.
    val dim = Seq((1, 0.0), (2, -10.0), (3, 100.0), (4, 100.0))
      .toDF("id", "price").withColumn("is_current", lit(true))
    val fresh = Seq(
      (1, 5.0),    // 0 -> 5: changed (old divided form missed it)
      (2, -10.2),  // |Δ|=0.2 <= 0.05*10: within tolerance
      (3, 104.0),  // 4% move: within 5% tolerance
      (4, 106.0)   // 6% move: changed
    ).toDF("id", "price")
    val changed = Scd2
      .detectChanges(fresh, dim, Seq("id"), Seq("price"),
        relativeTolerance = Map("price" -> 0.05))
      .select($"id").as[Int].collect().sorted
    assert(changed.toSeq == Seq(1, 4), s"got ${changed.toSeq}")
  }

  test("saltedJoin rejects join types that would duplicate unmatched build rows") {
    val big   = Seq((1, "x")).toDF("k", "a")
    val small = Seq((1, "y"), (2, "z")).toDF("k", "b")
    val ex = intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "right_outer"))
    assert(ex.getMessage.contains("multiplicity"))
    // supported types still work and preserve semantics
    val inner = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4)
    assert(inner.count() == 1)
  }

  test("quality score stays in [0,100] and equals 100 minus failed penalties") {
    val df = Seq((5, -1.0), (-5, 2.0), (1, 1.0)).toDF("qty", "price")
    val checks = Seq(
      QualityScore.Check("qty_pos", $"qty" > 0, 30),
      QualityScore.Check("price_pos", $"price" > 0, 40)
    )
    val out = QualityScore.withScore(df, checks).select("data_quality_score").as[Int].collect().sorted
    assert(out.toSeq == Seq(60, 70, 100)) // 100-40 (price), 100-30 (qty), all pass
  }
}
