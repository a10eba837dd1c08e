package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AS-OF join semantics on a hand-built timeline: <=-visibility at exact
  * timestamp ties, carry-forward across gaps, null before the first
  * observation, key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")

  test("asOf picks the latest right row at or before each left row") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts(0), "t-before-any"),
      (1L, ts(10), "t-at-tick"),   // exactly at a quote: quote visible
      (1L, ts(25), "t-carried"),   // between quotes: carry 10:10 forward
      (1L, ts(40), "t-latest"),
      (2L, ts(40), "t-other-key")  // key 2 must not see key 1's quotes
    ).toDF("k", "t", "label")
    val quotes = Seq(
      (1L, ts(10), 100.0),
      (1L, ts(30), 130.0),
      (2L, ts(5), 50.0)
    ).toDF("k", "t", "px")

    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "t", "t", Seq("px"))
      .select(col("label"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(out("t-before-any").isEmpty)          // no quote yet -> null
    assert(out("t-at-tick").contains(100.0))     // <= includes equal ts
    assert(out("t-carried").contains(100.0))     // not yet 10:30
    assert(out("t-latest").contains(130.0))
    assert(out("t-other-key").contains(50.0))    // key isolation
  }

  test("left row count is preserved exactly (no amplification)") {
    import spark.implicits._
    val left  = (0 until 100).map(i => (i % 3L, ts(i % 60), i)).toDF("k", "t", "id")
    val right = (0 until 50).map(i => (i % 3L, ts(i % 55), i * 1.0))
      .toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v"))
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("k", "t", "id", "v"))
  }
}
