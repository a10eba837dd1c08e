package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the grouped-statistics / behavioral operators,
  * checked against independent brute-force computations on the real
  * corpus. The DuckDB oracle gates value equality; these specs pin the
  * properties a refactor could silently break while still matching a
  * refactored oracle (both sides of an oracle pair move together when
  * the same person edits them).
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q97 corr is in [-1,1], slope consistent, n_obs covers the table") {
    val rows = q("q97_grouped_corr").collect()
    assert(rows.nonEmpty)
    val total = Tables.lineitem(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
    }
  }

  test("q98 argmax matches independent max/min per brand with name tiebreak") {
    val got = q("q98_argmax_struct").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2), r.getDouble(3), r.getString(4))))
      .toMap
    val parts = Tables.part(spark, dir)
      .select(col("p_brand"), col("p_retailprice"), col("p_name"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    parts.groupBy(_._1).foreach { case (brand, ps) =>
      val hi = ps.map(p => (p._2, p._3)).max // lexicographic (price, name)
      val lo = ps.map(p => (p._2, p._3)).min
      val (tp, tn, lp, ln) = got(brand)
      assert((tp, tn) === hi, s"brand=$brand top mismatch")
      assert((lp, ln) === lo, s"brand=$brand low mismatch")
    }
  }

  test("q99 median equals the brute-force lower/upper-rank mean per segment") {
    val got = q("q99_median_exact").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val vals = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    vals.groupBy(_._1).foreach { case (seg, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val expect = (sorted((n - 1) / 2) + sorted(n / 2)) / 2.0
      assert(got(seg) === expect, s"seg=$seg")
    }
  }

  test("q101 funnel stages are time-ordered and monotonically shrinking") {
    val rows = q("q101_funnel").collect()
    assert(rows.nonEmpty)
    var nView = 0; var nPurchase = 0
    rows.foreach { r =>
      val signup = r.getTimestamp(1)
      val view = Option(r.getTimestamp(2))
      val purchase = Option(r.getTimestamp(3))
      assert(r.getInt(4) === view.size)
      assert(r.getInt(5) === purchase.size)
      view.foreach { v => assert(!v.before(signup)); nView += 1 }
      purchase.foreach { p =>
        assert(view.isDefined, "purchase without view stage")
        assert(!p.before(view.get)); nPurchase += 1
      }
    }
    assert(nPurchase <= nView && nView <= rows.length)
  }

  test("q102 cohort week-0 cell counts the full cohort; offsets non-negative") {
    val rows = q("q102_retention_cohort").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative week offset")
    // every user is active in their own first week, so the week-0 cell
    // must equal the cohort's size
    val cohortSizes = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(date_trunc("week", col("first_ts")).cast("date").as("w"))
      .groupBy(col("w")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val week0 = rows.filter(_._2 == 0).map(t => t._1 -> t._3).toMap
    assert(week0 === cohortSizes)
  }
}
