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

  test("q103 quantile grid cells are ordered and are actual data values") {
    val vals = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    q("q103_quantile_grid").collect().foreach { r =>
      val seg = r.getString(0)
      val qs = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(qs == qs.sorted, s"seg=$seg quantiles not monotone: $qs")
      qs.foreach(v => assert(vals(seg).contains(v), s"seg=$seg $v not a data value"))
    }
  }

  test("q104 trailing-7d active is >= the single-day active count") {
    val daily = Tables.events(spark, dir)
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      .groupBy("day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rows = q("q104_trailing_active").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getDate(0).toString
      assert(r.getLong(1) >= daily(day), s"day=$day trailing < daily")
    }
  }

  test("q105 resample grid is hour-contiguous per user and fill is last-known") {
    val rows = q("q105_resample_ffill")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.get(2)).map(_.toString.toDouble), r.getInt(3)))
      .groupBy(_._1)
    rows.foreach { case (_, rs) =>
      val hours = rs.map(_._2.getTime).toList.sorted
      hours.sliding(2).foreach {
        case a :: b :: Nil => assert(b - a === 3600000L, "grid gap != 1 hour")
        case _             =>
      }
      // the first grid hour contains the user's first event, so it can
      // never be a gap and filled_value is never null afterwards
      val byHour = rs.sortBy(_._2.getTime)
      assert(byHour.head._4 === 0)
      byHour.foreach { case (_, _, filled, _) => assert(filled.isDefined) }
    }
  }

  test("q106 sweep-line matches a brute-force global sweep per day") {
    import scala.jdk.CollectionConverters._
    // rebuild sessions exactly as the query does, then sweep globally
    val sess = q("q106_concurrency_sweep") // result under test
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val sessions = {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .groupBy(_._1)
      ev.values.flatMap { es =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = sorted.head._2; var last = sorted.head._2
        sorted.tail.foreach { case (_, t, _) =>
          if (t - last > 30L * 60 * 1000) { out += ((start, last)); start = t }
          last = t
        }
        out += ((start, last)); out
      }.toSeq
    }
    // brute-force: concurrency at every delta instant, tracked per day
    val deltas = sessions.flatMap { case (s0, s1) => Seq((s0, 1), (s1, -1)) }
      .sortBy { case (t, d) => (t, -d) } // +1 before -1 at the same instant
    var running = 0L
    val maxPerDay = scala.collection.mutable.Map.empty[String, Long]
    val dayOf = (t: Long) => new java.sql.Date(t).toString
    deltas.foreach { case (t, dl) =>
      running += dl
      val d = dayOf(t)
      maxPerDay(d) = math.max(maxPerDay.getOrElse(d, 0L), running)
      // a session open across midnight raises the NEXT day's floor too;
      // the query reports that as open_at_midnight
    }
    sess.foreach { case (day, (opening, got)) =>
      val brute = math.max(maxPerDay.getOrElse(day, 0L), opening)
      assert(got === brute, s"day=$day sweep=$got brute=$brute")
    }
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

  test("q246: MAD flags the spike a mean/stddev monitor would absorb") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mad_").toString
    val day0 = java.time.LocalDate.parse("2025-01-01")
    def ts(k: Int) = java.sql.Timestamp.valueOf(day0.plusDays(k).atStartOfDay)
    // daily counts [8,9,10,11,12,13,50]: med = 11, MAD = 2 (dev2 sorted
    // 0,2,2,4,4,6,78 → rank-4 value 4, mad4 = 8); only the 50-day
    // clears 3.5 MADs, score = 0.6745·39/2 = 13.15275. Top-5 by
    // (dev2 desc, day asc): days 6, 0, 1, 5, 2.
    val counts = Seq(8, 9, 10, 11, 12, 13, 50)
    counts.zipWithIndex.flatMap { case (c, k) =>
      (0 until c).map(i => (k.toLong * 1000 + i, 1L, ts(k)))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    Seq((1L, "S")).toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$tmp/customer.parquet")
    val rows = graft.SparkEntry.queries("q246_mad_anomalies")(spark, tmp)
      .collect()
      .map(r => r.getAs[Long]("n_orders") ->
        ((r.getAs[Double]("score"), r.getAs[Boolean]("is_anomaly"))))
      .toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.keySet === Set(50L, 8L, 9L, 13L, 10L))
    assert(rows(50L) === ((r6(0.6745 * 39.0 / 2.0), true)))
    assert(rows(8L) === ((r6(0.6745 * 3.0 / 2.0), false)))
    assert(!rows.removed(50L).values.exists(_._2))
  }

  test("q247: Theil-Sen shrugs off the spike that drags OLS") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_").toString
    val day0 = java.time.LocalDate.parse("2025-01-01")
    def ts(k: Int) = java.sql.Timestamp.valueOf(day0.plusDays(k).atStartOfDay)
    // counts [1,2,3,100] on consecutive days: pairwise slopes
    // {1,1,1,33,49,97} → median = (1+33)/2 = 17; OLS slope would be
    // ~30.6. n_pairs = C(4,2) = 6.
    val counts = Seq(1, 2, 3, 100)
    counts.zipWithIndex.flatMap { case (c, k) =>
      (0 until c).map(i => (k.toLong * 1000 + i, 1L, ts(k)))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    Seq((1L, "S")).toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$tmp/customer.parquet")
    val rows = graft.SparkEntry.queries("q247_theil_sen")(spark, tmp).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("slope_per_day") === 17.0)
    assert(rows.head.getAs[Long]("n_pairs") === 6L)
  }

  test("q248: Gini is 0 for equal counts and 0.25 for the (1,3) split") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_gini_").toString
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    // segment E: two customers with 2 orders each (perfect equality);
    // segment U: counts (1, 3) — mean 2, mean abs diff 1, G = 1/(2·2).
    val custOrders = Seq((1L, 2), (2L, 2), (3L, 1), (4L, 3))
    custOrders.flatMap { case (cu, c) =>
      (0 until c).map(i => (cu * 100 + i, cu, t0))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$tmp/orders.parquet")
    Seq((1L, "E"), (2L, "E"), (3L, "U"), (4L, "U"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$tmp/customer.parquet")
    val got = graft.SparkEntry.queries("q248_gini")(spark, tmp)
      .collect().map(r => r.getAs[String]("seg") -> r.getAs[Double]("gini")).toMap
    assert(got === Map("E" -> 0.0, "U" -> 0.25))
  }

  test("q249: RFM cell census covers every customer with scores in 1..5") {
    val rows = q("q249_rfm").collect()
    val nCust = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum === nCust)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c)
        assert(v >= 1 && v <= 5, s"$c out of range: $v")
      }
      val (rs, fs, m) = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      val expect =
        if (rs >= 4 && fs >= 4 && m >= 4) "champion"
        else if (rs <= 2 && (fs >= 4 || m >= 4)) "at_risk"
        else if (rs >= 4 && fs <= 2) "recent"
        else "regular"
      assert(r.getAs[String]("label") === expect)
    }
  }
}
