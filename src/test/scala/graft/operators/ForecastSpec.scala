package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-traceable and independently-recomputed cases for the Holt
  * forecasting pair (q208/q209). The smoothing weights are binary
  * fractions, so on hand-picked inputs every intermediate is an exact
  * binary fraction and the assertions are EXACT equality — no epsilon.
  */
class ForecastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeCorpus(rows: Seq[(Long, Long, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_holt_").toString
    rows.map { case (ok, ck, price, day) => (ok, ck, price, day) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp"))
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .drop("d")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((1L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .withColumn("c_name", lit("x"))
      .withColumn("c_nationkey", lit(1))
      .withColumn("c_acctbal", lit(0.0))
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("q208: three-day hand series folds to the exact binary fractions") {
    // days y = 1, 3, 5 (two orders on day 1 summing to 1.0 exercises
    // the daily pre-aggregation too):
    //   init            l = 1,     b = 0
    //   y=3: l = .5*3 + .5*1      = 2      b = .25*(2-1) + .75*0    = .25
    //   y=5: l = .5*5 + .5*2.25   = 3.625  b = .25*1.625 + .75*.25  = .59375
    val dir = writeCorpus(Seq(
      (1L, 1L, 0.25, "2024-01-01"), (2L, 1L, 0.75, "2024-01-01"),
      (3L, 1L, 3.0, "2024-01-02"), (4L, 1L, 5.0, "2024-01-03")))
    val r = graft.SparkEntry.queries("q208_holt_forecast")(spark, dir).head()
    assert(r.getAs[Long]("n_days") === 3L)
    assert(r.getAs[Double]("level") === 3.625)
    assert(r.getAs[Double]("trend") === 0.59375)
    assert(r.getAs[Double]("fc_1") === 3.625 + 0.59375)
    assert(r.getAs[Double]("fc_28") === 3.625 + 28.0 * 0.59375)
  }

  test("q209: backtest matches an independent plain-Scala replay") {
    // 40 observed days of hash-derived values: train = first 12,
    // holdout = last 28; recompute level/trend/MAE independently with
    // a plain sequential loop over doubles
    val ys = (1 to 40).map(t => ((t * 2654435761L) % 1000).toDouble / 4.0)
    val dir = writeCorpus(ys.zipWithIndex.map { case (y, i) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      (i.toLong + 1, 1L, y, day.toString)
    })
    val r = graft.SparkEntry.queries("q209_forecast_backtest")(spark, dir).head()
    val train = ys.take(12)
    var l = train.head; var b = 0.0
    train.tail.foreach { y =>
      val nl = 0.5 * y + 0.5 * (l + b)
      b = 0.25 * (nl - l) + 0.75 * b
      l = nl
    }
    val mae = ys.drop(12).zipWithIndex.map { case (y, h0) =>
      math.abs(y - (l + (h0 + 1) * b))
    }.sum / 28.0
    assert(r.getAs[Long]("n_train") === 12L)
    assert(math.abs(r.getAs[Double]("level") - l) < 1e-6)
    assert(math.abs(r.getAs[Double]("trend") - b) < 1e-6)
    assert(math.abs(r.getAs[Double]("mae") - mae) < 1e-5, s"mae ${r.getAs[Double]("mae")} vs $mae")
  }

  test("q210: four-batch continued fold equals the one-shot q208 row for row") {
    val ys = (1 to 37).map(t => ((t * 1103515245L) % 777).toDouble / 8.0)
    val dir = writeCorpus(ys.zipWithIndex.map { case (y, i) =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong)
      (i.toLong + 1, 1L, y, day.toString)
    })
    val oneShot = graft.SparkEntry.queries("q208_holt_forecast")(spark, dir)
      .collect().map(_.toSeq).toSet
    val continued = graft.SparkEntry.queries("q210_holt_incremental")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(continued === oneShot)
  }

  test("q212: streaming micro-batch maintenance equals the one-shot q208") {
    val ys = (1 to 37).map(t => ((t * 1103515245L) % 777).toDouble / 8.0)
    val dir = writeCorpus(ys.zipWithIndex.map { case (y, i) =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(i.toLong)
      (i.toLong + 1, 1L, y, day.toString)
    })
    val oneShot = graft.SparkEntry.queries("q208_holt_forecast")(spark, dir)
      .collect().map(_.toSeq).toSet
    val streamed = graft.SparkEntry.queries("q212_stream_forecast_maintenance")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot)
  }

  test("q218: nine-day hand series folds to the exact Holt-Winters state") {
    // y = 1..9: init after day 7 → l = 4, b = 0, s = [-3..3]
    //   day 8 (y=8, s1=-3): l = .5*11 + .5*4        = 7.5
    //                       b = .25*3.5             = 0.875
    //                       s7' = .25*.5 + .75*(-3) = -2.125
    //   day 9 (y=9, s1=-2): l = .5*11 + .5*8.375    = 9.6875
    //                       b = .25*2.1875+.75*.875 = 1.203125
    // final slots rotate to s_next = -1
    val dir = writeCorpus((1 to 9).map { i =>
      val day = java.time.LocalDate.of(2024, 5, 1).plusDays(i.toLong - 1)
      (i.toLong, 1L, i.toDouble, day.toString)
    })
    val r = graft.SparkEntry.queries("q218_holt_winters")(spark, dir).head()
    assert(r.getAs[Long]("n_days") === 9L)
    assert(r.getAs[Double]("level") === 9.6875)
    assert(r.getAs[Double]("trend") === 1.203125)
    assert(r.getAs[Double]("s_next") === -1.0)
    assert(r.getAs[Double]("fc_1") === (9.6875 + 1.203125) - 1.0)
    assert(r.getAs[Double]("fc_7") === (9.6875 + 7.0 * 1.203125) - 1.671875)
  }

  test("q211: radius is the 27th smallest |calibration residual|") {
    val ys = (1 to 40).map(t => ((t * 2654435761L) % 1000).toDouble / 4.0)
    val dir = writeCorpus(ys.zipWithIndex.map { case (y, i) =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      (i.toLong + 1, 1L, y, day.toString)
    })
    val r = graft.SparkEntry.queries("q211_forecast_interval")(spark, dir).head()
    val train = ys.take(12)
    var l = train.head; var b = 0.0
    train.tail.foreach { y =>
      val nl = 0.5 * y + 0.5 * (l + b)
      b = 0.25 * (nl - l) + 0.75 * b
      l = nl
    }
    val radius = ys.drop(12).zipWithIndex
      .map { case (y, h0) => math.abs(y - (l + (h0 + 1) * b)) }
      .sorted.apply(26)
    val fc = l + 29.0 * b
    assert(math.abs(r.getAs[Double]("radius") - radius) < 1e-6)
    assert(math.abs(r.getAs[Double]("lo") - (fc - radius)) < 1e-6)
    assert(math.abs(r.getAs[Double]("hi") - (fc + radius)) < 1e-6)
  }
}
