package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Shared mutable flag outside the suite so the foreachBatch closure
  * (driver-side) doesn't capture the suite instance.
  */
object BabysitterSpecState {
  val failNext = new AtomicBoolean(false)
}

/** G4 babysitter: kill a query (foreachBatch throws), observe the health
  * poll restart it, and check the progress report carries batch metrics.
  */
class BabysitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("checkOnce restarts a dead query and the report shows progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src    = MemoryStream[Long]
    val sitter = new Babysitter(spark, maxRestarts = 2)

    def start(): StreamingQuery =
      src.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
          if (BabysitterSpecState.failNext.compareAndSet(true, false))
            throw new RuntimeException("boom: injected batch failure")
          batch.count(); ()
        }
        .start()

    try {
      BabysitterSpecState.failNext.set(true)
      val q1 = sitter.register("ingest", () => start())
      src.addData(1L, 2L, 3L)
      intercept[Exception](q1.processAllAvailable()) // dies on the batch

      val afterRestart = sitter.checkOnce()
      assert(afterRestart.map(h => (h.name, h.status, h.restarts)) ==
        Seq(("ingest", "restarted", 1)))
      assert(afterRestart.head.lastError.exists(_.contains("boom")),
        s"lastError=${afterRestart.head.lastError}")

      val q2 = sitter.query("ingest")
      assert(q2.id != q1.id && q2.isActive)
      src.addData(4L, 5L)
      q2.processAllAvailable() // healthy now: flag was consumed

      val healthy = sitter.checkOnce()
      assert(healthy.head.status == "restarted" && healthy.head.restarts == 1)
      assert(healthy.head.lastBatchRows > 0L,
        s"expected progress rows, got ${healthy.head}")
      assert(healthy.head.batchDurationMs >= 0L)
    } finally sitter.shutdown()
  }

  test("a query that keeps dying is declared dead after maxRestarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src    = MemoryStream[Long]
    val sitter = new Babysitter(spark, maxRestarts = 1)

    def start(): StreamingQuery =
      src.toDS().writeStream
        .foreachBatch { (_: org.apache.spark.sql.Dataset[Long], _: Long) =>
          throw new RuntimeException("always fails")
        }
        .start()

    try {
      val q1 = sitter.register("doomed", () => start())
      src.addData(1L)
      intercept[Exception](q1.processAllAvailable())

      val r1 = sitter.checkOnce() // consumes the single allowed restart
      assert(r1.head.restarts == 1)
      val q2 = sitter.query("doomed")
      intercept[Exception](q2.processAllAvailable()) // dies again

      val r2 = sitter.checkOnce() // budget exhausted -> dead, no restart
      assert(r2.map(h => (h.status, h.restarts)) == Seq(("dead", 1)))
    } finally sitter.shutdown()
  }
}
