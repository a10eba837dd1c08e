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
  val failNext     = new AtomicBoolean(false)
  val failNextLoop = new AtomicBoolean(false)
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

  test("superviseLoop restarts a mid-loop death on its own and exits when all queries are dead") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src    = MemoryStream[Long]
    val sitter = new Babysitter(spark, maxRestarts = 1)

    def start(): StreamingQuery =
      src.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
          if (BabysitterSpecState.failNextLoop.compareAndSet(true, false))
            throw new RuntimeException("boom: mid-loop failure")
          batch.count(); ()
        }
        .start()

    def await(what: String, timeoutMs: Long = 30000)(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!cond) {
        assert(System.currentTimeMillis() < deadline, s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }

    val q1 = sitter.register("looped", () => start())
    val loop = new Thread(() => sitter.superviseLoop(intervalMs = 100), "babysitter-loop")
    try {
      loop.start()

      // kill the query mid-loop; the LOOP must notice and restart it --
      // no manual checkOnce anywhere in this test
      BabysitterSpecState.failNextLoop.set(true)
      src.addData(1L, 2L)
      await("loop-driven restart") {
        val q = sitter.query("looped")
        q != null && q.id != q1.id && q.isActive
      }
      assert(loop.isAlive, "loop must keep polling while its query runs")

      // the restarted query processes new data normally
      val q2 = sitter.query("looped")
      src.addData(3L, 4L)
      q2.processAllAvailable()
      assert(sitter.report().head.status == "restarted")

      // stop the restarted query: budget is exhausted, so the next poll
      // declares it dead and the loop must exit on its own
      q2.stop()
      await("loop exit after all queries dead") { !loop.isAlive }
      assert(sitter.report().map(h => (h.status, h.restarts)) == Seq(("dead", 1)))
    } finally {
      loop.interrupt()
      loop.join(5000)
      sitter.shutdown()
    }
  }
}
