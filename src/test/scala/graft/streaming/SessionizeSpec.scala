package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful sessionization through a real incremental stream: sessions
  * close on event-time timeout as the watermark advances across
  * micro-batches.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2025-06-01 10:$minute%02d:00")
      .asInstanceOf[java.sql.Timestamp]

  test("sessions close after the event-time gap and carry their aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input  = MemoryStream[Sessionize.Event]
    val result = Sessionize.sessions(input.toDS(), gapMinutes = 30)

    val q = result.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: user 1 has two events 10 min apart; user 2 one event
      input.addData(
        Sessionize.Event(1L, ts(0), 2.0),
        Sessionize.Event(1L, ts(10), 3.0),
        Sessionize.Event(2L, ts(5), 7.0)
      )
      q.processAllAvailable()
      // batch 2: far-future event advances the watermark past all gaps
      input.addData(
        Sessionize.Event(3L, java.sql.Timestamp.valueOf("2025-06-01 13:00:00"), 1.0)
      )
      q.processAllAvailable()
      // one more batch so the timeout (triggered by the new watermark) emits
      input.addData(
        Sessionize.Event(3L, java.sql.Timestamp.valueOf("2025-06-01 13:01:00"), 1.0)
      )
      q.processAllAvailable()

      val sessions = spark.table("sessions_out").as[Sessionize.Session]
        .collect().sortBy(_.user_id)
      val u1 = sessions.find(_.user_id == 1L)
      assert(u1.isDefined, s"user 1 session should have closed; got ${sessions.mkString(", ")}")
      assert(u1.get.n_events == 2 && u1.get.total_value == 5.0)
      assert(u1.get.session_start == ts(0) && u1.get.session_end == ts(10))
      val u2 = sessions.find(_.user_id == 2L)
      assert(u2.isDefined && u2.get.n_events == 1 && u2.get.total_value == 7.0)
    } finally q.stop()
  }

  test("in-batch gaps split into multiple sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input  = MemoryStream[Sessionize.Event]
    val result = Sessionize.sessions(input.toDS(), gapMinutes = 5)
    val q = result.writeStream
      .format("memory").queryName("sessions_out2").outputMode("append").start()
    try {
      input.addData(
        Sessionize.Event(9L, ts(0), 1.0),
        Sessionize.Event(9L, ts(1), 1.0),
        Sessionize.Event(9L, ts(20), 1.0) // > 5 min later -> new session
      )
      q.processAllAvailable()
      val closed = spark.table("sessions_out2").as[Sessionize.Session].collect()
      // the first session closed in-batch (gap detected in the data itself)
      assert(closed.exists(s => s.user_id == 9L && s.n_events == 2))
    } finally q.stop()
  }
}
