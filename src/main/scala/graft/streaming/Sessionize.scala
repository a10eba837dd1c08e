package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state streaming operator class the reference never needed
  * (SURVEY.md §2.10 "not present") but a production event pipeline does:
  * close a user session after `gapMinutes` of event-time silence and emit
  * one summary row per closed session.
  *
  * State is bounded by the watermark: event-time timeouts fire as the
  * watermark passes `last + gap`, so state size is O(active users within
  * the gap window) regardless of stream length — the property that keeps
  * this runnable against an unbounded 100 TB/day stream.
  */
object Sessionize {

  /** `event_id` exists for deterministic processing order: two events
    * with the same millisecond timestamp would otherwise fold their
    * values in an arbitrary order, making the Double session total
    * run-dependent. Defaults to 0 for callers without a natural id.
    */
  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double, event_id: Long = 0L)

  final case class SessionState(
      startMs: Long,
      lastMs: Long,
      nEvents: Long,
      totalValue: Double
  )

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      total_value: Double
  )

  def sessions(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    implicit val stateEnc   = Encoders.product[SessionState]
    implicit val sessionEnc = Encoders.product[Session]
    implicit val longEnc    = Encoders.scalaLong
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
        def toSession(s: SessionState): Session =
          Session(userId, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
            s.nEvents, s.totalValue)

        if (state.hasTimedOut) {
          // watermark passed last+gap: close and emit the session
          val closed = state.getOption.map(toSession).toSeq
          state.remove()
          closed.iterator
        } else {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var emitted = Seq.empty[Session]
          var cur     = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(SessionState(s.startMs, math.max(s.lastMs, t),
                  s.nEvents + 1, s.totalValue + e.value))
              case Some(s) => // gap exceeded within the data itself
                emitted = emitted :+ toSession(s)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
          }
          emitted.iterator
        }
      }
  }
}
