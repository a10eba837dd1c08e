package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` arbitrary-state operator — the
  * successor API to `flatMapGroupsWithState` (SPARK-46815): typed state
  * variables (Value/List/Map) with per-state TTL, timers decoupled from
  * state rows, and a mandatory RocksDB backend, i.e. the state-store
  * configuration a 100 TB/day stream actually runs (spillable state,
  * changelog checkpointing, state size decoupled from executor heap).
  *
  * The processor here is deliberately order-insensitive: per-key state
  * is a single running event count (commutative +), and every
  * invocation emits the new cumulative value, so whatever the batch
  * split or within-batch arrival order, the per-key MAXIMUM of the
  * emitted stream equals the exact batch count — which is what q170
  * gates against the DuckDB oracle.
  */
object TransformWithStateOps {

  final case class In(user_id: Long, event_id: Long)
  final case class CumCount(user_id: Long, n_seen: Long)

  /** Run `body` with the RocksDB state-store provider (mandatory for
    * transformWithState), restoring the previous provider after — the
    * one conf-swap shared by the query and its specs.
    */
  def withRocksDBStateStore[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev    = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => s.conf.set(provKey, p)
      case None    => s.conf.unset(provKey)
    }
  }

  /** Per-user running count in a ValueState[Long]; no timers, no TTL —
    * state is one long per key, the minimal footprint for the API.
    */
  final class RunningCountProcessor extends StatefulProcessor[Long, In, CumCount] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[In],
        timerValues: TimerValues): Iterator[CumCount] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single(CumCount(key, n))
    }
  }
}
