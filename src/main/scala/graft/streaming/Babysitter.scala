package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** G4 — streaming babysitter: health-check, restart-if-dead, lag report
  * (reference: `orchestration/dags/bakery_streaming_manager.py:46-145`,
  * which polls job health hourly, restarts the streaming app when its
  * process is gone, and dumps consumer-lag metrics).
  *
  * Spark-native shape: queries are registered as named restart thunks;
  * [[checkOnce]] is the health poll (restart dead queries up to
  * `maxRestarts`, capture the terminal error), and a
  * [[StreamingQueryListener]] accumulates per-query progress (rows/sec
  * in and processed, last batch size, trigger duration) so [[report]]
  * answers the reference's "check streaming metrics" step without
  * scraping a UI. Driver-side bookkeeping only — per-query state lives
  * in the engine's checkpoints, so a restart resumes, not replays.
  */
final class Babysitter(spark: SparkSession, maxRestarts: Int = 3) {

  import Babysitter._

  private val managed  = new ConcurrentHashMap[String, () => StreamingQuery]
  private val order    = new java.util.concurrent.CopyOnWriteArrayList[String]
  private val running  = new ConcurrentHashMap[String, StreamingQuery]
  private val restarts = new ConcurrentHashMap[String, Integer]
  private val lastErr  = new ConcurrentHashMap[String, String]
  private val progress = new ConcurrentHashMap[java.util.UUID, Progress]

  /** Lag/progress listener — one per babysitter, keyed by query id so a
    * restarted query (new id) reports fresh numbers.
    */
  private val listener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      progress.put(
        p.id,
        Progress(
          batchId = p.batchId,
          inputRows = p.numInputRows,
          inputRowsPerSec = orZero(p.inputRowsPerSecond),
          processedRowsPerSec = orZero(p.processedRowsPerSecond),
          triggerMs = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)
        ))
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach { msg =>
        // map id back to the managed name, if it is one of ours
        running.asScala.collectFirst {
          case (name, q) if q.id == e.id => name
        }.foreach(lastErr.put(_, msg))
      }
  }
  spark.streams.addListener(listener)

  /** Register and immediately start a named query. */
  def register(name: String, start: () => StreamingQuery): StreamingQuery = {
    managed.put(name, start)
    if (!order.contains(name)) order.add(name)
    val q = start()
    running.put(name, q)
    q
  }

  /** The currently-running query for `name` (post-restart it differs
    * from what [[register]] returned).
    */
  def query(name: String): StreamingQuery = running.get(name)

  /** One health poll: restart every dead managed query (up to
    * `maxRestarts` each), recording the terminal error. Returns the
    * post-poll health report. Idempotent when everything is healthy.
    */
  def checkOnce(): Seq[Health] = {
    order.asScala.toSeq.foreach { name =>
      val q = running.get(name)
      val dead = q == null || !q.isActive
      if (dead) {
        if (q != null)
          q.exception.foreach(ex => lastErr.put(name, ex.getMessage))
        val n = restarts.getOrDefault(name, 0)
        if (n < maxRestarts) {
          restarts.put(name, n + 1)
          running.put(name, managed.get(name)())
        }
      }
    }
    report()
  }

  /** Per-query health + latest progress, in registration order. */
  def report(): Seq[Health] =
    order.asScala.toSeq.map { name =>
      val q = running.get(name)
      val n = restarts.getOrDefault(name, 0).intValue
      val status =
        if (q != null && q.isActive) { if (n > 0) "restarted" else "running" }
        else if (n >= maxRestarts) "dead"
        else "stopped"
      // the listener bus is async: if this run's event hasn't been
      // delivered yet, fall back to the query's own lastProgress (the
      // engine updates it synchronously with the batch commit)
      val p = Option(q)
        .flatMap(x => Option(progress.get(x.id)))
        .orElse(Option(q).flatMap(x => Option(x.lastProgress)).map { lp =>
          Progress(
            batchId = lp.batchId,
            inputRows = lp.numInputRows,
            inputRowsPerSec = orZero(lp.inputRowsPerSecond),
            processedRowsPerSec = orZero(lp.processedRowsPerSecond),
            triggerMs = Option(lp.durationMs.get("triggerExecution"))
              .map(_.longValue).getOrElse(0L)
          )
        })
      Health(
        name = name,
        status = status,
        restarts = n,
        lastError = Option(lastErr.get(name)),
        lastBatchRows = p.map(_.inputRows).getOrElse(0L),
        inputRowsPerSec = p.map(_.inputRowsPerSec).getOrElse(0.0),
        processedRowsPerSec = p.map(_.processedRowsPerSec).getOrElse(0.0),
        batchDurationMs = p.map(_.triggerMs).getOrElse(0L)
      )
    }

  /** Poll loop for production use: health-check every `intervalMs` until
    * every managed query is dead/stopped or the thread is interrupted.
    * Tests drive [[checkOnce]] directly for determinism.
    */
  def superviseLoop(intervalMs: Long): Unit =
    try {
      while (checkOnce().exists(h =>
          h.status == "running" || h.status == "restarted"))
        Thread.sleep(intervalMs)
    } catch { case _: InterruptedException => () }

  /** Stop all managed queries and detach the listener. */
  def shutdown(): Unit = {
    running.values.asScala.foreach(q => if (q.isActive) q.stop())
    spark.streams.removeListener(listener)
  }

  private def orZero(d: Double): Double = if (d.isNaN) 0.0 else d
}

object Babysitter {

  /** Latest progress snapshot for one query run. */
  final case class Progress(
      batchId: Long,
      inputRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      triggerMs: Long
  )

  /** One row of the babysitter's health report. */
  final case class Health(
      name: String,
      status: String, // running | restarted | stopped | dead
      restarts: Int,
      lastError: Option[String],
      lastBatchRows: Long,
      inputRowsPerSec: Double,
      processedRowsPerSec: Double,
      batchDurationMs: Long
  )
}
