package graft

import org.apache.spark.sql.DataFrame

/** Session-bounded cache leasing shared by the query modules.
  *
  * A module registers every intermediate it `persist()`s; every wrapped
  * query entry first releases the intermediates persisted by PREVIOUS
  * invocations across ALL wrapped modules. Release is deferred exactly
  * one generation because a returned plan must stay persisted until the
  * caller materializes it — so repeated invocations in one session stay
  * bounded (at most one generation of cached blocks) without callers
  * needing a global `clearCache()`.
  */
object CacheLeases {

  private val leases = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register a persisted intermediate for next-entry release. */
  def lease(df: DataFrame): DataFrame = { leases.add(df); df }

  /** Release everything leased by previous invocations. */
  def releasePrevious(): Unit = {
    var df = leases.poll()
    while (df != null) {
      try df.unpersist(false)
      catch { case _: Exception => () }
      df = leases.poll()
    }
  }

  /** Wrap a module's query map so every entry drains previous leases.
    *
    * SEQUENTIAL-EXECUTION ASSUMPTION: draining releases the intermediates of
    * the previous entry across ALL wrapped modules, which is correct (and
    * keeps cache residency bounded to one generation) only when queries run
    * one at a time, as the Bench/Verify harnesses do. If entries ever run
    * concurrently in one session, a drain could unpersist a sibling's
    * still-in-use frame — a silent recompute, not a wrong answer. The guard
    * below narrows, but does not close, that window: it only serializes the
    * drain against concurrent PLAN CONSTRUCTION (`entered` is reset when
    * q.fn returns its unexecuted DataFrame), so a later entry's drain can
    * still unpersist frames while a previous caller is mid-materialization.
    * Bench/Verify run entries strictly one materialization at a time, which
    * is the contract this helper actually relies on.
    */
  private val entered = new java.util.concurrent.atomic.AtomicBoolean(false)

  def draining(qs: Map[String, QueryDef]): Map[String, QueryDef] =
    qs.map { case (name, q) =>
      name -> q.copy(fn = (s, d) => {
        val sole = entered.compareAndSet(false, true)
        try { if (sole) releasePrevious(); q.fn(s, d) }
        finally { if (sole) entered.set(false) }
      })
    }
}
