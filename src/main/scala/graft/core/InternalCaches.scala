package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for OPERATOR-INTERNAL Dataset persists — the round-9 answer
  * to the cache-lifecycle gap a review flagged on `duplicatePassages`
  * and that actually applies to every operator here that persists a
  * shared intermediate (similarity-join shingle tables, graph edge
  * lists, OCR pass frames): `Dataset.persist` registers the plan in the
  * session's CacheManager, which holds a strong reference until
  * `unpersist()`/`clearCache()` — the ContextCleaner reclaim that works
  * for raw RDD caching does NOT apply, so an operator that persists and
  * returns lazily has no correct place to unpersist, and a long-lived
  * session (test suite, notebook, repeated deliveries) accumulates one
  * cached plan per call.
  *
  * The registry makes the leak releasable without collateral damage:
  * operators persist through [[persistTracked]], and a long-lived caller
  * drops every graft-internal cache with [[release]] between pipelines —
  * unlike `spark.catalog.clearCache()`, the caller's OWN cached tables
  * survive. One-shot jobs (the driver's Verify/Bench pattern, any
  * spark-submit batch) never need to call it: caches die with the
  * session.
  *
  * Entries hold strong references until released or until their session
  * stops ([[release]] prunes dead-session entries); each entry is a few
  * object references — the CacheManager already holds the heavyweight
  * plan, so tracking adds no meaningful footprint. Thread-safe via a
  * concurrent queue; double-release and releasing an already-unpersisted
  * frame are no-ops (`unpersist` is idempotent).
  */
object InternalCaches {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** `df.persist(level)`, registered for [[release]]. */
  def persistTracked(df: DataFrame,
                     level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    tracked.add(p)
    p
  }

  /** Unpersist every tracked internal cache (non-blocking) and empty the
    * registry. Safe at any time: a pipeline still holding a released
    * frame recomputes it lazily — results never change, only the cache
    * does. Call between pipelines in long-lived sessions. */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
      catch { case _: Exception => () } // session torn down mid-release
      df = tracked.poll()
    }
  }

  /** Number of currently tracked (not yet released) internal caches —
    * observability for the leak this registry exists to close. */
  def trackedCount: Int = tracked.size()
}
