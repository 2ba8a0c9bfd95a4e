package graft

import org.apache.spark.sql.DataFrame

/** Registry for persisted intermediates pinned by `singleScan`-style
  * operators (spanDedup, tfidfTopK, lmPerplexity): the persist must
  * outlive the call (the returned plan is lazy), so the operator can't
  * unpersist it itself — without a handle each call would leak a
  * MEMORY_AND_DISK block for the session's lifetime. Operators register
  * the block here; callers release all of them once results are
  * materialized ([[release]]). Bench/Verify release between catalog
  * entries; long-lived library sessions should call it at pipeline
  * boundaries.
  */
object Caches {
  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist-and-register: returns `df` persisted, tracked for
    * [[release]].
    */
  private[graft] def pin(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.add(p)
    p
  }

  /** Unpersist every intermediate pinned so far (idempotent; safe while
    * queries are running — Spark recomputes evicted blocks from
    * lineage).
    */
  def release(): Unit = {
    var d = pinned.poll()
    while (d != null) {
      try d.unpersist(blocking = false) catch { case _: Throwable => }
      d = pinned.poll()
    }
  }
}
