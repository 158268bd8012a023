package graft.operators

import org.apache.spark.sql.DataFrame

/** Process-wide registry of persisted intermediates.
  *
  * Operators that persist() plan fragments (pair miners' shingle
  * explosions and banded keys, tf tables, component-label iterates)
  * register them here; harnesses and library callers release them in one
  * place once results are materialized. Neutral home so TextQueries /
  * Dedup / future modules share one lifecycle without cross-module
  * coupling (a TextQueries caller shouldn't need to know Dedup exists).
  *
  * Releasing is safe at any time — results computed after release simply
  * recompute their intermediates — but only call from a coordination
  * point where no registered plan is still pending materialization
  * (e.g. between queries in a single-threaded harness).
  */
object CacheRegistry {
  private val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register a persisted DataFrame; returns it unchanged. */
  def tracked(df: DataFrame): DataFrame = synchronized {
    caches += df
    df
  }

  /** Unpersist and forget every registered intermediate.
    *
    * `blocking = true` waits for the executor-side free — use it from
    * timing harnesses so a lagging async unpersist can't bleed memory
    * pressure into the next measured query.
    */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    caches.foreach(_.unpersist(blocking))
    caches.clear()
  }
}
