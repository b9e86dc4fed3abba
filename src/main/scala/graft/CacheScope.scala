package graft

import org.apache.spark.sql.DataFrame

/** Registry for the narrow intermediates graft operators `persist()`
  * while building a result (shingle sets, signature tables, gram and
  * bucket tables). Operators return LAZY DataFrames, so they can never
  * unpersist their own intermediates — the blocks must outlive the
  * call until the caller materializes the result.
  *
  * The library contract: after materializing an operator's result
  * (count/collect/write), call [[CacheScope.release]] — or
  * `spark.catalog.clearCache()` — to drop every graft-internal cached
  * block. `Verify` and `Bench` do this between queries; a long-lived
  * session that skips it degrades to LRU eviction, never to wrong
  * results. (The one deliberate exception: `CsvIngest`/`XmlIngest`
  * cache their RETURNED staging frame — Spark requires
  * corrupt-record-only projections to be cached, and releasing a
  * frame the caller still holds would break that contract.)
  */
object CacheScope {
  private val tracked = scala.collection.mutable.Buffer.empty[DataFrame]

  /** `df.persistTracked()` — persist and register for [[release]]. */
  implicit final class TrackedDataFrame(private val df: DataFrame)
      extends AnyVal {
    def persistTracked(): DataFrame = track(df)
  }

  private[graft] def track(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Unpersist every operator-internal cached block. */
  def release(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(df =>
      try df.unpersist(blocking)
      catch { case _: Throwable => () })
    tracked.clear()
  }

  /** Currently tracked block count (diagnostics / tests). */
  def trackedCount: Int = synchronized(tracked.size)

  /** Frames tracked right now (tests assert per-frame unpersist after
    * [[release]] without racing concurrently-running suites' caches).
    */
  private[graft] def trackedSnapshot: Seq[DataFrame] =
    synchronized(tracked.toList)
}
