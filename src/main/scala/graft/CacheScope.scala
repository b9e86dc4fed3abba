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

  /** Eager `localCheckpoint(true)` that does NOT carry the source
    * plan's inferred constraint set into the checkpointed LogicalRDD.
    *
    * `Dataset.localCheckpoint` truncates the logical plan and the RDD
    * lineage, but it also REWRITES the optimized plan's `constraints`
    * onto the new LogicalRDD (`LogicalRDD.fromDataset` →
    * `rewriteStatsAndConstraints`). For an ITERATIVE fold — scd2 over
    * a sequence of snapshot dates, connected-components rounds — the
    * constraint EXPRESSIONS compound across iterations even though the
    * plan stays flat: a union's common-constraint merge ORs the legs'
    * constraint sets, each leg carries the previous iteration's
    * constraint through the checkpointed base, and the per-iteration
    * expression size DOUBLES (measured: 3 constraints growing 187 →
    * 10M chars by fold 15 of a 25-date scd2 backfill, then OOM inside
    * the optimizer copying EqualNullSafe trees). Scoping
    * `spark.sql.constraintPropagation.enabled=false` around the
    * checkpoint makes the captured set empty — the fold boundary is a
    * clean slate, which is exactly what checkpointing promises. The
    * flag only gates constraint INFERENCE (an optimization), never
    * results.
    */
  private[graft] def localCheckpointTruncated(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.constraintPropagation.enabled"
    // The flag is SESSION-global and graft folds can overlap on one
    // SparkSession (Dag runs tasks concurrently): a naive get/set/
    // restore pair interleaved across two threads can restore the
    // wrong value and leave constraint propagation disabled for the
    // rest of the session. A nesting counter serializes save/restore:
    // the FIRST entering call saves the ambient value, the LAST
    // leaving call restores it, and the flag being off while any
    // checkpoint is in flight only skips an optimization for queries
    // that compile inside that window — never changes results.
    cpLock.synchronized {
      if (cpDepth == 0) { cpSaved = conf.get(key); conf.set(key, "false") }
      cpDepth += 1
    }
    try df.localCheckpoint(true)
    finally cpLock.synchronized {
      cpDepth -= 1
      if (cpDepth == 0) conf.set(key, cpSaved)
    }
  }

  private val cpLock = new Object
  private var cpDepth = 0
  private var cpSaved: String = "true"

  /** Currently tracked block count (diagnostics / tests). */
  def trackedCount: Int = synchronized(tracked.size)

  /** Frames tracked right now (tests assert per-frame unpersist after
    * [[release]] without racing concurrently-running suites' caches).
    */
  private[graft] def trackedSnapshot: Seq[DataFrame] =
    synchronized(tracked.toList)
}
