package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SSIS-style Lookup (reference: Integration/SSIS/Professional…/Глава
  * 07…md:29-48 — Full Cache hash probe with match and no-match output
  * streams; cascades for fact loading, Глава 10…md:70-76).
  *
  * Spark-first shape: a broadcast LEFT join — the reference's "full
  * cache" is exactly Spark's BroadcastHashJoin build side. The no-match
  * stream is a filter on a match flag rather than a second pass. At
  * 100 TB the probe side streams through codegen with zero shuffle as
  * long as the reference table fits the broadcast threshold; for larger
  * reference tables drop the `broadcast` hint and Catalyst falls back
  * to a shuffle join (the reference's "partial cache" analog).
  */
object Lookup {

  /** Left-join `ref` onto `stream` (broadcast by default), adding
    * boolean `__matched`. `refKey` must be a column of `ref`; it is
    * compared to `streamKey` of `stream` and dropped from the output.
    */
  def apply(
      stream: DataFrame,
      ref: DataFrame,
      streamKey: String,
      refKey: String,
      broadcastRef: Boolean = true): DataFrame = {
    val r = if (broadcastRef) broadcast(ref) else ref
    stream
      .join(r, stream(streamKey) === r(refKey), "left")
      .withColumn("__matched", r(refKey).isNotNull)
      .drop(r(refKey))
  }

  /** The two output streams of a Lookup: (match, no-match). The parent
    * is evaluated twice unless cached — callers on a hot path should
    * route via the `__matched` flag in a single pass instead.
    */
  def split(looked: DataFrame): (DataFrame, DataFrame) =
    (looked.filter(col("__matched")).drop("__matched"),
     looked.filter(!col("__matched")).drop("__matched"))
}
