package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — Spark plans a bare non-equi
  * condition as BroadcastNestedLoopJoin (all pairs): correct, quadratic,
  * dead at scale. The scale shape here is TIME-BUCKET BLOCKING: both
  * sides key by a fixed-width time bucket, each interval explodes into
  * every bucket it overlaps, the join is a plain equi-join on
  * (key, bucket), and the exact containment predicate filters inside
  * the join. A point matches an interval in exactly one bucket (its
  * own), so no dedup is needed and candidate volume is
  * |points| + Σ interval_len/bucket — linear.
  */
object RangeJoin {

  /** Inner join of `points` (instant `pointTs`) to `intervals`
    * ([intStart, intEnd), end exclusive) on equal keys and
    * containment. Column names must be disjoint between the two
    * inputs. `bucketSec` should be on the order of typical interval
    * length: too small multiplies the interval explosion, too large
    * grows per-bucket fan-out.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointKey: String, pointTs: String,
      intKey: String, intStart: String, intEnd: String,
      bucketSec: Long = 900L): DataFrame = {
    val bucketUs = bucketSec * 1000000L
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c) / bucketUs)
    val iv = intervals
      .filter(col(intEnd) > col(intStart)) // empty intervals match nothing
      .withColumn("__b",
        explode(sequence(
          bucketOf(col(intStart)),
          bucketOf(col(intEnd) - expr("INTERVAL 1 MICROSECOND")))))
    val pt = points.withColumn("__bp", bucketOf(col(pointTs)))
    pt.join(iv,
        col(pointKey) === col(intKey) && col("__bp") === col("__b") &&
          col(pointTs) >= col(intStart) && col(pointTs) < col(intEnd))
      .drop("__b", "__bp")
  }
}
