package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Incremental / partial aggregate state (SURVEY A6; reference:
  * Datamarts/Правильное построение витрины с множественными
  * агрегациями.md:83-99 — `groupArrayState` partials in a
  * ReplacingMergeTree MV, finalized with `groupArrayMerge` at query
  * time).
  *
  * The engine-level pattern: a materialized-view table stores MERGEABLE
  * partial states per key (counts, scaled-integer sums, ordered
  * element lists); each new batch folds in with one `unionByName` +
  * re-aggregate (all states are associative+commutative monoids), and
  * a finalize projection produces the serving values. Maintaining the
  * MV over N batches is exactly equal to recomputing over the full
  * input — the property the spec asserts.
  *
  * At 100 TB: the fold shuffles only the BATCH (small) plus the
  * compacted MV (one row per key), never the history.
  */
object IncrementalAgg {

  /** Partial-state schema for a (count, exact-sum, ordered-list) MV:
    * key cols ++ (n, sum_cents, elems).
    */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String,
      ordCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(graft.functions.ExactAgg.cents(col(valueCol))).as("sum_cents"),
        graft.functions.OrderedAgg
          .sortedZip(col(ordCol), "o" -> col(ordCol), "v" -> col(valueCol))
          .as("elems"))

  /** Merge a new batch's partials into the MV (State ⊕ State). */
  def merge(mv: DataFrame, batchPartial: DataFrame, keys: Seq[String]): DataFrame =
    mv.unionByName(batchPartial)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        array_sort(flatten(collect_list(col("elems")))).as("elems"))

  /** Finalize (Merge → serving values): scalar totals + the ordered
    * value array.
    */
  def finalize(mv: DataFrame, keys: Seq[String]): DataFrame =
    mv.select(
      keys.map(col) ++ Seq(
        col("n"),
        (col("sum_cents").cast("double") / 100.0).as("total"),
        transform(col("elems"), e => e.getField("v")).as("values")): _*)

  /** Typed Aggregator exposing the same partial/merge contract as a
    * reusable column aggregate (registerable via `functions.udaf`):
    * exact money sum through long cents.
    */
  object CentsSum extends Aggregator[Double, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = b + math.round(a * 100)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Double = r / 100.0
    def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Column form of [[CentsSum]]. */
  def centsSum(c: Column): Column = udaf(CentsSum).apply(c)
}
