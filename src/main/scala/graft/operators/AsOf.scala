package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to each left row the right side's latest value
  * at-or-before the left row's event time, per key. Spark has no
  * native as-of join; the scalable form here is the UNION + ORDERED
  * WINDOW shape: tag both sides, union, one hash shuffle on the key,
  * one per-partition sort on (ts, side), and a running
  * last-non-null — NEVER a range-condition join, whose candidate set
  * is quadratic in per-key density. Cost at any scale: one shuffle of
  * (|L|+|R|) narrow rows.
  *
  * Determinism: the right side is pre-deduped to one row per
  * (key, ts) (max of the attached value), and at equal timestamps the
  * right row sorts BEFORE the left row (src 0 < 1) — at-or-before
  * semantics, bit-stable under any partitioning because ties among
  * left rows contribute nothing to the running value.
  */
object AsOf {

  def joinAsOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      attach: String, outCol: String): DataFrame = {
    val r = right.groupBy(col(rightKey).as("__k"), col(rightTs).as("__ts"))
      .agg(max(col(attach)).as(outCol))
      .withColumn("__src", lit(0))
    val rowT = struct(left.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(null).cast(r.schema(outCol).dataType).as(outCol),
      lit(1).as("__src"),
      rowT.as("__row"))
    val rr = r.select(
      col("__k"), col("__ts"), col(outCol), col("__src"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rr)
      .withColumn("__asof", last(col(outCol), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(left.columns.map(c => col(s"__row.$c").as(c)).toIndexedSeq :+
        col("__asof").as(outCol): _*)
  }
}
