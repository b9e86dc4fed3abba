package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rank a double into its quantile bucket: the number of `boundaries`
  * ≤ the value, via binary search — the per-row half of range
  * clustering ([[graft.sources.ZOrder]]). The boundary array is a
  * plan-level reference object (computed ONCE from an `approxQuantile`
  * pass, shipped with the task binary), and the probe is a primitive
  * `Arrays.binarySearch` inside whole-stage codegen — no per-row
  * allocation, no O(B) scan, arbitrary bucket counts without the
  * B-deep CASE chains a pure-Column encoding would need.
  *
  * Monotone by construction: v ≤ w ⇒ bucket(v) ≤ bucket(w), which is
  * the only property the z-value layout relies on. Output range is
  * [0, boundaries.length] — callers size `boundaries` as 2^bits − 1
  * for a bits-wide bucket id.
  */
case class BucketIndex(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "empty boundary array")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bucket expects a double input, got ${child.dataType.sql}")

  /** #boundaries ≤ v. `binarySearch` returns the match index when
    * found (count = idx + 1 — boundaries are distinct by
    * construction) and `-(insertionPoint) - 1` when not (count =
    * insertionPoint).
    */
  private def bucketOf(v: Double): Int = {
    val i = java.util.Arrays.binarySearch(boundaries, v)
    if (i >= 0) i + 1 else -i - 1
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      s"""
         |int $i = java.util.Arrays.binarySearch($arr, $v);
         |${ev.value} = ($i >= 0) ? $i + 1 : -$i - 1;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)
}

object BucketIndex {
  def apply(c: Column, boundaries: Array[Double]): Column =
    GraftColumnBridge.column(
      BucketIndex(GraftColumnBridge.expression(c), boundaries))
}
