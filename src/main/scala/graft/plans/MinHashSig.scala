package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a string array in one pass — a custom
  * Catalyst Expression for the dedup hot path.
  *
  * The composable form (`transform(seq(perms), p -> array_min(
  * transform(shingles, h*a+b)))`) allocates numPerms intermediate
  * arrays PER ROW and re-walks the shingle array numPerms times; this
  * kernel hashes each shingle once and keeps the numPerms running
  * minima in a single primitive array (zero transient allocation
  * beyond the output). Same affine-permutation family as
  * `Dedup.minhashSignature` (31-bit masked hash and coefficients ⇒
  * overflow-free under ANSI mode).
  *
  * CodegenFallback is deliberate: per-row work (shingles × perms) is
  * the cost, and it runs as compiled JVM loops either way; row counts
  * on the dedup path are corpus-sized, not event-sized.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // SQL-reachable (graft_minhash): mistyped input must fail analysis,
  // not ClassCastException inside an executor task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<string>, got ${other.sql}")
    }

  @transient private lazy val (as, bs) = {
    val rnd = new scala.util.Random(0x5eed)
    val a = Array.fill(numPerms)((rnd.nextInt(Int.MaxValue) | 1).toLong)
    val b = Array.fill(numPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // 31-bit hash of the shingle bytes (same mask discipline as the
      // expression form; exact hash family need not match — LSH is
      // verified against true Jaccard downstream)
      val h = (XxHashCompat.hash(s) & 0x7fffffffL)
      var p = 0
      while (p < numPerms) {
        val v2 = as(p) * h + bs(p)
        if (v2 < mins(p)) mins(p) = v2
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit hash of a UTF8String via Spark's unsafe xxhash64. */
private[plans] object XxHashCompat {
  def hash(s: UTF8String): Long =
    org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong
}

object MinHashSig {
  def apply(shingles: Column, numPerms: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(shingles), numPerms))

  /** SQL-registration form: `graft_minhash(shingles, numPerms)` with
    * the permutation count as a literal.
    */
  def expr(shingles: Expression, numPerms: Expression): MinHashSig =
    numPerms match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
        MinHashSig(shingles, v)
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
        MinHashSig(shingles, v.toInt)
      case other => throw new IllegalArgumentException(
        s"graft_minhash numPerms must be an integer literal, got $other")
    }
}
