package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** 62-bit SimHash of a text column in one pass — whitespace tokens,
  * a per-token 62-bit hash assembled from two portable 31-bit
  * [[PolyHash]] halves (`h = hA * 2^31 + hB` — nonnegative, so both
  * engines' signed-64 shifts agree), signature = sign vector of
  * per-bit vote counts (ties vote 0 → bit unset). The hash family is
  * deliberately SQL-replayable, making the SimHash pair query a full
  * oracle gate; 62 vs 64 bits costs nothing for Hamming banding (the
  * 3-of-6-block pigeonhole still covers every bit). As an Expression it
  * stays inside the DataFrame pipeline (no encoder round-trip per
  * row) and composes with any projection. CodegenFallback is fine
  * here for the same reason as [[MinHashSig]]: the per-row token loop
  * dominates.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  /** Signature bit width (bits 0..61 may be set). */
  val Bits = 62

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash expects string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val votes = new Array[Int](Bits)
    toks.foreach { t =>
      val hA = PolyHash.hash(t, PolyHash.MultA) // [0, 2^31-1)
      val hB = PolyHash.hash(t, PolyHash.MultB)
      val h = (hA << 31) | hB // < 2^62, nonnegative
      var b = 0
      while (b < Bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(text: Column): Column =
    GraftColumnBridge.column(SimHashSig(GraftColumnBridge.expression(text)))
}
