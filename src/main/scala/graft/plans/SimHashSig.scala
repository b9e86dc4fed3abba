package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** 64-bit SimHash of a text column in one pass — whitespace tokens,
  * JVM-stable seed-fixed MurmurHash3 per token, signature = sign
  * vector of per-bit vote counts. Replaces the Dataset.map form: same
  * arithmetic, but as an Expression it stays inside the DataFrame
  * pipeline (no encoder round-trip per row) and composes with any
  * projection. CodegenFallback is fine here for the same reason as
  * [[MinHashSig]]: the per-row token loop dominates.
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

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
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xffffffffL
      val h2 = MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL
      val h = (h1 << 32) | h2
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(text: Column): Column =
    GraftColumnBridge.column(SimHashSig(GraftColumnBridge.expression(text)))
}
