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
  * beyond the output). The shingle hash is the portable [[PolyHash]]
  * and the permutations are affine maps with 31-bit coefficients
  * drawn from a fixed seed, so every signature value fits in 62 bits
  * — overflow-free under ANSI mode AND bit-replayable by the DuckDB
  * oracle (the seed stream is inlined as literals in the oracle SQL).
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
      // PORTABLE 31-bit hash of the shingle (see [[PolyHash]]): chosen
      // over a byte-level murmur so the whole signature computation —
      // hash, affine permutations, per-perm minima — replays
      // bit-for-bit in ANSI SQL, making the LSH query oracle-gateable
      // instead of merely recall-spec'd
      val h = PolyHash.hash(s, PolyHash.MultA)
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

/** Portable 31-bit polynomial hash over Unicode CODE POINTS —
  * `h_0 = 7; h_{i+1} = (h_i * mult + codepoint_i) mod (2^31 - 1)` —
  * deliberately replayable in ANSI SQL (DuckDB:
  * `list_reduce(list_prepend(7, list_transform(string_split(s, ''),
  * c -> unicode(c))), (a, b) -> (a*mult + b) % 2147483647)`), so the
  * LSH signature queries built on it are full oracle gates rather
  * than recall-only specs. Code points (not UTF-8 bytes or UTF-16
  * units) are the one string decomposition both engines expose
  * identically. Outputs lie in [0, 2^31-1); an affine map
  * `a*h + b` with 31-bit coefficients then stays under 2^62 —
  * overflow-free in the signed-64 arithmetic of BOTH engines.
  */
private[graft] object PolyHash {
  final val Mod = 2147483647L // 2^31 − 1, prime
  /** Primary multiplier (shingle hash, SimHash high half). */
  final val MultA = 1000003L
  /** Secondary multiplier (SimHash low half). */
  final val MultB = 131L

  def hash(s: UTF8String, mult: Long): Long = hash(s.toString, mult)

  def hash(str: String, mult: Long): Long = {
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
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
