package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distribution drift monitoring: fixed-bin histogram STATES (exact,
  * deterministic, mergeable — the property sketch-based quantile
  * states give up to randomized compaction) and the PSI (population
  * stability index) metric between two states.
  *
  * The pipeline problem this solves: "did this week's corpus shift
  * against the reference snapshot?" asked per column, per domain,
  * continuously. The reference monitors loads with row-count audits
  * (`Integration/SSIS/Practice/007 Vizualizer.md:89-100`); counts
  * catch missing data but not a silent distribution shift (a source
  * that starts emitting cents instead of dollars has the same row
  * count). PSI over value histograms is the standard drift alarm.
  *
  * Design for 100 TB and for the MV contract ([[IncrementalAgg]],
  * [[Sketches]]): a histogram state is `array<long>` of bins+2 counts
  * (underflow | bins | overflow), built by [[HistAgg]] in one
  * partial-aggregated linear pass (fixed-size state per key — same
  * merge posture as the HLL MV), unioned across batches/snapshots by
  * [[HistUnionAgg]] (vector add — associative, commutative, EXACT).
  * The PSI between two states is pure column arithmetic over the two
  * arrays ([[Drift.psi]]): +1-smoothed bucket fractions, index-ordered
  * fold — deterministic to the bit, which is what lets a DuckDB
  * oracle replay it (q_drift_psi).
  *
  * Interpretation convention (industry folklore, documented not
  * enforced): PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
  * investigate.
  */
object Drift {

  /** keys ++ (n, hist) — the State() half of a drift MV. */
  def histState(
      df: DataFrame, keys: Seq[String], value: Column,
      lo: Double, hi: Double, bins: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(value).as("n"),
        HistAgg(value, lo, hi, bins).as("hist"))

  /** Merge batch states into the MV (vector add per key). */
  def mergeHist(mv: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    mv.unionByName(batch)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        HistUnionAgg(col("hist")).as("hist"))

  /** Drift report between two VERSIONS of a [[graft.sources.TxTable]]
    * — time travel supplies the reference snapshot, so "this week vs
    * the accepted corpus" needs no copy of last week's data: two
    * linear scans (each version reads only its own manifest's files)
    * into fixed-size states, then per-key PSI. Output: keys ++
    * (n_a, n_b, psi), one row per key present in BOTH versions.
    */
  def betweenVersions(
      spark: org.apache.spark.sql.SparkSession, root: String,
      vA: Long, vB: Long,
      keys: Seq[String], value: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    import graft.sources.TxTable
    def st(v: Long, suffix: String) =
      histState(TxTable.readVersion(spark, root, v), keys, value, lo, hi, bins)
        .withColumnsRenamed(Map("n" -> s"n_$suffix", "hist" -> s"h_$suffix"))
    val a = st(vA, "a")
    val b = st(vB, "b")
    a.join(b, keys, "inner")
      .select(keys.map(col) ++ Seq(
        col("n_a"), col("n_b"),
        psi(col("h_a"), col("h_b")).as("psi")): _*)
  }

  /** Quantile estimates from a histogram STATE: linear interpolation
    * within the covering bin — deterministic (same state ⇒ same
    * numbers, unlike KLL/t-digest whose compaction is randomized) and
    * as mergeable as the state itself, with error bounded by one bin
    * width. The MV-quantile answer: store one `array<long>` per key,
    * read p50/p95/p99 at serve time from any fold of any batches.
    *
    * Sentinel counts (underflow/overflow) participate in rank
    * arithmetic but clamp to [lo, hi] — a q inside a sentinel bucket
    * has no finite interpolation anchor, so the domain edge is the
    * honest answer. Empty states yield nulls.
    */
  def quantiles(
      hist: Column, probs: Seq[Double],
      lo: Double, hi: Double): Column = {
    require(probs.forall(p => p >= 0 && p <= 1), s"probs must be in [0,1]")
    val total = aggregate(hist, lit(0L), _ + _)
    val arr = probs.map { p =>
      val target = lit(p) * total.cast("double")
      // rank-walk via an index fold: find the first bin whose running
      // count reaches the target, interpolate inside it
      val bins = size(hist) - 2
      val w = (lit(hi) - lit(lo)) / bins.cast("double")
      // struct fold: (remaining, found, value)
      val folded = aggregate(
        zip_with(hist, sequence(lit(0), size(hist) - 1), (c, i) => struct(
          c.cast("double").as("c"), i.as("i"))),
        struct(target.as("rem"), lit(false).as("found"), lit(0.0).as("v")),
        (acc, e) => {
          val c = e.getField("c"); val i = e.getField("i")
          val hit = !acc.getField("found") && (acc.getField("rem") <= c) && (c > 0.0)
          val frac = when(c > 0.0, acc.getField("rem") / c).otherwise(lit(0.0))
          // bin i covers [lo+(i-1)·w, lo+i·w); i==0 under, i==bins+1 over
          val binLo = lit(lo) + (i.cast("double") - 1.0) * w
          val v = when(i === 0, lit(lo))
            .when(i === size(hist) - 1, lit(hi))
            .otherwise(least(greatest(binLo + frac * w, lit(lo)), lit(hi)))
          struct(
            (acc.getField("rem") - c).as("rem"),
            (acc.getField("found") || hit).as("found"),
            when(hit, v).otherwise(acc.getField("v")).as("v"))
        })
      when(total > 0, folded.getField("v")).otherwise(lit(null))
    }
    array(arr: _*)
  }

  /** PSI between two histogram-state COLUMNS (equal bin config):
    * Σ_i (p_i − q_i)·ln(p_i/q_i) over +1-smoothed bucket fractions
    * p_i = (cnt_i + 1)/(n + B). Laplace smoothing keeps empty buckets
    * finite and the whole computation rational-in/deterministic-out;
    * the fold runs in bucket-index order (`aggregate` over the
    * zipped array), so the result is bit-stable and oracle-replayable.
    */
  def psi(p: Column, q: Column): Column = {
    def tot(h: Column): Column =
      aggregate(h, lit(0L), (acc, x) => acc + x).cast("double") + size(h)
    val np = tot(p); val nq = tot(q)
    val terms = zip_with(p, q, (cp, cq) => {
      val fp = (cp.cast("double") + 1.0) / np
      val fq = (cq.cast("double") + 1.0) / nq
      (fp - fq) * log(fp / fq)
    })
    aggregate(terms, lit(0.0), (acc, x) => acc + x)
  }
}

/** Exact fixed-bin histogram aggregate: `array<long>` of bins+2
  * counts — [underflow, b_0 … b_{bins-1}, overflow]; bin i covers
  * [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/bins, upper edge
  * inclusive into the last bin. Nulls and NaNs are ignored (they are
  * absence of signal, not a bucket).
  */
case class HistAgg(
    child: Expression,
    lo: Double, hi: Double, bins: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bins >= 1 && hi > lo, s"need hi > lo and bins ≥ 1, got [$lo,$hi)×$bins")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hist expects a numeric input, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: java.lang.Number => x.doubleValue()
        case x: Decimal => x.toDouble
      }
      if (!d.isNaN) {
        val idx =
          if (d < lo) 0
          else if (d > hi) bins + 1
          else if (d == hi) bins // upper edge closes the last bin
          else 1 + ((d - lo) / ((hi - lo) / bins)).toInt.min(bins - 1)
        buf(idx) += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): HistAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HistAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hist"
}

object HistAgg {
  def apply(c: Column, lo: Double, hi: Double, bins: Int): Column =
    GraftColumnBridge.column(
      HistAgg(GraftColumnBridge.expression(c), lo, hi, bins)
        .toAggregateExpression())
}

/** Vector-add union of histogram states (equal lengths enforced) —
  * the Merge() half of the drift MV.
  */
case class HistUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hist_union expects array<bigint>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData].toLongArray()
    if (buf.isEmpty) arr.clone()
    else {
      require(buf.length == arr.length,
        s"histogram bin-config mismatch: ${buf.length} vs ${arr.length}")
      var i = 0
      while (i < buf.length) { buf(i) += arr(i); i += 1 }
      buf
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    require(b1.length == b2.length,
      s"histogram bin-config mismatch: ${b1.length} vs ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): HistUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HistUnionAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_hist_union"
}

object HistUnionAgg {
  def apply(c: Column): Column =
    GraftColumnBridge.column(
      HistUnionAgg(GraftColumnBridge.expression(c)).toAggregateExpression())
}
