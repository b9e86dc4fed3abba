package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) aggregate over strings — Apache
  * DataSketches `ItemsSketch` wrapped as a Catalyst
  * `TypedImperativeAggregate`, the same machinery Spark's own sketch
  * aggregates use: the live sketch object rides the aggregation
  * buffer and is (de)serialized ONLY at shuffle boundaries, so
  * per-row update cost is a hash-map touch, not a byte-array rebuild.
  *
  * Why this exists (SURVEY A9 at corpus scale): an exact token
  * frequency `groupBy` shuffles the FULL dictionary — fine for a
  * bounded vocabulary, quadratic pain for open web text where the
  * dictionary is ~corpus-sized. This sketch caps state at
  * `maxMapSize` entries per partial, merges associatively (map-side
  * combine applies), and reports every item of frequency >
  * n/maxMapSize with deterministic error bounds: `estimate` is within
  * [lower, upper] ALWAYS, and when the distinct count stays under
  * ~0.75·maxMapSize the sketch never purges, bounds collapse, and
  * counts are EXACT — the regime the q_freq_tokens oracle pins.
  *
  * Output: array<struct<item, estimate, lower, upper>> in the
  * sketch's NO_FALSE_NEGATIVES order (descending estimate) — callers
  * explode and re-sort for a deterministic top-k.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two ≥ 8, got $maxMapSize")

  // the serDe is stateless but not java-serializable — rebuild per task
  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, false),
    StructField("estimate", LongType, false),
    StructField("lower", LongType, false),
    StructField("upper", LongType, false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_freq_items expects a string input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: ItemsSketch[String]): Any = FreqItemsAgg.report(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_freq_items"
}

object FreqItemsAgg {
  /** Column-API entry point. */
  def apply(c: Column, maxMapSize: Int): Column =
    GraftColumnBridge.column(
      FreqItemsAgg(GraftColumnBridge.expression(c), maxMapSize)
        .toAggregateExpression())

  /** The report schema shared by [[FreqItemsAgg]] and [[FreqTopK]]. */
  private[functions] val reportType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, false),
    StructField("estimate", LongType, false),
    StructField("lower", LongType, false),
    StructField("upper", LongType, false))), containsNull = false)

  private[functions] def report(buf: ItemsSketch[String]): GenericArrayData = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.map { r =>
      InternalRow(
        UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.asInstanceOf[Array[Any]])
  }
}

/** State-output half of the frequent-items MV contract: same fold as
  * [[FreqItemsAgg]], but the result is the serialized sketch itself —
  * storable per key, mergeable later by [[FreqUnionAgg]], finalized by
  * [[FreqTopK]]. Mirrors the hll_sketch_agg / hll_union_agg /
  * hll_sketch_estimate triple.
  */
case class FreqStateAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two ≥ 8, got $maxMapSize")

  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_freq_state expects a string input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] = {
    b1.merge(b2); b1
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqStateAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqStateAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqStateAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_freq_state"
}

object FreqStateAgg {
  def apply(c: Column, maxMapSize: Int): Column =
    GraftColumnBridge.column(
      FreqStateAgg(GraftColumnBridge.expression(c), maxMapSize)
        .toAggregateExpression())
}

/** Union of serialized frequent-items states (the Merge() half):
  * ItemsSketch.merge is associative and order-insensitive in its
  * guarantees, so MV maintenance keeps the same error contract as a
  * single pass.
  */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two ≥ 8, got $maxMapSize")

  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_freq_union expects binary state, got ${other.sql}")
    }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serDe))
    buf
  }

  override def merge(
      b1: ItemsSketch[String], b2: ItemsSketch[String]): ItemsSketch[String] = {
    b1.merge(b2); b1
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serDe)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqUnionAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_freq_union"
}

object FreqUnionAgg {
  def apply(c: Column, maxMapSize: Int): Column =
    GraftColumnBridge.column(
      FreqUnionAgg(GraftColumnBridge.expression(c), maxMapSize)
        .toAggregateExpression())
}

/** Finalize a stored frequent-items state to its report — a scalar
  * projection (one state per key reaches it, so the eval-only path is
  * never hot).
  */
case class FreqTopK(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def dataType: DataType = FreqItemsAgg.reportType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_freq_topk expects binary state, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    FreqItemsAgg.report(ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), serDe))

  override protected def withNewChildInternal(newChild: Expression): FreqTopK =
    copy(child = newChild)

  override def prettyName: String = "graft_freq_topk"
}

object FreqTopK {
  def apply(c: Column): Column =
    GraftColumnBridge.column(FreqTopK(GraftColumnBridge.expression(c)))
}
