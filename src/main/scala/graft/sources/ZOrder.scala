package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
import graft.plans.BucketIndex

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * A sort-keyed write ([[PartitionedWriter]], or `repartitionByRange`
  * before [[TxTable.create]]) gives each file a tight min/max range on
  * ONE column — predicates on anything else scan every file. The
  * reference hits exactly this wall with its single-key clustered
  * loads (`Integration/SSIS/Practice/004 CDC.md` keys everything by
  * LSN ranges; `Datamarts/Правильное построение источника данных.md`
  * sorts marts by one business key). Z-ordering interleaves the bits
  * of SEVERAL columns' quantile ranks into one sort key, so file
  * ranges stay tight on EVERY participating column at once — a filter
  * on any one of them prunes ~(files)^(1−1/d) of the layout via the
  * same commit-time footer stats [[TxTable.readWhere]] already probes.
  *
  * Mechanics (one extra pass over the input, all codegen'd):
  *  1. per dimension, ONE `approxQuantile` job computes 2^bits − 1
  *     boundary values (equi-DEPTH, so skew cannot collapse buckets
  *     the way equi-width `width_bucket` ranks would);
  *  2. per row, [[BucketIndex]] binary-searches its dimension rank;
  *  3. ranks interleave LSB-first into a long (bit b of dim d lands at
  *     position b·ndims + d) — plain shift/or Columns, whole-stage
  *     codegen'd;
  *  4. the caller range-partitions + sorts by that z-value and commits
  *     through [[TxTable]], whose footer stats then carry tight
  *     per-file bounds on every z-dimension.
  *
  * 100 TB posture: the quantile pass is a single partial-aggregated
  * job (QuantileSummaries merge — no sort, no shuffle of data rows);
  * the write itself is the same range-exchange any sorted bulk write
  * costs. Skipping claims are asserted in ZorderSpec: with a 2-d
  * z-order layout, a selective predicate on EITHER dimension alone
  * prunes at least half the files, where a linear sort on one key
  * prunes nothing on the other.
  */
object ZOrder {

  /** Max total interleaved bits: z-values stay in a positive long. */
  private val MaxTotalBits = 62

  /** The z-value column for `df` over `dims` (numeric / date /
    * timestamp), `bits` of quantile rank per dimension. Null values
    * rank 0 (nulls-first, matching the stats' null handling: a file
    * holding nulls keeps min-bounds that include its z-cell).
    */
  def zvalue(df: DataFrame, dims: Seq[Column], bits: Int = 8): Column = {
    require(dims.nonEmpty, "z-order needs at least one dimension")
    require(bits >= 1 && bits * dims.size <= MaxTotalBits,
      s"bits($bits) × dims(${dims.size}) must fit a positive long")
    val names = dims.indices.map(i => s"__z$i")
    val dimsD = dims.map(toDoubleDim(df, _))
    // one projection, one multi-column approxQuantile pass
    val proj = df.select(dimsD.zip(names).map { case (c, n) =>
      c.as(n) }: _*)
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = proj.stat.approxQuantile(names.toArray, probs, 1e-4)
    val ranks = dimsD.zip(bounds).map { case (c, bs) =>
      // distinct boundaries only — ties from low-cardinality dims just
      // mean fewer occupied buckets, never a wrong (non-monotone) rank
      val distinct = bs.distinct.sorted
      if (distinct.isEmpty) lit(0)
      else coalesce(BucketIndex(c, distinct), lit(0))
    }
    interleave(ranks, bits)
  }

  /** LSB-first bit interleave of `ranks` (each < 2^bits) into a long. */
  private def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    val terms = for {
      b <- 0 until bits
      (r, d) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(r.cast("long"), b).bitwiseAND(lit(1L)), b * n + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Dates/timestamps rank through their numeric time value (a direct
    * date→double cast is illegal in Spark); anything else must cast to
    * double — the analyzer rejects what can't.
    */
  private def toDoubleDim(df: DataFrame, c: Column): Column =
    df.select(c).schema.head.dataType match {
      case DateType => datediff(c, lit("1970-01-01")).cast("double")
      case TimestampType => unix_micros(c).cast("double")
      // NTZ: any monotone mapping ranks correctly; go through LTZ
      // micros (session tz is fixed per write)
      case TimestampNTZType => unix_micros(c.cast("timestamp")).cast("double")
      case _ => c.cast("double")
    }

  /** The z-ordered layout of `df`: range-partitioned into `numFiles`
    * by z-value, sorted within each — rows and schema untouched.
    */
  def layout(df: DataFrame, dims: Seq[Column], numFiles: Int, bits: Int): DataFrame =
    df.withColumn("__zval", zvalue(df, dims, bits))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")

  /** Z-order `df` into `numFiles` files and commit as a new
    * [[TxTable]] at `root`. Returns the committed version.
    */
  def write(
      df: DataFrame, root: String, dims: Seq[Column],
      numFiles: Int, bits: Int = 8): Long =
    TxTable.create(layout(df, dims, numFiles, bits), root)

  /** OPTIMIZE ZORDER: re-cluster an EXISTING table in place — one
    * atomic version swap under the table's optimistic-concurrency
    * contract ([[TxTable.rewriteAll]]); time travel keeps the old
    * layout until vacuum. Maintenance, not ingestion: run it when a
    * table accreted via appends no longer prunes well on its hot
    * filter columns.
    */
  def cluster(
      spark: org.apache.spark.sql.SparkSession, root: String,
      dims: Seq[Column], numFiles: Int, bits: Int = 8): Long =
    TxTable.rewriteAll(spark, root, df => layout(df, dims, numFiles, bits))
}
