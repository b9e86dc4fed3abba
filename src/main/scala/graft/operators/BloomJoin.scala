package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semijoin reduction — cut the big side of a shuffle
  * join down to (near-)matching rows BEFORE the exchange.
  *
  * The reference leans on lookup caches and key-set reduction for its
  * big joins (the lookup/merge-join guidance in `Integration/SSIS/
  * Professional…/Глава 07: Соединение данных (Joining Data).md` and
  * the "filter at the source before the data flow" advice of
  * `Глава 12: Использование реляционного движка.md`); Spark's own
  * optimizer only
  * injects a runtime bloom filter when BOTH sides are visible to one
  * query AND the creation side is under
  * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`.
  * This operator makes the same reduction an explicit, tunable step
  * for the cases the optimizer won't touch: a dimension that is too
  * big to broadcast but whose KEY SET still fits a few megabytes of
  * bloom bits, probed against a fact side that is orders of magnitude
  * larger.
  *
  * 100 TB posture: the filter blob is built with ONE partial-aggregated
  * pass over the dimension keys (merge = bitwise OR of fixed-size bit
  * arrays, so the map-side combine sends one blob per partition, not
  * one row per key), ships to executors as a plan literal exactly like
  * Spark's injected runtime filters, and is probed inside whole-stage
  * codegen (`BloomFilterMightContain` has `doGenCode`) BELOW the fact
  * side's exchange — shuffle volume drops by the join's selectivity at
  * a false-positive cost bounded by `fpp`. Correctness is unaffected:
  * the real join still runs on the survivors, so false positives are
  * dropped there and false negatives cannot exist (a bloom filter
  * never reports an inserted key absent).
  *
  * Hashing: both sides go through `xxhash64` (64-bit, seed 42), the
  * same scheme Spark's `InjectRuntimeFilter` uses — the blob stores
  * hashes, never key bytes, so a composite or string key costs the
  * same 8 bytes per probe.
  */
object BloomJoin {

  /** Bits for a target false-positive rate: the classic
    * `-n·ln(p)/ln²2` optimum, clamped to [64 bits, maxBits].
    */
  private def optimalNumBits(n: Long, fpp: Double, maxBits: Long): Long = {
    val raw = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.min(maxBits, math.max(64L, raw))
  }

  private def xxh(c: Column): Column =
    GraftColumnBridge.column(
      new XxHash64(Seq(GraftColumnBridge.expression(c)), 42L))

  /** Build the serialized bloom blob over `dim`'s join key. One
    * aggregate job; the single-row result (≤ `maxBits/8` bytes,
    * default 16 MB) is the only thing that reaches the driver.
    */
  def buildFilter(
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.03,
      maxBits: Long = 1L << 27): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // an explicit expectedItems skips the counting pass; the fallback
    // count is a metadata-cheap aggregate over the (pruned) key column
    val n = expectedItems.getOrElse(dim.select(dimKey).na.drop().count())
    val items = math.max(1L, n)
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxh(dimKey)),
      Literal(items),
      Literal(optimalNumBits(items, fpp, maxBits))).toAggregateExpression()
    val row = dim.select(GraftColumnBridge.column(agg).as("bf")).head()
    // an empty dimension yields a NULL blob — callers treat that as
    // "nothing can match" rather than probing a null literal
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Filter `fact` to rows whose key MIGHT be in the blob. Plans as a
    * codegen'd scan-side filter — no shuffle, no extra job.
    */
  def probe(fact: DataFrame, factKey: Column, blob: Array[Byte]): DataFrame = {
    if (blob.isEmpty) return fact.limit(0)
    val might = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(blob, BinaryType),
      GraftColumnBridge.expression(xxh(factKey))))
    fact.filter(might)
  }

  /** Bloom-reduced inner equi-join: semantically identical to
    * `fact.join(dim, factKey === dimKey)` (oracle-gated by
    * q_bloom_join), but the fact side entering the join exchange is
    * already reduced to ~selectivity·(1+fpp) of its rows.
    *
    * Inner/semi only by construction: an outer join must keep
    * non-matching fact rows, which is exactly what the probe removes.
    */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.03): DataFrame = {
    val blob = buildFilter(dim, dimKey, expectedItems, fpp)
    probe(fact, factKey, blob).join(dim, factKey === dimKey)
  }

  /** Bloom-reduced left-semi join — `fact WHERE key IN (dim keys)`
    * with the same scan-side reduction.
    */
  def semi(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      expectedItems: Option[Long] = None,
      fpp: Double = 0.03): DataFrame = {
    val blob = buildFilter(dim, dimKey, expectedItems, fpp)
    probe(fact, factKey, blob)
      .join(dim, factKey === dimKey, "left_semi")
  }
}
