package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-occupancy census over a hash family's banding rows — the
  * skew tripwire VERDICT r11 item 3 institutionalizes. The sign-skew
  * bug fixed in `39b105b` passed every oracle and recall spec (LSH
  * correctness gates verify candidates EXACTLY, so a skewed family
  * still answers right — it just piles vectors into few buckets and
  * turns the candidate join quadratic: 164M candidate pairs where
  * balanced planes produce 26.7M). Occupancy is therefore a
  * PERFORMANCE invariant no result gate can see; this census makes it
  * an assertable number: max bucket occupancy and the candidate-pair
  * count Σ_b C(n_b, 2) the bucket join will materialize, comparable
  * against the uniform-hashing expectation. KernelSpec gates every
  * family (MinHash bands, SimHash blocks, SRP buckets, IVF buckets)
  * and demonstrably fails on the pre-`39b105b` plane family; the
  * scale rehearsal records the same numbers per tier so a future
  * family change shows up as a census column, not a wall-clock
  * mystery.
  */
object Census {

  /** One banding relation's occupancy summary.
    *
    * @param rows           banding rows counted (Σ occupancy)
    * @param buckets        distinct occupied buckets
    * @param maxOccupancy   largest single bucket
    * @param candidatePairs Σ_b C(n_b, 2) — the within-bucket pair count
    *                       a self-join on the bucket key generates
    */
  final case class BucketCensus(
      rows: Long, buckets: Long, maxOccupancy: Long, candidatePairs: Long) {
    def json: String =
      s"""{"rows":$rows,"buckets":$buckets,""" +
        s""""max_occupancy":$maxOccupancy,"cand_pairs":$candidatePairs}"""
  }

  /** Census of `df` bucketed by `keyCols` (one aggregate, two narrow
    * shuffles — cheap at any tier).
    */
  def of(df: DataFrame, keyCols: Seq[String]): BucketCensus = {
    val per = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
    val r = per.agg(
      sum(col("__n")).as("rows"),
      count(lit(1)).as("buckets"),
      max(col("__n")).as("maxocc"),
      // n·(n−1) stays in LONG arithmetic; halve after the sum so no
      // double rounding enters the count
      sum(col("__n") * (col("__n") - lit(1L))).as("pairs2")).head()
    BucketCensus(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3) / 2)
  }

  /** Expected candidate pairs for UNIFORM hashing: `groups`
    * independent bucket spaces (hash tables, bands, blocks), each
    * spreading `rowsPerGroup` rows over `space` buckets —
    * groups · C(rowsPerGroup, 2) / space. Only meaningful for
    * families with a fixed finite bucket space (SRP 2^bits, SimHash
    * blocks 2^16, IVF k); MinHash band keys are minima vectors whose
    * space is unbounded, so their census is compared against corpus
    * size instead.
    */
  def uniformPairs(rowsPerGroup: Long, space: Long, groups: Long): Double =
    groups.toDouble * rowsPerGroup.toDouble *
      (rowsPerGroup - 1).toDouble / 2.0 / space.toDouble
}
