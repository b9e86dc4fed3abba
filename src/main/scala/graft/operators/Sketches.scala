package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch states: distinct counts and set overlap that
  * maintain incrementally — the sketch-typed extension of the
  * [[IncrementalAgg]] State/Merge MV contract (reference shape:
  * `Datamarts/Правильное построение витрины с множественными
  * агрегациями.md` keeps `uniqState` partials in the MV and finalizes
  * with `uniqMerge` at serve time).
  *
  * Why sketches are the 100 TB answer: an exact per-key
  * `count(DISTINCT user)` over history must shuffle every (key, user)
  * pair of every batch forever; an HLL state is a FIXED-SIZE byte
  * blob per key that absorbs each new batch with a union — the MV
  * never re-touches history, and a year of batches costs the same
  * per-merge as day one. Spark 4 ships Apache DataSketches natively
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
  * `theta_*`), all codegen-planned aggregates with map-side combine.
  *
  * The load-bearing property (asserted in SketchSpec, REQUIREd by
  * q_sketch_mv): the fold is DETERMINISTIC and fold-order-independent,
  * and tracks a single sketch over the full input — exactly equal in
  * the sketch's exact (coupon) range, within the standard HLL error
  * bound beyond it (~1.04/√2^lgK rsd; lgK 12 ⇒ ~1.6%). Estimates are
  * not bitwise path-independent in the dense regime: union partials
  * densify differently than one straight-line sketch, a documented
  * property of the HLL family, not a defect of the fold.
  *
  * Theta sketches add set ALGEBRA (intersection/difference), used
  * here for corpus-overlap estimation: "how contaminated is this
  * corpus against that benchmark" as two linear scans + a constant-
  * size intersection, no join of the corpora anywhere.
  */
object Sketches {

  /** Per-key HLL distinct state: keys ++ (n, hll). The batch-level
    * State() half of the MV.
    */
  def distinctState(
      df: DataFrame, keys: Seq[String], value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Merge a batch's states into the MV (Merge(State ⊕ State)): one
    * shuffle of MV-rows + batch-rows, one row per key out.
    */
  def mergeDistinct(mv: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    mv.unionByName(batch)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        // allowDifferentLgConfigK: a re-tuned lgK must not strand the MV
        hll_union_agg(col("hll"), lit(true)).as("hll"))

  /** Finalize to serving values: keys ++ (n, approx_distinct). */
  def estimateDistinct(mv: DataFrame, keys: Seq[String]): DataFrame =
    mv.select(keys.map(col) ++ Seq(
      col("n"),
      hll_sketch_estimate(col("hll")).as("approx_distinct")): _*)

  /** Estimated (|A|, |B|, |A∩B|, |A\B|) of two columns' distinct sets
    * via theta sketches: each side is ONE linear partial-aggregated
    * scan to a constant-size blob; the algebra happens on two blobs.
    * The decontamination-planning probe at corpus scale — run it
    * before deciding whether an exact [[Dedup.jaccardAgainstPairs]]
    * pass is worth scheduling.
    */
  def overlap(a: DataFrame, aCol: Column, b: DataFrame, bCol: Column): DataFrame = {
    val sa = a.agg(theta_sketch_agg(aCol).as("s")).select(col("s"), lit(1).as("j"))
    val sb = b.agg(theta_sketch_agg(bCol).as("s")).select(col("s"), lit(1).as("j"))
    sa.as("l").join(sb.as("r"), col("l.j") === col("r.j"))
      .select(
        // estimates surface as double: the sketch's native domain is
        // a real-valued estimator even though small sets land integral
        theta_sketch_estimate(col("l.s")).cast("double").as("distinct_a"),
        theta_sketch_estimate(col("r.s")).cast("double").as("distinct_b"),
        theta_sketch_estimate(theta_intersection(col("l.s"), col("r.s")))
          .cast("double").as("overlap"),
        theta_sketch_estimate(theta_difference(col("l.s"), col("r.s")))
          .cast("double").as("only_a"))
  }
}
