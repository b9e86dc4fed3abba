package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch states beyond the exact range: merge ≡ single-shot at equal
  * lgK, fold-order independence, HLL accuracy bounds, and theta
  * overlap accuracy on sets far above the gate query's cardinality.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** 200k rows, key = id % 4 → 50k distinct values per key (id), well
    * past HLL's exact coupon range.
    */
  private lazy val big = spark.range(200000).select(
    (col("id") % 4).cast("string").as("k"),
    col("id").as("v"))

  private def estimates(mv: org.apache.spark.sql.DataFrame): Map[String, Long] =
    Sketches.estimateDistinct(mv, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("incremental fold is deterministic and tracks single-shot within the band") {
    val keys = Seq("k")
    def st(f: org.apache.spark.sql.Column) =
      Sketches.distinctState(big.filter(f), keys, col("v"))
    def fold() = Sketches.mergeDistinct(
      Sketches.mergeDistinct(
        st(col("v") % 3 === 0), st(col("v") % 3 === 1), keys),
      st(col("v") % 3 === 2), keys)
    val folded = estimates(fold())
    // deterministic: the same fold twice yields identical estimates
    assert(folded == estimates(fold()))
    // and tracks a single sketch over everything within ~3 rsd (the
    // two paths densify differently beyond the exact range, so the
    // guarantee is the error band, not bitwise equality)
    val single = estimates(Sketches.distinctState(big, keys, col("v")))
    for ((k, s) <- single)
      assert(math.abs(folded(k) - s) <= s * 0.05, s"key $k: ${folded(k)} vs $s")
  }

  test("fold order does not change the merged estimate") {
    val keys = Seq("k")
    def st(f: org.apache.spark.sql.Column) =
      Sketches.distinctState(big.filter(f), keys, col("v"))
    val a = st(col("v") % 3 === 0); val b = st(col("v") % 3 === 1)
    val c = st(col("v") % 3 === 2)
    val ab_c = Sketches.mergeDistinct(Sketches.mergeDistinct(a, b, keys), c, keys)
    val c_ba = Sketches.mergeDistinct(c, Sketches.mergeDistinct(b, a, keys), keys)
    assert(estimates(ab_c) == estimates(c_ba))
  }

  test("HLL estimate lands within the lgK error bound of exact") {
    val exact = big.groupBy("k").agg(countDistinct(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(Sketches.distinctState(big, Seq("k"), col("v")))
    // lgK 12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.6%; assert a 3-sigma 5% band
    for ((k, d) <- exact) {
      val e = est(k).toDouble
      assert(math.abs(e - d) / d < 0.05, s"key $k: est $e vs exact $d")
    }
  }

  test("counts stay exact while distincts are sketched") {
    val mv = Sketches.distinctState(big, Seq("k"), col("v"))
    val n = Sketches.estimateDistinct(mv, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n.values.toSeq == Seq.fill(4)(50000L))
  }

  test("theta overlap estimates set algebra within 5% above exact range") {
    // A = [0, 60k), B = [40k, 100k) → |A∩B| = 20k, |A\B| = 40k
    val a = spark.range(0, 60000).select(col("id"))
    val b = spark.range(40000, 100000).select(col("id"))
    val r = Sketches.overlap(a, col("id"), b, col("id")).head()
    def close(got: Double, want: Double) =
      math.abs(got - want) / want < 0.05
    assert(close(r.getDouble(0), 60000), s"distinct_a=${r.getDouble(0)}")
    assert(close(r.getDouble(1), 60000), s"distinct_b=${r.getDouble(1)}")
    assert(close(r.getDouble(2), 20000), s"overlap=${r.getDouble(2)}")
    assert(close(r.getDouble(3), 40000), s"only_a=${r.getDouble(3)}")
  }

  test("sketch state is a fixed-size blob, not a value list") {
    val mv = Sketches.distinctState(big, Seq("k"), col("v"))
    val sizes = mv.select(length(col("hll"))).as[Int].collect()
    // lgK 12 HLL_4: ~2 KB dense — orders of magnitude under the 50k
    // longs (400 KB) an exact per-key set would hold
    assert(sizes.forall(_ < 16384), sizes.mkString(","))
  }
}
