package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom semijoin reduction: result equality with the plain join,
  * actual row reduction at the probe, the no-false-negative guarantee,
  * and the plan property (probe filter below the exchange).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_returnflag"))
  private lazy val dim = Tables.orders(spark, sf)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select(col("o_orderkey"))

  test("bloom join ≡ plain join") {
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bloomed = BloomJoin.join(fact, dim, col("l_orderkey"), col("o_orderkey"))
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloomed === plain)
  }

  test("probe keeps every true match and drops most non-matches") {
    val total = fact.count()
    val matched = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val blob = BloomJoin.buildFilter(dim, col("o_orderkey"), fpp = 0.01)
    val kept = BloomJoin.probe(fact, col("l_orderkey"), blob).count()
    // no false negatives: everything that joins survives the probe
    assert(kept >= matched, s"kept=$kept < matched=$matched")
    // real reduction: non-matching keys pass only at ~fpp; allow a
    // generous 10x slack over the target 1% before calling it broken
    val nonMatch = total - matched
    assert(kept - matched <= math.max(50L, (nonMatch * 0.10).toLong),
      s"kept=$kept matched=$matched total=$total — probe is not selective")
  }

  test("semi reduction equals IN-filter semantics") {
    val expected = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(BloomJoin.semi(fact, dim, col("l_orderkey"), col("o_orderkey"))
      .count() === expected)
  }

  test("empty dimension short-circuits to an empty result") {
    val blob = BloomJoin.buildFilter(dim.limit(0), col("o_orderkey"))
    assert(blob.isEmpty)
    assert(BloomJoin.probe(fact, col("l_orderkey"), blob).count() === 0L)
    assert(BloomJoin.join(fact, dim.limit(0),
      col("l_orderkey"), col("o_orderkey")).count() === 0L)
  }

  test("string and composite keys probe through the same hash scheme") {
    val d = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val f = Seq(("a", 1L), ("a", 9L), ("x", 1L), ("b", 2L))
      .toDF("k", "v")
    // composite key: struct(k, v) — hashes as one xxhash64
    val blob = BloomJoin.buildFilter(d, struct(col("k"), col("v")))
    val kept = BloomJoin.probe(f, struct(col("k"), col("v")), blob)
      .as[(String, Long)].collect().toSet
    assert(kept.contains(("a", 1L)) && kept.contains(("b", 2L)))
    assert(!kept.contains(("x", 1L)) || kept.size <= 3) // fp allowed, fn not
  }

  test("probe filter sits below any exchange (scan-side reduction)") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = BloomJoin.join(fact, dim, col("l_orderkey"), col("o_orderkey"))
    // AdaptiveSparkPlanExec is a leaf to collect(); unwrap its input
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val probes = root.collect {
      case fe: FilterExec if fe.condition.toString.contains("might_contain") => fe
    }
    assert(probes.nonEmpty, df.queryExecution.executedPlan.toString)
    // nothing shuffles beneath the probe — the reduction happens at the scan
    assert(probes.forall(_.collect {
      case e: ShuffleExchangeExec => e }.isEmpty))
  }
}
