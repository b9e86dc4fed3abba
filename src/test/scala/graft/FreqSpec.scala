package graft

import org.apache.spark.sql.functions._
import graft.functions.FreqItemsAgg

/** Frequent-items sketch: exactness below the purge threshold, honest
  * bounds and no-false-negatives above it, merge/layout independence.
  */
class FreqSpec extends SparkSpec {
  import spark.implicits._

  private def freq(df: org.apache.spark.sql.DataFrame, c: String, size: Int) =
    df.agg(FreqItemsAgg(col(c), size).as("fi"))
      .select(explode(col("fi")).as("f"))
      .select(col("f.item"), col("f.estimate"), col("f.lower"), col("f.upper"))
      .as[(String, Long, Long, Long)].collect()

  test("exact regime: estimates equal true counts, bounds collapse") {
    // 40 distinct items, zipf-ish counts, well under 0.75·1024
    val df = spark.range(10000)
      .select(concat(lit("w"), (col("id") % 40)).as("w"))
    val got = freq(df, "w", 1024).map(r => r._1 -> r._2).toMap
    val exact = df.groupBy("w").count()
      .as[(String, Long)].collect().toMap
    assert(got == exact)
    assert(freq(df, "w", 1024).forall(r => r._3 == r._2 && r._2 == r._4))
  }

  test("purge regime: heavy hitter survives with honest bounds") {
    // one item at 50%, 1000 background singletons, map of only 16
    val heavy = spark.range(2000).select(lit("HOT").as("w"))
    val noise = spark.range(2000)
      .select(concat(lit("bg"), col("id")).as("w"))
    val rows = freq(heavy.unionAll(noise), "w", 16)
    val hot = rows.find(_._1 == "HOT")
    assert(hot.isDefined, s"heavy hitter purged: ${rows.take(5).mkString(",")}")
    val (_, est, lo, hi) = hot.get
    assert(lo <= 2000 && 2000 <= hi, s"true count outside bounds [$lo,$hi]")
    assert(est >= lo && est <= hi)
  }

  test("result is layout-independent in the exact regime") {
    val df = spark.range(5000)
      .select(concat(lit("t"), (col("id") % 25)).as("w"))
    val a = freq(df, "w", 256).toSet
    val b = freq(df.repartition(13), "w", 256).toSet
    assert(a == b)
  }

  test("state/union/topk MV trio equals the direct aggregate") {
    import graft.functions.{FreqStateAgg, FreqTopK, FreqUnionAgg}
    val df = spark.range(6000).select(
      (col("id") % 3).cast("string").as("k"),
      concat(lit("w"), (col("id") % 30)).as("w"))
    // per-key batch states (split by parity), unioned, finalized
    def state(f: org.apache.spark.sql.Column) =
      df.filter(f).groupBy("k").agg(FreqStateAgg(col("w"), 256).as("st"))
    val mv = state(col("id") % 2 === 0).unionByName(state(col("id") % 2 === 1))
      .groupBy("k").agg(FreqUnionAgg(col("st"), 256).as("st"))
    val folded = mv.select(col("k"), explode(FreqTopK(col("st"))).as("f"))
      .select(col("k"), col("f.item"), col("f.estimate"))
      .as[(String, String, Long)].collect().toSet
    val direct = df.groupBy("k").agg(FreqItemsAgg(col("w"), 256).as("fi"))
      .select(col("k"), explode(col("fi")).as("f"))
      .select(col("k"), col("f.item"), col("f.estimate"))
      .as[(String, String, Long)].collect().toSet
    assert(folded == direct)
    // and both match exact counts in the exact regime
    val exact = df.groupBy("k", "w").count()
      .as[(String, String, Long)].collect().toSet
    assert(folded == exact)
  }

  test("nulls are ignored, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("w")
    val got = freq(df, "w", 64).map(r => r._1 -> r._2).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
