package graft

import org.apache.spark.sql.functions._
import graft.operators.Mix

/** Domain-weighted mixing: realized per-domain counts, determinism
  * under re-layout, the small-domain clamp, and the map-side
  * WindowGroupLimit plan property.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("realized mixture hits min(n, round(w·budget)) per domain") {
    val weights = Map("en" -> 0.6, "de" -> 0.4)
    val ks = Mix.targets(docs, col("lang"), weights, budget = 50L)
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ks("en") == math.min(counts("en"), 30L))
    assert(ks("de") == math.min(counts("de"), 20L))
    val got = Mix.sample(docs, col("lang"), col("doc_id"), weights, 50L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ks)
  }

  test("selection is deterministic and layout-independent") {
    val weights = Map("en" -> 0.5, "fr" -> 0.5)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Mix.sample(df, col("lang"), col("doc_id"), weights, 40L)
        .select("doc_id").as[Long].collect().toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("n_chars")))
    assert(a == b && a.size == 40)
  }

  test("unweighted domains are excluded; undersized domains clamp") {
    val tiny = Seq(
      ("en", 1L), ("en", 2L), ("en", 3L), ("xx", 4L), ("yy", 5L))
      .toDF("lang", "doc_id")
    // en target 10 > n=3 → clamp to 3; xx unweighted → dropped
    val got = Mix.sample(tiny, col("lang"), col("doc_id"),
      Map("en" -> 1.0, "yy" -> 0.0), budget = 10L)
    assert(got.select("lang").as[String].collect().toSet == Set("en"))
    assert(got.count() == 3L)
  }

  test("budget larger than every weighted domain returns them whole") {
    val ks = Mix.targets(docs, col("lang"),
      Map("zh" -> 1.0), budget = 1000000L)
    val zhAll = docs.filter(col("lang") === "zh").count()
    assert(ks("zh") == zhAll)
  }

  test("rank filter plans as a WindowGroupLimit (map-side prune)") {
    val df = Mix.sample(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.5, "de" -> 0.5), 40L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
