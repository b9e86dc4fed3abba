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

  test("tokenBudget: greedy fill by md5 rank, crossing doc kept, zeros out") {
    val df = Seq(
      (1L, "en", 5L), (2L, "en", 7L), (3L, "en", 9L), (4L, "en", 0L),
      (10L, "fr", 100L), (11L, "de", 4L))
      .toDF("id", "lang", "n")
    val got = Mix.tokenBudget(df, col("lang"), col("id"), col("n"),
        Map("en" -> 0.5, "fr" -> 0.5), totalTokens = 20L) // 10 tokens each
      .select("id").as[Long].collect().toSet
    assert(got.contains(10L), "crossing doc (100 > budget 10) still kept")
    assert(!got.contains(11L), "unweighted domain excluded")
    assert(!got.contains(4L), "zero-token doc excluded")
    // replay the greedy fill for en driver-side in md5 order
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val enOrder = Seq(1L -> 5L, 2L -> 7L, 3L -> 9L)
      .sortBy { case (id, _) => (hex(id.toString), id) }
    var cum = 0L
    val expectEn = enOrder.takeWhile { case (_, n) =>
      val keep = cum < 10L; cum += n; keep
    }.map(_._1).toSet
    assert(got - 10L == expectEn, s"en fill: got ${got - 10L}, want $expectEn")
  }

  test("tokenBudget is deterministic, layout-independent, and budget-exact") {
    val weights = Map("en" -> 0.6, "de" -> 0.4)
    val withTok = docs.withColumn("n_tok",
      size(graft.functions.Text.tokens(col("text"))).cast("long"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Mix.tokenBudget(df, col("lang"), col("doc_id"), col("n_tok"),
        weights, totalTokens = 5000L)
    val a = run(withTok).select("doc_id").as[Long].collect().toSet
    val b = run(withTok.repartition(13, col("n_chars")))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // every domain's EXCLUSIVE prefix stays under its budget: total
    // kept tokens < budget + the crossing doc's own tokens
    val kept = run(withTok).groupBy("lang")
      .agg(sum("n_tok").as("t"), max("n_tok").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    kept.foreach { case (lang, (t, m)) =>
      val tb = math.round(weights(lang) * 5000L)
      assert(t - m < tb, s"$lang overfilled: $t tokens vs budget $tb")
    }
    // the WindowGroupLimit prune fires when the budget sits under
    // spark.sql.optimizer.windowGroupLimitThreshold (default 1000);
    // the 3000-token budget above deliberately exceeds it, so assert
    // on a sub-threshold budget
    val plan = Mix.tokenBudget(withTok, col("lang"), col("doc_id"),
        col("n_tok"), weights, totalTokens = 1500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
