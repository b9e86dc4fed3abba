package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance-weighted selection gates (Xie et al., NeurIPS
  * 2023): the estimator must be deterministic under partitioning, and
  * it must actually SELECT FOR the target distribution — documents
  * from the target slice (or sharing its features) must be enriched
  * in the kept set relative to the raw corpus.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("weights are deterministic and partitioning-invariant") {
    val a = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Dsir.importanceWeights(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b),
      "hashed-bigram importance weights must not depend on partitioning")
  }

  test("selection enriches the target slice") {
    val n = 100
    val kept = Dsir.select(docs, "doc_id", "text",
        col("lang") === "en", k = n)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val keptEn = kept.filter(col("lang") === "en").count().toDouble / n
    val total = docs.count()
    val corpusEn = docs.filter(col("lang") === "en").count().toDouble / total
    assert(keptEn > corpusEn,
      f"top-$n must over-represent the target: kept $keptEn%.2f vs " +
        f"corpus $corpusEn%.2f")
  }

  test("n_feats counts bigram occurrences; short docs are excluded") {
    val tiny = Seq(
      (1L, "a b c d", "en"), (2L, "x", "en"), (3L, "", "de"),
      (4L, "p q", "de")).toDF("doc_id", "text", "lang")
    val w = Dsir.importanceWeights(tiny, "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == Map(1L -> 3L, 4L -> 1L),
      s"3-bigram and 1-bigram docs only, got $w")
  }

  test("a target-vocabulary document outranks a source-only one") {
    // target slice speaks {alpha beta}, the rest {gamma delta}; a new
    // doc in target vocabulary must carry a higher weight than its
    // source-vocabulary twin
    val corpus = (0 until 40).map { i =>
      if (i % 4 == 0) (i.toLong, "alpha beta alpha beta alpha", "en")
      else (i.toLong, "gamma delta gamma delta gamma", "de")
    } :+ (100L, "alpha beta alpha", "de") :+ (101L, "gamma delta gamma", "de")
    val w = Dsir.importanceWeights(corpus.toDF("doc_id", "text", "lang"),
        "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L),
      s"target-vocabulary doc must outweigh source-only: $w")
  }
}
