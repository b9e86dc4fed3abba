package graft

import org.apache.spark.sql.functions._
import graft.operators.Doremi

/** DoReMi-style domain reweighting gates (Xie et al., NeurIPS 2023):
  * deterministic under partitioning, a proper distribution, uniform
  * at zero iterations, and actually RESPONSIVE — the domain whose
  * token distribution diverges most from the corpus must gain weight
  * over the uniform start.
  */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("weights are deterministic and partitioning-invariant") {
    def get(df: org.apache.spark.sql.DataFrame) =
      Doremi.reweight(df, "lang", "text").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
    val a = get(docs)
    val b = get(docs.repartition(7))
    assert(a.nonEmpty && a.sameElements(b),
      "ordered folds must make the learned weights partitioning-invariant")
  }

  test("weights form a smoothed distribution") {
    val w = Doremi.reweight(docs, "lang", "text").collect()
      .map(r => r.getDouble(3))
    val d = w.length
    assert(math.abs(w.sum - 1.0) < 1e-6,
      s"weights must sum to 1, got ${w.sum}")
    // the uniform-smoothing mass floors every domain at s/D
    assert(w.forall(_ >= 0.2 / d - 1e-9),
      s"every weight must keep the smoothing floor 0.2/$d: ${w.mkString(",")}")
  }

  test("zero iterations returns the uniform mixture") {
    val w = Doremi.reweight(docs, "lang", "text", iters = 0).collect()
      .map(r => r.getDouble(3))
    val u = 1.0 / w.length
    assert(w.forall(x => math.abs(x - u) < 1e-9), w.mkString(","))
  }

  test("the most divergent domain gains weight over uniform") {
    // two domains speak the corpus vocabulary, one speaks its own:
    // the odd domain's KL from the corpus is largest, so DoReMi must
    // up-weight it past 1/D
    val corpus = (0 until 60).map { i =>
      val d = i % 3
      val text = if (d == 2) "qq rr ss tt qq rr" else "aa bb cc dd ee ff"
      (i.toLong, text, s"dom$d")
    }.toDF("doc_id", "text", "lang")
    val w = Doremi.reweight(corpus, "lang", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w("dom2") > 1.0 / 3 && w("dom2") > w("dom0") &&
      w("dom2") > w("dom1"),
      s"the divergent domain must be up-weighted: $w")
    // and the excess column orders the same way
    val ex = Doremi.reweight(corpus, "lang", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ex("dom2") > ex("dom0") && ex("dom2") > ex("dom1"), ex.toString)
  }

  test("mix composition: learned weights drive the sampler's quota law") {
    // the q_doremi_mix contract: every domain's take equals
    // min(available, round(weight * budget)) with the LEARNED weight
    val learned = Doremi.reweight(docs, "lang", "text")
      .select(col("domain"), col("weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = graft.operators.Mix
      .sample(docs, col("lang"), col("doc_id"), learned, budget = 300L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    learned.foreach { case (d, w) =>
      val expect = math.min(avail(d), math.round(w * 300L))
      assert(got.getOrElse(d, 0L) == expect,
        s"$d: took ${got.get(d)}, quota law says $expect (w=$w)")
    }
  }

  test("a NULL domain aborts loudly instead of NPE-ing (ADVICE r17)") {
    val dirty = docs.select(
      when(col("doc_id") % 10 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("lang"),
      col("text"))
    val ex = intercept[IllegalArgumentException] {
      Doremi.reweight(dirty, "lang", "text")
    }
    assert(ex.getMessage.contains("NULL value in domain column"),
      s"want the unclean-input message, got: ${ex.getMessage}")
  }

  test("excess is nonnegative (it is a KL divergence)") {
    val ex = Doremi.reweight(docs, "lang", "text").collect()
      .map(r => r.getDouble(2))
    assert(ex.forall(_ >= 0.0), ex.mkString(","))
  }
}
