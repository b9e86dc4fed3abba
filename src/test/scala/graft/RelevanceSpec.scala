package graft

import org.apache.spark.sql.functions._
import graft.operators.Relevance

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores, sparse output, df/idf semantics") {
    // 3 docs, query = {a, z}: doc 3 has no query term → absent
    val docs = Seq(
      (1L, "a a b"),    // tf(a)=2, dl=3
      (2L, "a c c c"),  // tf(a)=1, dl=4
      (3L, "b c")       // no hit
    ).toDF("doc_id", "text")
    val got = Relevance.bm25(docs, "doc_id", "text", Seq("a", "z"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    // replay the documented formula by hand: N=3, avgdl=3, df(a)=2
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def term(tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / 3.0))
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._2 == r9(term(2, 3)))
    assert(got(1)._2 == r9(term(1, 4)))
  }

  test("bm25: every query term missing from the corpus → empty, not a crash") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Relevance.bm25(docs, "doc_id", "text", Seq("zz")).count() == 0L)
  }

  test("bigramNll: add-1 smoothing over the corpus' own counts, " +
      "single-token docs excluded") {
    // corpus: tokens a a b | b — V={a,b}, c1(a)=2, c1(b)=2
    // bigrams: (a,a),(a,b) — c2(a,a)=1, c2(a,b)=1
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = Relevance.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L)) // doc 2: 1 token, no row
    assert(got.head._2 == 2L)
    val lpAA = math.log((1 + 1.0) / (2 + 1.0 * 2)) // p(a|a) = 2/4
    val lpAB = math.log((1 + 1.0) / (2 + 1.0 * 2)) // p(b|a) = 2/4
    val want = BigDecimal(-(0.0 + lpAA + lpAB) / 2)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._3 == want)
  }

  test("bigramNll: smoothing gives unseen-context docs a finite score") {
    // doc 2's bigram (c,d) is unseen in no other doc — but add-1 keeps
    // p > 0, so the filter scores it instead of dividing by zero
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = Relevance.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got.length == 2 && got.forall(r => !r._3.isNaN && !r._3.isInfinite))
    // the out-of-distribution doc scores WORSE (higher nll) — the
    // quality-filter direction the operator exists for
    assert(got(1)._3 > got(0)._3)
  }
}
