package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al.,
  * NeurIPS 2023): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (the domain you want more of) than under the raw-corpus SOURCE
  * distribution, then keep the top of the ranking. The published
  * estimator is exactly this importance weight over hashed-n-gram
  * bag-of-words models; the paper resamples with Gumbel noise, this
  * implementation takes the deterministic top-k of the same weights
  * (the RNG-free form every other selection operator here uses — a
  * reproducible, auditable corpus cut).
  *
  * Features: word bigrams hashed into `buckets` buckets with the
  * md5-h60 device ([[Shard]] — replayable bit-for-bit in the DuckDB
  * oracle). Distributions are add-1smoothed bucket frequencies;
  * a document's log-importance weight is the POSITION-ORDERED fold of
  * ln p_target(b) − ln p_source(b) over its bigram occurrences (the
  * [[Relevance.bigramNll]] fold — bit-deterministic under any
  * partitioning).
  *
  * 100 TB posture: ONE aggregation pass builds both distributions
  * (`buckets` rows — a broadcast model, collected to the driver only
  * to read the two totals), one linear scoring pass joins each bigram
  * occurrence against the broadcast stats, and the selection is a
  * top-k (TakeOrderedAndProject — never a global sort materialized).
  * Nothing driver-side scales with the corpus.
  */
object Dsir {

  /** 60 bits of md5 as a non-negative long (the [[Shard]] device). */
  private def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** The hashed-bigram occurrence frame: one row per adjacent word
    * pair — (doc_id, __tgt, pos, b) — via shifted slices (the
    * bigramNll shape: one projection per doc row, no self-join).
    */
  private def bigrams(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"), isTarget.as("__tgt"),
      filter(split(col(textCol), " "), x => x =!= "").as("t"))
    val nT = size(col("t"))
    toks.filter(nT >= 2)
      .select(col("doc_id"), col("__tgt"), posexplode(zip_with(
        slice(col("t"), lit(1), nT - 1), slice(col("t"), lit(2), nT - 1),
        (a, w) => concat(a, lit(" "), w))))
      .select(col("doc_id"), col("__tgt"), col("pos"),
        (h60(col("col")) % buckets).as("b"))
  }

  /** Both distributions in ONE aggregation pass: source = every
    * occurrence, target = occurrences from target documents —
    * collected as ≤ `buckets` (bucket, cs, ct) rows, model metadata.
    * This is the model the streaming form
    * ([[graft.streaming.Streams.dsirStream]]) freezes between
    * refreshes.
    */
  private[graft] def collectStats(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 64): Seq[(Long, Long, Long)] =
    statsOf(bigrams(docs, idCol, textCol, isTarget, buckets))

  private def statsOf(bg: DataFrame): Seq[(Long, Long, Long)] =
    bg.groupBy(col("b")).agg(
        count(lit(1)).as("cs"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .collect() // ≤ `buckets` rows — model metadata
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** Score a bigram frame against a (possibly frozen) stats model:
    * the model re-ships as a LOCAL relation, so the scoring join
    * never re-evaluates a corpus-scale stats subplan — one linear
    * pass, BroadcastHashJoin against ≤ `buckets` rows, per-doc
    * position-ordered ln-ratio fold, round 9.
    */
  private def scoreBigrams(
      spark: org.apache.spark.sql.SparkSession, bg: DataFrame,
      model: Seq[(Long, Long, Long)], buckets: Int): DataFrame = {
    val sTot = model.map(_._2).sum
    val tTot = model.map(_._3).sum
    import spark.implicits._
    val stats = model.toDF("b", "cs", "ct")
    val lw = log((col("ct") + lit(1.0)) / lit(tTot + buckets.toDouble)) -
      log((col("cs") + lit(1.0)) / lit(sTot + buckets.toDouble))
    bg.join(broadcast(stats), Seq("b"))
      .select(col("doc_id"), col("pos"), lw.as("lw"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        // position-ordered fold, exact 0.0 seed (the bigramNll device)
        aggregate(
          transform(
            sort_array(collect_list(struct(col("pos"), col("lw")))),
            s => s.getField("lw")),
          lit(0.0), _ + _).as("sum_lw"))
      .select(col("doc_id"), col("n_feats"),
        round(col("sum_lw"), 9).as("weight"))
  }

  /** Per-document hashed-bigram importance weights against the target
    * slice `isTarget` (evaluated per document row): returns
    * (doc_id, n_feats, weight) for every document with ≥ 2 tokens,
    * weight rounded to 9 decimals (the cross-engine float-equality
    * device every scored oracle here uses). Exactly two linear
    * corpus passes: stats, then scoring.
    */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 64): DataFrame = {
    val bg = bigrams(docs, idCol, textCol, isTarget, buckets)
    scoreBigrams(docs.sparkSession, bg, statsOf(bg), buckets)
  }

  /** Score `docs` against a FROZEN stats model from a PREVIOUS corpus
    * version (the streaming trickle-ingest form —
    * [[graft.streaming.Streams.dsirStream]]): one linear pass over
    * `docs`, no stats pass. Unlike [[importanceWeights]] — where the
    * stats frame covers every bucket the scored frame can produce by
    * construction — a frozen model may MISS buckets that only appear
    * in later documents, so the model is densified to all `buckets`
    * rows first: an unseen bucket scores at its add-1-smoothed floor
    * (counts 0), never silently drops the occurrence from the fold.
    */
  private[graft] def scoreAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      model: Seq[(Long, Long, Long)], buckets: Int = 64): DataFrame = {
    val byB = model.map(m => m._1 -> m).toMap
    val dense = (0L until buckets.toLong)
      .map(b => byB.getOrElse(b, (b, 0L, 0L)))
    scoreBigrams(docs.sparkSession,
      bigrams(docs, idCol, textCol, lit(false), buckets), dense, buckets)
  }

  /** The selection: top `k` documents by importance weight
    * (deterministic: rounded-weight desc, id tie-break).
    */
  def select(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      k: Int, buckets: Int = 64): DataFrame =
    importanceWeights(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(k)
}
