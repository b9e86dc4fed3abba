package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023):
  * learn per-domain mixture weights by multiplicative-weights updates
  * on per-domain EXCESS LOSS. The published algorithm re-trains a
  * proxy model between updates; this engine form replaces the
  * proxy-minus-reference loss gap with its data-only analogue — the
  * KL divergence of the domain's hashed-token distribution from the
  * whole-corpus distribution (how much a corpus-level model
  * "under-fits" the domain), a fixed per-domain statistic. That makes
  * the fixed-iteration update loop RNG-free and exactly reproducible,
  * hence replayable bit-for-bit in the DuckDB oracle — the engine's
  * standard contract for selection operators (see [[Dsir]]).
  *
  * Update rule (the paper's Algorithm 1 shape, fixed `iters`):
  * {{{
  *   w_t(d)     = alpha_{t-1}(d) * exp(eta * excess(d))
  *   alpha_t(d) = (1 - s) * w_t(d) / sum_d' w_t(d') + s / D
  * }}}
  * with `alpha_0` uniform, `eta` the step size, `s` the
  * uniform-smoothing mass, `D` the domain count. The smoothing keeps
  * every domain sampled (the paper's argument for not collapsing the
  * mixture); the iteration is path-dependent through the per-round
  * normalization, so the oracle unrolls the same fixed count.
  *
  * 100 TB posture: ONE linear aggregation pass builds the
  * per-(domain, bucket) token counts — partial-agg to ≤ D·buckets
  * rows, model metadata by the [[Dsir]] contract — and every
  * subsequent number is arithmetic on that model. All float folds run
  * in deterministic order (buckets ascending, then domains ascending)
  * so the result is bit-reproducible under any partitioning.
  */
object Doremi {

  /** 60 bits of md5 as a non-negative long (the [[Shard]] device —
    * replayable in DuckDB as
    * `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)`).
    */
  private def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Per-(domain, hashed-token-bucket) counts — the ONE corpus-scale
    * pass. Tokens are whitespace words hashed into `buckets` buckets
    * with the md5-h60 device; partial aggregation cuts the shuffle to
    * ≤ D·buckets rows per map partition.
    */
  def domainStats(
      docs: DataFrame, domainCol: String, textCol: String,
      buckets: Int = 64): DataFrame =
    docs.select(
        col(domainCol).as("domain"),
        explode(filter(split(col(textCol), " "), x => x =!= "")).as("w"))
      .select(col("domain"), (h60(col("w")) % buckets).as("b"))
      .groupBy(col("domain"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Learned domain weights: one row per domain —
    * `(domain, n_toks, excess, weight)`, ordered by domain, with
    * excess/weight rounded to 9 decimals (the cross-engine
    * float-equality device every scored oracle here uses).
    *
    * `excess` = KL(p_domain ‖ p_corpus) over add-1-smoothed hashed
    * bucket distributions, folded in ascending-bucket order over ALL
    * `buckets` buckets (unobserved buckets contribute their smoothed
    * mass). `weight` = alpha after `iters` multiplicative-weight
    * rounds.
    */
  def reweight(
      docs: DataFrame, domainCol: String, textCol: String,
      buckets: Int = 64, eta: Double = 0.1, smoothing: Double = 0.2,
      iters: Int = 5): DataFrame = {
    val rows = domainStats(docs, domainCol, textCol, buckets)
      .collect() // ≤ D·buckets rows — model metadata
    require(rows.nonEmpty, "Doremi.reweight: no tokens in the corpus")
    // the collect above is the operator's ONLY driver materialization;
    // record its size so the wide-bucket rehearsal can certify the
    // D·buckets model bound as a number, not a comment
    graft.tools.RunMetrics.put("doremi_model_rows", rows.length.toDouble)
    // a NULL domain would survive the groupBy as its own group and NPE
    // in the sort below — abort with the actual problem instead
    // (unclean input; filter or coalesce the domain column upstream)
    require(!rows.exists(_.isNullAt(0)),
      s"Doremi.reweight: NULL value in domain column '$domainCol' — " +
        "mixture domains must be non-null; filter or default them " +
        "upstream (e.g. coalesce(domain, 'unknown'))")
    val counts = rows.map(r =>
      (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val domains = rows.map(_.getString(0)).distinct.sorted
    val dD = domains.length.toDouble
    val nTok = domains.map(d =>
      d -> (0L until buckets.toLong)
        .map(b => counts.getOrElse((d, b), 0L)).sum).toMap
    val cB = Array.tabulate(buckets)(b =>
      domains.map(d => counts.getOrElse((d, b.toLong), 0L)).sum)
    val n = cB.sum
    // excess(d): ascending-bucket fold, 0.0 seed — exactly the DuckDB
    // oracle's list_reduce(list(kl ORDER BY b)) over the full bucket
    // grid
    val excess = domains.map { d =>
      var acc = 0.0
      var b = 0
      while (b < buckets) {
        val pd = (counts.getOrElse((d, b.toLong), 0L) + 1.0) /
          (nTok(d) + buckets.toDouble)
        val pc = (cB(b) + 1.0) / (n + buckets.toDouble)
        acc = acc + pd * (math.log(pd) - math.log(pc))
        b += 1
      }
      acc
    }
    // the multiplicative-weights loop: every arithmetic expression is
    // written in the SAME shape (literals, association) as the oracle
    // SQL so both engines compute identical doubles
    var alpha = Array.fill(domains.length)(1.0 / dD)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(domains.length)(i =>
        alpha(i) * math.exp(eta * excess(i)))
      var s = 0.0 // ascending-domain fold (lang ORDER in the oracle)
      var i = 0
      while (i < w.length) { s = s + w(i); i += 1 }
      alpha = Array.tabulate(domains.length)(i =>
        (1.0 - smoothing) * w(i) / s + smoothing / dD)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    domains.indices
      .map(i => (domains(i), nTok(domains(i)), excess(i), alpha(i)))
      .toDF("domain", "n_toks", "excess", "weight")
      .select(col("domain"), col("n_toks"),
        round(col("excess"), 9).as("excess"),
        round(col("weight"), 9).as("weight"))
      .orderBy(col("domain"))
  }
}
