package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-weighted corpus mixing: draw a deterministic sample whose
  * per-domain row counts hit target mixture proportions under a total
  * row budget — the "re-weight the corpus before training" step of a
  * data pipeline (up-weight underrepresented languages/sources,
  * down-weight crawl bulk), and the set-based form of the reference's
  * percentage-allocation staging loads (`Integration/SSIS/Professional
  * …/Глава 10: Загрузка хранилища данных.md` splits loads by fixed
  * percentage bands).
  *
  * Selection is HASH-RANK, not RNG: within each domain, rows are
  * ranked by `md5(id)` and the first `k_d` kept, where
  * `k_d = min(n_d, round(weight_d · budget))`. The same rows are
  * chosen on every run, every cluster layout, and every engine that
  * can evaluate md5 — which is what makes the operator oracle-checkable
  * and a corpus snapshot reproducible. Domains missing from `weights`
  * are excluded (weight 0); a domain with fewer rows than its target
  * contributes everything it has (documented clamp, no re-allocation —
  * re-spreading the shortfall would make every k_d data-dependent and
  * the sample non-reproducible under corpus growth).
  *
  * 100 TB posture: one partial-aggregated count per domain (domain
  * cardinality is pipeline-config-sized, so the driver map is
  * metadata), a broadcast of the (domain → k) map, and ONE shuffle on
  * the domain key for the rank window — whose `rn ≤ maxK` literal leg
  * plans as a WindowGroupLimit, so each map task forwards at most
  * `maxK` rows per domain instead of its whole partition.
  */
object Mix {

  /** Per-domain targets: `min(n_d, round(weight_d · budget))`. Kept
    * driver-side (bounded by domain cardinality) so callers can log or
    * assert the realized mixture.
    */
  /** Ceiling on collected domain rows: mixture domains are pipeline
    * config (languages, sources), not data — a million distinct
    * values means the wrong column was passed, and collecting it
    * would be a driver OOM, so fail loudly instead.
    */
  val MaxDomains = 100000

  def targets(
      df: DataFrame, domain: Column,
      weights: Map[String, Double], budget: Long): Map[String, Long] = {
    require(budget > 0, "budget must be positive")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be non-negative and finite")
    // weight keys bound the collect: only weighted domains matter, so
    // filter BEFORE the aggregate — the guard then only protects
    // against a degenerate weights map, not the corpus
    val collected = df.filter(domain.isin(weights.keys.toSeq: _*))
      .groupBy(domain.as("__dom")).count()
      .limit(MaxDomains + 1).collect()
    require(collected.length <= MaxDomains,
      s"mixture domain column exceeds $MaxDomains distinct weighted values " +
        "— wrong column?")
    val counts = collected.map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.flatMap { case (d, w) =>
      counts.get(d).map(n => d -> math.min(n, math.round(w * budget)))
    }.filter(_._2 > 0)
  }

  /** The mixed sample itself: input rows of the selected domains,
    * first-k by md5 rank within each. Deterministic and
    * layout-independent; ties on the hash break by `id`.
    */
  def sample(
      df: DataFrame, domain: Column, id: Column,
      weights: Map[String, Double], budget: Long): DataFrame = {
    val ks = targets(df, domain, weights, budget)
    if (ks.isEmpty) return df.limit(0)
    val spark = df.sparkSession
    import spark.implicits._
    val kDf = broadcast(ks.toSeq.toDF("__dom", "__k"))
    val w = Window.partitionBy(domain).orderBy(md5(id.cast("string")), id)
    val maxK = ks.values.max
    df.join(kDf, domain === col("__dom")) // inner: weight-0 domains drop here
      .withColumn("__rn", row_number().over(w))
      // literal leg first: it alone matches the WindowGroupLimit rule,
      // pruning map-side; the per-domain leg exacts the final k
      .filter(col("__rn") <= lit(maxK) && col("__rn") <= col("__k"))
      .drop("__dom", "__k", "__rn")
  }

  /** TOKEN-budget mixing — the knob training mixes are actually
    * specified in: within each weighted domain, take documents in
    * md5-rank order until that domain's token budget
    * (`round(weight_d · totalTokens)`) is filled. A document is kept
    * while the budget is not yet exhausted BEFORE it (exclusive
    * running sum < budget), so the crossing document is included and
    * a domain always contributes at least one document when it has
    * any — the standard greedy fill.
    *
    * Zero-token documents are excluded up front: they would ride any
    * budget for free and break the scale bound below.
    *
    * 100 TB posture: ONE shuffle, on the domain key, for the rank
    * window — shared by both window legs (same partitioning/order, so
    * Catalyst plans one sort). The `row_number ≤ maxBudget` literal
    * leg plans as a map-side WindowGroupLimit: since every surviving
    * document carries ≥ 1 token, rank > budget can never fit, so each
    * map task forwards at most `maxBudget` rows per domain before the
    * shuffle — the same pruning [[sample]] gets, derived from the
    * token bound. Dropping those rows cannot change a survivor's
    * exclusive prefix sum (they all rank strictly after it).
    * NOTE: Spark only rewrites rank filters whose limit is ≤
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000)
    * into the map-side prune; for the million-token budgets of a real
    * mix, raise that conf — the filter itself is semantically inert
    * either way.
    *
    * SKEW BOUND: each domain's window runs in ONE reduce task, so a
    * domain holding most of the corpus is the straggler case — but
    * the rank pre-prune bounds that task's INPUT at
    * `(#map tasks) × maxBudget` rows (each map task forwards at most
    * maxBudget rows per domain), independent of the domain's corpus
    * share. With the budget fixed, corpus growth only grows the
    * linear scan, never the hot reducer — measured by the
    * `x_token_budget_skew` rehearsal entry (~95% of documents in one
    * domain, ratio ≈ scan). A budget so large that tasks×maxBudget
    * itself overwhelms one reducer means the OUTPUT is corpus-scale —
    * re-cut it per shard/date upstream; no two-phase prefix-sum here
    * would shrink an output-sized result.
    */
  def tokenBudget(
      df: DataFrame, domain: Column, id: Column, tokens: Column,
      weights: Map[String, Double], totalTokens: Long): DataFrame = {
    require(totalTokens > 0, "totalTokens must be positive")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be non-negative and finite")
    val budgets = weights
      .map { case (d, wt) => d -> math.round(wt * totalTokens) }
      .filter(_._2 > 0)
    if (budgets.isEmpty) return df.limit(0)
    val spark = df.sparkSession
    import spark.implicits._
    val bDf = broadcast(budgets.toSeq.toDF("__dom", "__tb"))
    val w = Window.partitionBy(domain).orderBy(md5(id.cast("string")), id)
    val maxB = budgets.values.max
    df.filter(tokens > 0)
      .join(bDf, domain === col("__dom"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(maxB))
      .withColumn("__cum",
        coalesce(
          sum(tokens).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("__cum") < col("__tb"))
      .drop("__dom", "__tb", "__rn", "__cum")
  }
}
