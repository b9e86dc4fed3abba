package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DQS-style domain validation (SURVEY Q3; reference: …/Глава
  * 11…md:66-84 — value-in-domain / format rules with
  * Correct/Suggested/Invalid outcomes).
  *
  * A rule targets one column with a validity predicate and an optional
  * correction expression. One codegen pass classifies every row:
  * `valid` (all rules pass), `corrected` (every failing rule had a
  * fix, applied), `invalid` (some failing rule had no fix). Compose
  * with `Split.outputs` for the three-stream routing.
  */
object Rules {

  final case class Rule(target: String, valid: Column, fix: Option[Column] = None)

  def validate(df: DataFrame, rules: Seq[Rule],
      statusCol: String = "dq_status"): DataFrame = {
    val allValid = rules.map(_.valid).reduce(_ && _)
    val anyUnfixable = rules.filter(_.fix.isEmpty).map(!_.valid)
      .reduceOption(_ || _).getOrElse(lit(false))
    // Status FIRST (predicates must see pre-fix values), corrections
    // applied afterwards.
    val classified = df.withColumn(statusCol,
      when(allValid, "valid")
        .when(anyUnfixable, "invalid")
        .otherwise("corrected"))
    rules.foldLeft(classified) { (d, r) =>
      r.fix match {
        case Some(f) => d.withColumn(r.target,
          when(r.valid, col(r.target)).otherwise(f))
        case None => d
      }
    }
  }

  /** DQS "Suggested" as a distinct NON-APPLIED state (the reference's
    * third outcome, kept separate from auto-correction): original
    * values pass through untouched; every failing rule that has a fix
    * emits its proposal into `<target><suggestSuffix>` (null when the
    * rule passed or has no fix), and the status column reads `valid` /
    * `suggested` (all failures fixable, nothing applied) / `invalid`
    * (some failure has no fix). A reviewer applies or rejects the
    * suggestions downstream; [[validate]] is the auto-apply sibling.
    */
  def validateSuggest(df: DataFrame, rules: Seq[Rule],
      statusCol: String = "dq_status",
      suggestSuffix: String = "_suggested"): DataFrame = {
    val allValid = rules.map(_.valid).reduce(_ && _)
    val anyUnfixable = rules.filter(_.fix.isEmpty).map(!_.valid)
      .reduceOption(_ || _).getOrElse(lit(false))
    val classified = df.withColumn(statusCol,
      when(allValid, "valid")
        .when(anyUnfixable, "invalid")
        .otherwise("suggested"))
    rules.foldLeft(classified) { (d, r) =>
      r.fix match {
        case Some(f) => d.withColumn(s"${r.target}$suggestSuffix",
          when(r.valid, lit(null)).otherwise(f))
        case None => d
      }
    }
  }

  /** PII redaction: mask every match of `pattern` (a character class
    * or full regex — digits, emails, phone shapes) with `mask`, and
    * count the characters redacted, so downstream audits can gate on
    * redaction volume. Pure codegen'd regexp built-ins — scales as a
    * narrow map.
    */
  def redact(c: Column, pattern: String, mask: String = "*")
      : (Column, Column) = {
    val masked = regexp_replace(c, pattern, mask)
    val removed = length(c) - length(regexp_replace(c, pattern, ""))
    (masked, removed.cast("long"))
  }

  /** Fence tables above this group count take the shuffled-join path
    * instead of a forced broadcast (same guard family as
    * `Dict.MaxLiteralRows` / `Mix.MaxDomains`). */
  val MaxBroadcastGroups = 1000000

  /** Per-group IQR outlier screen (Tukey fences) — the numeric-column
    * half of DQ screening, next to [[validate]]'s rule checks: rows
    * whose value falls outside `[q1 − k·IQR, q3 + k·IQR]` of their
    * group are flagged. Quartiles are EXACT (`percentile`, the same
    * linear interpolation as DuckDB's `quantile_cont`, proven
    * bit-equal by q_percentile) and the fence arithmetic mirrors the
    * oracle expression order, so flags replay exactly.
    *
    * NULL/NaN values neither enter the quartiles nor get flagged —
    * callers screening a column with NaNs filter them first (they are
    * a different defect class than outliers).
    *
    * 100 TB shape: the quartile aggregate shuffles once on the group
    * key; the per-group fences are group-cardinality-sized and
    * BROADCAST back (map-side flagging, no second fact shuffle) —
    * GUARDED: the broadcast hint bypasses autoBroadcastJoinThreshold,
    * so a high-cardinality group column (the one parameter mistake
    * that could OOM the driver here) is detected with a bounded
    * `limit(N+1).count()` probe over the persisted fence table and
    * falls back to a plain shuffled join, answers unchanged.
    */
  def outliers(
      df: DataFrame, group: Column, value: Column,
      k: Double = 1.5,
      maxBroadcastGroups: Int = MaxBroadcastGroups): DataFrame = {
    import graft.CacheScope.TrackedDataFrame
    val stats = df
      .filter(value.isNotNull && !isnan(value))
      .groupBy(group.as("__g"))
      .agg(
        percentile(value, lit(0.25)).as("__q1"),
        percentile(value, lit(0.75)).as("__q3"))
      .persistTracked() // the probe's work feeds the join, not a rerun
    val statsSide =
      if (stats.limit(maxBroadcastGroups + 1).count() <= maxBroadcastGroups)
        broadcast(stats)
      else stats
    val lo = col("__q1") - lit(k) * (col("__q3") - col("__q1"))
    val hi = col("__q3") + lit(k) * (col("__q3") - col("__q1"))
    df.join(statsSide, group === col("__g"), "left")
      .withColumn("lo_fence", lo)
      .withColumn("hi_fence", hi)
      // coalesce: a group with NO valid values has no fences (left
      // join misses) — its rows are not outliers, not unknowns
      .withColumn("is_outlier",
        coalesce(
          value.isNotNull && !isnan(value) &&
            (value < lo || value > hi),
          lit(false)))
      .drop("__g", "__q1", "__q3")
  }
}
