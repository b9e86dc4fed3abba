package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.CacheScope.TrackedDataFrame

/** Ordered-funnel and cohort-retention analytics over an event stream
  * (the BI surface a datamart engine is ultimately built to serve;
  * composes the same events table as sessionization — SURVEY §2.9's
  * continuous pipeline, analyzed batch-side).
  *
  * Scale shape: the events projection is repartitioned ON THE USER KEY
  * once and persisted; every funnel step is then a groupBy or join on
  * that same key, so the chain reuses one co-partitioning instead of
  * shuffling the full event set per step. Step results are user-level
  * (one row per qualifying user) — tiny next to the event set.
  */
object Funnel {

  /** Strictly-ordered funnel: a user reaches step i+1 only with an
    * event of that type STRICTLY AFTER their first qualifying time for
    * step i (first-touch chaining — the standard product-analytics
    * definition; re-orderings within a step don't double-count).
    * Returns (step, n_users) with steps labeled "1_<type>",
    * "2_<type>", … so the funnel reads in order.
    */
  def funnel(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val ev = events.select(col(userCol), col(typeCol), col(tsCol))
      .filter(col(typeCol).isin(steps: _*))
      .repartition(par, col(userCol))
      .persistTracked()
    // fold: reached(i) = per-user MIN ts of step-i events after t(i-1)
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev_t")), userCol)
        .filter(col(tsCol) > col("__prev_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    reached.zip(steps.zipWithIndex).map { case (df, (step, i)) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$step").as("step"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Weekly cohort retention: cohort = ISO week of the user's FIRST
    * `cohortType` event; a user counts as retained in week offset w if
    * ANY event of theirs falls in cohort_week + w. Emits
    * (cohort_week, week_offset, n_active) — the classic retention
    * triangle. Both week truncations are Monday-aligned in Spark and
    * DuckDB, and offsets are exact integer arithmetic on day
    * differences (multiples of 7 by construction).
    */
  def cohortRetention(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      cohortType: String): DataFrame = {
    val spark = events.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val ev = events.select(col(userCol), col(typeCol), col(tsCol))
      .repartition(par, col(userCol))
      .persistTracked()
    val cohorts = ev.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    ev.join(cohorts, userCol)
      .select(col(userCol), col("cohort_week"),
        floor(datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .filter(col("week_offset") >= 0) // pre-cohort activity doesn't retain
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
