package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Funnel

/** Product-analytics surface over the events stream: ordered funnel
  * and cohort retention — the datamart consumers the reference's BI
  * pipelines feed (…/Глава 12's incremental marts exist to serve
  * exactly these rollups).
  */
object AnalyticsQueries {

  def all: Seq[Q] = Seq(funnel, cohortRetention, driftPsi)

  /** Distribution drift ([[graft.operators.Drift]]): PSI of the value
    * distribution between two halves of the event log (split by
    * event_id parity — a deterministic stand-in for "this week vs the
    * reference snapshot"), per event type. Histogram states are exact
    * and the PSI fold runs in bucket-index order, so the oracle
    * replays the whole computation — bucket assignment, +1 smoothing,
    * ordered float fold (`list_reduce`) — to the bit; both sides round
    * to 9 decimals only to absorb ln() last-ulp differences between
    * the two engines' libm.
    */
  val driftPsi: Q = Q(
    "q_drift_psi",
    """WITH base AS (
      |  SELECT event_type, event_id % 2 AS half,
      |    CASE WHEN value < 0 THEN 0
      |         WHEN value > 500 THEN 11
      |         WHEN value = 500 THEN 10
      |         ELSE 1 + LEAST(CAST(floor(value/50) AS INT), 9) END AS b
      |  FROM events),
      |grid AS (
      |  SELECT et.event_type, g.b
      |  FROM (SELECT DISTINCT event_type FROM events) et
      |  CROSS JOIN (SELECT unnest(range(12)) AS b) g),
      |c0 AS (SELECT event_type, b, COUNT(*) AS c FROM base WHERE half = 0 GROUP BY 1, 2),
      |c1 AS (SELECT event_type, b, COUNT(*) AS c FROM base WHERE half = 1 GROUP BY 1, 2),
      |j AS (
      |  SELECT grid.event_type, grid.b,
      |    COALESCE(c0.c, 0) AS ca, COALESCE(c1.c, 0) AS cb
      |  FROM grid
      |  LEFT JOIN c0 ON grid.event_type = c0.event_type AND grid.b = c0.b
      |  LEFT JOIN c1 ON grid.event_type = c1.event_type AND grid.b = c1.b),
      |t AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
      |        CAST(SUM(cb) AS BIGINT) AS nb FROM j GROUP BY 1),
      |terms AS (
      |  SELECT j.event_type, j.b, t.na, t.nb,
      |    ((j.ca + 1.0)/(t.na + 12.0) - (j.cb + 1.0)/(t.nb + 12.0))
      |      * ln(((j.ca + 1.0)/(t.na + 12.0)) / ((j.cb + 1.0)/(t.nb + 12.0)))
      |      AS term
      |  FROM j JOIN t ON j.event_type = t.event_type)
      |SELECT event_type, MAX(na) AS n_a, MAX(nb) AS n_b,
      |  round(list_reduce(list(term ORDER BY b), (a, b) -> a + b), 9) AS psi
      |FROM terms
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.operators.Drift
    val ev = Tables.events(s, dir)
      .withColumn("half", (col("event_id") % 2).cast("int"))
    val st = Drift.histState(ev, Seq("event_type", "half"), col("value"),
      lo = 0.0, hi = 500.0, bins = 10)
    val a = st.filter(col("half") === 0)
      .select(col("event_type"), col("hist").as("ha"))
    val b = st.filter(col("half") === 1)
      .select(col("event_type").as("__et"), col("hist").as("hb"))
    a.join(b, col("event_type") === col("__et"))
      .select(
        col("event_type"),
        aggregate(col("ha"), lit(0L), _ + _).as("n_a"),
        aggregate(col("hb"), lit(0L), _ + _).as("n_b"),
        round(Drift.psi(col("ha"), col("hb")), 9).as("psi"))
      .orderBy(col("event_type"))
  }

  /** Strictly-ordered signup → view → click → purchase funnel with
    * first-touch chaining; the oracle chains the same per-step
    * conditional minima through CTEs.
    */
  val funnel: Q = Q(
    "q_funnel",
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
      |    WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s1 ON e.user_id = s1.user_id
      |    WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s2 ON e.user_id = s2.user_id
      |    WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id),
      |s4 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
      |    JOIN s3 ON e.user_id = s3.user_id
      |    WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id)
      |SELECT step, n_users FROM (
      |  SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_view', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_click', COUNT(*) FROM s3
      |  UNION ALL SELECT '4_purchase', COUNT(*) FROM s4) t
      |ORDER BY step""".stripMargin) { (s, dir) =>
    Funnel.funnel(Tables.events(s, dir), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step"))
  }

  /** Weekly retention triangle for the signup cohort. */
  val cohortRetention: Q = Q(
    "q_cohort_retention",
    """WITH cohorts AS (SELECT user_id,
      |    date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |activity AS (SELECT DISTINCT e.user_id, c.cohort_week,
      |    CAST(FLOOR(date_diff('day', c.cohort_week,
      |      date_trunc('week', e.ts)) / 7) AS BIGINT) AS week_offset
      |  FROM events e JOIN cohorts c ON e.user_id = c.user_id)
      |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
      |  COUNT(*) AS n_active
      |FROM activity
      |WHERE week_offset >= 0
      |GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
    Funnel.cohortRetention(Tables.events(s, dir), "user_id", "event_type",
        "ts", cohortType = "signup")
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
