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

  def all: Seq[Q] = Seq(funnel, cohortRetention)

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
