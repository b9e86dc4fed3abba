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

  def all: Seq[Q] = Seq(funnel, cohortRetention, driftPsi, histQuantiles)

  /** Quantile readout from the drift-MV histogram STATE
    * ([[graft.operators.Drift.quantiles]]): p50/p95/p99 of the event
    * value distribution per event type, served from the stored
    * `array<long>` state — no re-scan of the raw data at query time.
    * The rank walk (first bin whose running count reaches p·n) and the
    * in-bin linear interpolation are exact double arithmetic in a
    * fixed fold order, so DuckDB replays them bit-for-bit: the
    * repeated `rem − c` subtraction of integer counts from the double
    * target is IEEE-exact (magnitude only shrinks), making
    * `target ≤ cum` an equivalent hit test. Both sides round to 9
    * decimals only as a guard.
    */
  val histQuantiles: Q = Q(
    "q_hist_quantiles",
    """WITH base AS (
      |  SELECT event_type,
      |    CASE WHEN value < 0 THEN 0
      |         WHEN value > 500 THEN 11
      |         WHEN value = 500 THEN 10
      |         ELSE 1 + LEAST(CAST(floor(value/50) AS INT), 9) END AS b
      |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
      |grid AS (
      |  SELECT et.event_type, g.b
      |  FROM (SELECT DISTINCT event_type FROM events) et
      |  CROSS JOIN (SELECT unnest(range(12)) AS b) g),
      |cnt AS (SELECT event_type, b, COUNT(*) AS c FROM base GROUP BY 1, 2),
      |j AS (
      |  SELECT grid.event_type, grid.b, COALESCE(cnt.c, 0) AS c,
      |    SUM(COALESCE(cnt.c, 0)) OVER (
      |      PARTITION BY grid.event_type ORDER BY grid.b) AS cum
      |  FROM grid LEFT JOIN cnt
      |    ON grid.event_type = cnt.event_type AND grid.b = cnt.b),
      |t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM j GROUP BY 1),
      |hit AS (
      |  SELECT j.event_type, p.p, t.n, j.b, j.c, j.cum,
      |    CAST(p.p AS DOUBLE) * CAST(t.n AS DOUBLE) AS target,
      |    ROW_NUMBER() OVER (PARTITION BY j.event_type, p.p ORDER BY j.b) AS rn
      |  FROM j JOIN t ON j.event_type = t.event_type
      |  CROSS JOIN (VALUES (0.5), (0.95), (0.99)) p(p)
      |  WHERE j.c > 0
      |    AND j.cum >= CAST(p.p AS DOUBLE) * CAST(t.n AS DOUBLE)),
      |val AS (
      |  SELECT event_type, p, n,
      |    CASE WHEN b = 0 THEN 0.0
      |         WHEN b = 11 THEN 500.0
      |         ELSE LEAST(GREATEST(
      |           (CAST(b AS DOUBLE) - 1.0) * 50.0
      |             + ((target - CAST(cum - c AS DOUBLE)) / CAST(c AS DOUBLE)) * 50.0,
      |           0.0), 500.0) END AS v
      |  FROM hit WHERE rn = 1)
      |SELECT event_type, MAX(n) AS n,
      |  round(MAX(CASE WHEN p = 0.5 THEN v END), 9) AS p50,
      |  round(MAX(CASE WHEN p = 0.95 THEN v END), 9) AS p95,
      |  round(MAX(CASE WHEN p = 0.99 THEN v END), 9) AS p99
      |FROM val
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.operators.Drift
    val ev = Tables.events(s, dir)
    val st = Drift.histState(ev, Seq("event_type"), col("value"),
      lo = 0.0, hi = 500.0, bins = 10)
    val qs = Drift.quantiles(col("hist"), Seq(0.5, 0.95, 0.99),
      lo = 0.0, hi = 500.0)
    st.select(
        col("event_type"),
        aggregate(col("hist"), lit(0L), _ + _).as("n"),
        round(element_at(qs, 1), 9).as("p50"),
        round(element_at(qs, 2), 9).as("p95"),
        round(element_at(qs, 3), 9).as("p99"))
      // a key with NO valid values (all NULL/NaN) has an all-zero
      // histogram here but no row at all in the oracle's rank walk —
      // drop the n=0 groups so both sides agree on the key set
      .filter(col("n") > 0)
      .orderBy(col("event_type"))
  }

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
