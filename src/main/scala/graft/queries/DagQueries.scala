package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dag.Dag
import graft.dag.Dag._

/** Orchestration runner surface ([[graft.dag.Dag]]): the audit table
  * of a deterministic control-flow run, oracle-gated. The DAG is the
  * reference's canonical end-to-end package shape — parallel extracts
  * joined into a mart build, a probe task that fails, an OnFailure
  * quarantine leg, an OnSuccess publish leg (skipped by the failure),
  * and an OnCompletion log step (…/Глава 01…md:56-60 precedence
  * kinds; …/Глава 08…md end-to-end package). Statuses and row counts
  * are fully deterministic, so DuckDB replays the audit table from
  * the same inputs plus the constraint semantics.
  */
object DagQueries {

  def all: Seq[Q] = Seq(dagAudit)

  val dagAudit: Q = Q(
    "q_dag_audit",
    """WITH mart AS (
      |  SELECT count(*) AS c FROM orders o
      |  WHERE EXISTS (SELECT 1 FROM lineitem l
      |                WHERE l.l_orderkey = o.o_orderkey))
      |SELECT * FROM (
      |  SELECT 'build_mart' AS task, 'succeeded' AS status,
      |    CAST(1 AS BIGINT) AS attempt, (SELECT c FROM mart) AS n_rows
      |  UNION ALL SELECT 'extract_lineitem', 'succeeded', 1,
      |    (SELECT count(*) FROM lineitem)
      |  UNION ALL SELECT 'extract_orders', 'succeeded', 1,
      |    (SELECT count(*) FROM orders)
      |  UNION ALL SELECT 'log_done', 'succeeded', 1, 1
      |  UNION ALL SELECT 'probe_feed', 'failed', 1, 0
      |  UNION ALL SELECT 'publish', 'skipped', 0, 0
      |  UNION ALL SELECT 'quarantine', 'succeeded', 1,
      |    (SELECT count(*) FROM lineitem WHERE l_quantity > 49)
      |) ORDER BY task""".stripMargin) { (s, dir) =>
    import s.implicits._
    val run = Dag.run(s,
      tasks = Seq(
        Task("extract_orders", ctx => ctx.set("rows_extract_orders",
          Tables.orders(ctx.spark, dir).count().toString)),
        Task("extract_lineitem", ctx => ctx.set("rows_extract_lineitem",
          Tables.lineitem(ctx.spark, dir).count().toString)),
        Task("build_mart", ctx => ctx.set("rows_build_mart",
          Tables.orders(ctx.spark, dir).join(
              Tables.lineitem(ctx.spark, dir)
                .select(col("l_orderkey")).distinct(),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
            .count().toString)),
        Task("probe_feed", _ => sys.error("external feed unavailable")),
        Task("quarantine", ctx => ctx.set("rows_quarantine",
          Tables.lineitem(ctx.spark, dir)
            .filter(col("l_quantity") > 49).count().toString)),
        Task("publish", _ => sys.error("must never run")),
        Task("log_done", ctx => ctx.set("rows_log_done", "1"))),
      edges = Seq(
        Edge("extract_orders", "build_mart", OnSuccess),
        Edge("extract_lineitem", "build_mart", OnSuccess),
        Edge("probe_feed", "quarantine", OnFailure),
        Edge("build_mart", "publish", OnSuccess),
        Edge("probe_feed", "publish", OnSuccess),
        Edge("build_mart", "log_done", OnCompletion),
        Edge("probe_feed", "log_done", OnCompletion)),
      runId = "q_dag_audit")
    run.results
      .map(r => (r.task, r.status.label, r.attempt.toLong,
        run.vars.get(s"rows_${r.task}").map(_.toLong).getOrElse(0L)))
      .toDF("task", "status", "attempt", "n_rows")
      .orderBy(col("task"))
  }
}
