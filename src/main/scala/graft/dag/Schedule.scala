package graft.dag

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Recurring-run driver over [[Dag.run]] — the `schedule_interval` +
  * catch-up semantics of the reference's Airflow notes
  * (`Integration/Apache AirFlow/001 Intro.md:20-52`: a DAG has a
  * `start_date` and a fixed interval; the scheduler materializes one
  * run per elapsed interval, including intervals missed while the
  * scheduler was down).
  *
  * Semantics (Airflow's data-interval model):
  *   - the schedule defines LOGICAL DATES `start, start+period, …`;
  *     logical date `d` covers the data interval `[d, d+period)` and
  *     becomes DUE once that interval has closed (`d + period <= now`);
  *   - `runCatchup` executes every due, not-yet-succeeded logical date
  *     in order, exactly once per date (`catchup = false` collapses
  *     the backlog to the latest due date, Airflow's `catchup=False`);
  *   - a SUCCESSFUL run records its logical date in the state file
  *     (atomic rewrite, same torn-write-safe idiom as the Dag
  *     checkpoint); a failed date is NOT recorded, so the next
  *     invocation retries it — and each date gets its own Dag
  *     checkpoint file, so the retry resumes from the failed task;
  *   - the task body reads its date from the `logical_date_ms` run
  *     variable (the `ds`/`logical_date` of the Airflow notes), so
  *     backfills are parameterized, idempotent re-runs of the same DAG.
  *
  * Wall-clock is an ARGUMENT (`nowMs`), never read here — invocations
  * are reproducible and the catch-up math is testable without sleeps.
  * The surrounding cron/trigger loop stays out of engine scope; this
  * is the part with semantics: which dates run, once, in order.
  */
object Schedule {

  final case class ScheduledRun(logicalDateMs: Long, run: Dag.DagRun)

  /** Logical dates due at `nowMs` and absent from `done`, ascending.
    * A date is due when its data interval has closed. Empty when
    * `nowMs < startMs + periodMs`.
    */
  def dueDates(
      startMs: Long, periodMs: Long, nowMs: Long,
      done: Set[Long], catchup: Boolean = true): Seq[Long] = {
    require(periodMs > 0, s"periodMs must be positive, got $periodMs")
    val due = Iterator.iterate(startMs)(_ + periodMs)
      .takeWhile(d => d + periodMs <= nowMs)
      .filterNot(done)
      .toSeq
    if (catchup) due else due.lastOption.toSeq
  }

  /** One scheduler invocation: read the state file, run every due
    * logical date through [[Dag.run]] (in date order; each date's run
    * id is `<runIdPrefix>@<dateMs>` and its variables include
    * `logical_date_ms`), record successes, return all runs. Dates keep
    * running after an earlier date fails (its checkpoint holds the
    * resume point; intervals are independent unless the caller's
    * tasks say otherwise).
    */
  def runCatchup(
      spark: SparkSession,
      tasks: Seq[Dag.Task],
      edges: Seq[Dag.Edge],
      runIdPrefix: String,
      startMs: Long,
      periodMs: Long,
      nowMs: Long,
      stateFile: String,
      catchup: Boolean = true,
      orJoins: Set[String] = Set.empty,
      vars: Map[String, String] = Map.empty,
      maxParallel: Int = 4,
      checkpointDir: Option[String] = None): Seq[ScheduledRun] = {
    val already = readState(spark, stateFile)
    var recorded = already
    dueDates(startMs, periodMs, nowMs, already, catchup).map { d =>
      val run = Dag.run(spark, tasks, edges,
        runId = s"$runIdPrefix@$d",
        checkpoint = checkpointDir.map(dir => s"$dir/cp-$d"),
        orJoins = orJoins,
        vars = vars + ("logical_date_ms" -> d.toString),
        maxParallel = maxParallel)
      if (run.succeeded) {
        recorded += d
        writeState(spark, stateFile, recorded)
      }
      ScheduledRun(d, run)
    }
  }

  // ---- state file: one `date\t<ms>` line per succeeded logical date,
  // full rewrite + atomic rename + `#eof` trailer (torn write reads as
  // absent — the date just re-runs, which is safe because runs are
  // logical-date-parameterized and idempotent by contract)

  private def writeState(
      spark: SparkSession, path: String, done: Set[Long]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(
      Option(p.getParent).getOrElse(new Path(".")), s".${p.getName}.tmp")
    val os = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      done.toSeq.sorted.foreach(d => sb ++= s"date\t$d\n")
      sb ++= "#eof\n"
      os.write(sb.result().getBytes(UTF_8))
    } finally os.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"schedule state rename failed: $path")
    }
  }

  private def readState(spark: SparkSession, path: String): Set[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n", -1)
    if (!lines.contains("#eof")) return Set.empty // torn write
    lines.takeWhile(_ != "#eof").flatMap {
      _.split("\t", -1) match {
        case Array("date", d) => d.toLongOption
        case _ => None
      }
    }.toSet
  }
}
