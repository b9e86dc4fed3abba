package graft.dag

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal orchestration DAG runner — the control-flow layer the
  * reference builds every pipeline on, re-expressed for a Spark
  * driver:
  *
  *   - tasks linked by PRECEDENCE CONSTRAINTS with the three SSIS
  *     edge kinds — Success / Failure / Completion — plus an optional
  *     variable-guard expression per edge, AND-joined by default with
  *     an OR-join opt-in per task (…/Глава 01…md:56-60: "Precedence
  *     Constraints — связывают задачи … Success, Failure, Completion
  *     + выражения"; Airflow `extract >> transform >> load`,
  *     `Integration/Apache AirFlow/001 Intro.md:20-52`);
  *   - CHECKPOINT-FILE RESTART (…/Глава 14…md:25-34): every task
  *     success atomically rewrites the checkpoint with the completed
  *     set and the variable values COMMITTED by succeeded tasks (a
  *     still-running task's partial writes are never persisted, so a
  *     crash cannot leak uncommitted state into the resumed run); a
  *     rerun against an existing
  *     checkpoint SKIPS the recorded tasks, restores the variables,
  *     and resumes from the failure onward; a fully-successful run
  *     deletes the file — SSIS `SaveCheckpoints`/`IfExists` exactly;
  *   - PER-TASK AUDIT ROWS ([[DagRun.audit]]) — run id, task, status,
  *     attempt, duration — the run-log discipline of the reference's
  *     end-to-end packages (…/Глава 08…md:64 tech columns).
  *
  * Ready tasks run CONCURRENTLY on a bounded driver pool ("Параллелизм
  * в Control Flow — бесплатный способ ускориться", …/Глава 14…md:113)
  * — each task typically submits distributed Spark jobs, so the pool
  * bounds driver-side orchestration, not cluster work. The runner is
  * deliberately driver-level and engine-agnostic: tasks are opaque
  * `DagContext => Unit` closures; everything data-shaped (staging,
  * quarantine, idempotent writes) lives in the operators the tasks
  * call, not here.
  *
  * Skip propagation: an edge from a SKIPPED upstream is never
  * satisfied — a task whose join cannot be satisfied once all its
  * upstreams are terminal is itself Skipped (SSIS: a task whose
  * constraint never fires does not execute). OnFailure edges fire on
  * genuine task failure only.
  */
object Dag {

  /** One unit of work. `run` sees the session and the run's shared
    * variables; a throw marks the attempt failed — the task retries up
    * to `maxAttempts` total executions (the Airflow `retries` knob;
    * transient-source resilience) before it is marked Failed and the
    * run becomes restartable from its checkpoint. The audit row
    * records the attempt that settled the task.
    */
  final case class Task(
      name: String, run: DagContext => Unit, maxAttempts: Int = 1) {
    require(maxAttempts >= 1, s"task $name: maxAttempts must be >= 1")
  }

  sealed trait EdgeKind
  case object OnSuccess extends EdgeKind
  case object OnFailure extends EdgeKind
  case object OnCompletion extends EdgeKind

  /** Precedence constraint `from → to`. `guard` is the SSIS
    * "expression AND constraint" form: evaluated EXACTLY ONCE, against
    * a snapshot of the run variables taken at the moment the edge's
    * source becomes terminal (succeeded/failed/skipped/checkpoint-
    * restored), and the verdict is cached — later variable writes by
    * unrelated tasks cannot flip it, and OR-join re-examination sees
    * the same verdict. Both the status condition and the guard must
    * hold for the edge to be satisfied.
    */
  final case class Edge(
      from: String, to: String,
      kind: EdgeKind = OnSuccess,
      guard: Option[Map[String, String] => Boolean] = None)

  sealed abstract class Status(val label: String)
  /** Ran in this run and returned. */
  case object Succeeded extends Status("succeeded")
  /** Ran in this run and threw. */
  case object Failed extends Status("failed")
  /** Join unsatisfiable — never executed. */
  case object Skipped extends Status("skipped")
  /** Completed in a PRIOR run (checkpoint) — not re-executed. */
  case object Checkpointed extends Status("checkpointed")

  /** `startedAtMs..endedAtMs` covers the SETTLING attempt only (the
    * succeeding one, or the final failing one) — retries that failed
    * earlier are not folded into the duration, so lag/duration
    * monitoring over the audit table sees the real last-attempt cost.
    */
  final case class TaskResult(
      task: String, status: Status, attempt: Int,
      startedAtMs: Long, endedAtMs: Long, error: Option[String])

  /** Shared run state handed to every task: the session plus the
    * run-scoped string variables (the SSIS variable surface). Reads
    * and writes hit the LIVE shared map (concurrent tasks observe each
    * other's writes, as SSIS package variables do); additionally each
    * write is recorded in the executing attempt's private delta, and
    * only the deltas of SUCCEEDED tasks (succeeding attempt only) are
    * persisted to the checkpoint — a crashed run never restores
    * variables written by a task that did not complete.
    */
  final class DagContext private[dag] (
      val spark: SparkSession,
      private[dag] val vars: TrieMap[String, String],
      private[dag] val delta: Option[TrieMap[String, String]] = None) {
    def set(key: String, value: String): Unit = {
      vars.put(key, value)
      delta.foreach(_.put(key, value))
    }
    def get(key: String): Option[String] = vars.get(key)
    def snapshot: Map[String, String] = vars.toMap
    private[dag] def withDelta(d: TrieMap[String, String]): DagContext =
      new DagContext(spark, vars, Some(d))
  }

  final case class DagRun(
      runId: String,
      results: Seq[TaskResult],
      vars: Map[String, String]) {
    def succeeded: Boolean =
      results.forall(r => r.status == Succeeded || r.status == Checkpointed)
    def status(task: String): Status =
      results.find(_.task == task).getOrElse(
        throw new NoSuchElementException(task)).status

    /** The audit table of this run — one row per task, ready to append
      * to a run-log table (timestamps are wall-clock; the driver's
      * oracle-gated query projects them away).
      */
    def audit(spark: SparkSession): DataFrame = {
      import spark.implicits._
      results.map(r => (runId, r.task, r.status.label, r.attempt,
          r.startedAtMs, r.endedAtMs, r.error.getOrElse(null: String)))
        .toDF("run_id", "task", "status", "attempt",
          "started_at_ms", "ended_at_ms", "error")
    }
  }

  /** Execute the DAG. `checkpoint` (optional) is the SSIS
    * CheckpointFileName: pre-completed tasks are skipped and their
    * variable state restored; the file is advanced after every task
    * success and deleted when the whole run succeeds. `maxParallel`
    * bounds concurrently-RUNNING tasks (ready tasks beyond the bound
    * queue). Throws on malformed graphs (duplicate/unknown names,
    * cycles) before running anything.
    */
  def run(
      spark: SparkSession,
      tasks: Seq[Task],
      edges: Seq[Edge],
      runId: String,
      checkpoint: Option[String] = None,
      orJoins: Set[String] = Set.empty,
      vars: Map[String, String] = Map.empty,
      maxParallel: Int = 4): DagRun = {
    validate(tasks, edges, orJoins)
    val byName = tasks.map(t => t.name -> t).toMap
    val indexed = edges.zipWithIndex
    val incoming = indexed.groupBy(_._1.to)
    val outgoing = indexed.groupBy(_._1.from)
    val ctx = new DagContext(spark, TrieMap(vars.toSeq: _*))
    val state = TrieMap.empty[String, TaskResult]
    // checkpoint-eligible variable state: the initial vars plus deltas
    // committed by SUCCEEDED tasks only (never a running task's
    // partial writes — see DagContext doc)
    val committed = TrieMap[String, String](vars.toSeq: _*)
    // one cached verdict per guarded edge, fixed when its source
    // becomes terminal (see Edge doc)
    val guardVerdicts = TrieMap.empty[Int, Boolean]
    // `snap` is the variable state at the source's settle moment —
    // captured in the worker for executed tasks, at the driver's
    // decision point for Skipped/Checkpointed ones (which never ran,
    // so their terminal moment IS the decision)
    def settleGuards(source: String, snap: Map[String, String]): Unit =
      outgoing.getOrElse(source, Nil).foreach { case (e, i) =>
        e.guard.foreach { g =>
          // a guard that THROWS is an unsatisfied constraint, not a
          // runner crash (SSIS: expression evaluation failure fails
          // the constraint) — the downstream task skips, visibly
          guardVerdicts.getOrElseUpdate(i,
            try g(snap) catch { case _: Exception => false })
        }
      }

    // checkpoint restore: completed set + variables (…/Глава 14…md:30)
    val cpDone: Set[String] = checkpoint.map { cp =>
      val (done, savedVars) = readCheckpoint(spark, cp)
      savedVars.foreach { case (k, v) =>
        ctx.vars.put(k, v); committed.put(k, v)
      }
      done.filter(byName.contains)
    }.getOrElse(Set.empty)
    cpDone.foreach { name =>
      state.put(name, TaskResult(name, Checkpointed, 0, -1L, -1L, None))
    }
    cpDone.foreach(n => // restored vars are the source snapshot
      settleGuards(n, ctx.snapshot))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, maxParallel))
    // Right((result, varDelta, settleSnapshot)) per settled task;
    // Left(fatal) when an attempt hit a VirtualMachineError/interrupt
    // — rethrown below. The snapshot is captured IN THE WORKER the
    // moment the task settles (not when the driver dequeues the
    // completion), so guards on this task's outgoing edges can never
    // absorb writes made in the settle→dequeue window by concurrently
    // running tasks — the Edge doc's "snapshot at the moment the
    // source becomes terminal", made literal.
    val completions = new java.util.concurrent.LinkedBlockingQueue[
      Either[Throwable, (TaskResult, Map[String, String], Map[String, String])]]()
    try {
      var running = Set.empty[String]
      var continue = true
      while (continue) {
        // schedule every task whose fate is decidable
        var progressed = true
        while (progressed) {
          progressed = false
          byName.keys.toSeq.sorted.foreach { name =>
            if (!state.contains(name) && !running.contains(name)) {
              joinFate(incoming.getOrElse(name, Nil),
                  orJoins.contains(name), state, guardVerdicts) match {
                case JoinReady =>
                  running += name
                  val task = byName(name)
                  pool.execute { () =>
                    try {
                      val (res, delta) = execute(task, ctx)
                      completions.put(Right((res, delta, ctx.snapshot)))
                    } catch { case t: Throwable => completions.put(Left(t)) }
                  }
                case JoinDead =>
                  state.put(name,
                    TaskResult(name, Skipped, 0, -1L, -1L, None))
                  settleGuards(name, ctx.snapshot)
                  progressed = true // may decide downstream fates
                case JoinPending => ()
              }
            }
          }
        }
        if (running.isEmpty) continue = false
        else completions.take() match {
          case Left(fatal) =>
            // JVM/driver state is suspect: cancel outstanding work and
            // surface the error to the caller, not the audit table
            pool.shutdownNow()
            throw fatal
          case Right((done, delta, settleSnap)) =>
            running -= done.task
            state.put(done.task, done)
            settleGuards(done.task, settleSnap)
            if (done.status == Succeeded) {
              delta.foreach { case (k, v) => committed.put(k, v) }
              checkpoint.foreach(cp => writeCheckpoint(spark, cp,
                state.filter { case (_, r) =>
                  r.status == Succeeded || r.status == Checkpointed
                }.keySet.toSet, committed.toMap))
            }
        }
      }
    } finally pool.shutdown()

    val ordered = tasks.map(t => state(t.name))
    val runRes = DagRun(runId, ordered, ctx.snapshot)
    // a fully-successful run retires its checkpoint (SSIS deletes the
    // file on package success so the next run starts fresh)
    if (runRes.succeeded) checkpoint.foreach { cp =>
      val p = new Path(cp)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, false)
    }
    runRes
  }

  /** A Foreach/For Loop container expansion (…/Глава 01…md:55,
    * …/Глава 04…md: Foreach Loop iterates files/rows, For Loop a
    * counter): one task per item bracketed by `name.start` /
    * `name.done` barrier tasks, so callers wire the whole loop like a
    * single node — upstream → `group.start`, `group.done` →
    * downstream. `sequential = true` chains the items in order (the
    * SSIS default); otherwise items fan out and run concurrently up
    * to the pool bound. One failing item fails the join (`.done`
    * skips), exactly like a task inside a sequence container.
    */
  final case class Group(tasks: Seq[Task], edges: Seq[Edge],
      start: String, done: String)

  def foreachGroup[T](
      name: String, items: Seq[T], sequential: Boolean = false,
      maxAttempts: Int = 1)(body: (DagContext, T) => Unit): Group = {
    val start = Task(s"$name.start", _ => ())
    val done = Task(s"$name.done", _ => ())
    val itemTasks = items.zipWithIndex.map { case (item, i) =>
      Task(s"$name#$i", ctx => body(ctx, item), maxAttempts)
    }
    val edges =
      if (itemTasks.isEmpty) Seq(Edge(start.name, done.name))
      else if (sequential)
        (Seq(start.name) ++ itemTasks.map(_.name) :+ done.name)
          .sliding(2).map { case Seq(a, b) => Edge(a, b) }.toSeq
      else
        itemTasks.map(t => Edge(start.name, t.name)) ++
          itemTasks.map(t => Edge(t.name, done.name))
    Group(start +: itemTasks :+ done, edges, start.name, done.name)
  }

  /** A group plus the extra join configuration its wiring needs —
    * splat into [[run]]: `run(spark, w.tasks, w.edges ++ more,
    * orJoins = w.orJoins, …)`.
    */
  final case class Wired(
      tasks: Seq[Task], edges: Seq[Edge], orJoins: Set[String],
      start: String, done: String)

  /** Container-scoped OnError handler (the SSIS event-handler scope
    * story, …/Глава 17: Обработка ошибок и событий.md: an OnError
    * handler attached to a container fires for a failure anywhere
    * inside it): wires an OnFailure edge from EVERY member of the
    * group to `handler` and marks the handler an OR-join, so it runs
    * exactly once when any member fails and is Skipped on a clean run.
    * The handler is a peer task — give it its own onward edges (e.g.
    * to a notify/quarantine leg) as needed.
    */
  def withErrorHandler(g: Group, handler: Task): Wired =
    Wired(
      g.tasks :+ handler,
      g.edges ++ g.tasks.map(t => Edge(t.name, handler.name, OnFailure)),
      Set(handler.name), g.start, g.done)

  /** Run one task to settlement. Containment boundary: an `Exception`
    * (or other non-fatal `Throwable`) fails the ATTEMPT — retried up
    * to `maxAttempts`, then audited as Failed. `VirtualMachineError`
    * (OOM, stack overflow) and `InterruptedException` are NOT task
    * failures: the JVM/driver state is suspect, so they propagate and
    * abort the whole run instead of being retried into a routine
    * audit row. Timing covers the settling attempt only; the returned
    * delta holds the succeeding attempt's variable writes (empty on
    * failure — a failed task commits nothing to the checkpoint).
    */
  private def execute(
      task: Task, ctx: DagContext): (TaskResult, Map[String, String]) = {
    var attempt = 0
    var lastError: Option[String] = None
    var a0 = System.currentTimeMillis()
    while (attempt < task.maxAttempts) {
      attempt += 1
      val delta = TrieMap.empty[String, String]
      a0 = System.currentTimeMillis()
      try {
        task.run(ctx.withDelta(delta))
        return (TaskResult(task.name, Succeeded, attempt, a0,
          System.currentTimeMillis(), None), delta.toMap)
      } catch {
        case e: InterruptedException => throw e
        case e: VirtualMachineError => throw e
        case e: Throwable =>
          lastError = Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    (TaskResult(task.name, Failed, attempt, a0,
      System.currentTimeMillis(), lastError), Map.empty)
  }

  private sealed trait JoinState
  private case object JoinReady extends JoinState
  private case object JoinPending extends JoinState
  private case object JoinDead extends JoinState

  /** Decide a not-yet-run task's fate from its incoming edges.
    * AND-join: ready when EVERY edge is satisfied; dead as soon as one
    * edge can never be satisfied. OR-join: ready when ANY edge is
    * satisfied; dead only when all are unsatisfiable. Guard verdicts
    * come from the per-edge cache fixed at source-terminal time, so
    * re-examination across scheduler passes is stable by construction.
    */
  private def joinFate(
      in: Seq[(Edge, Int)], orJoin: Boolean,
      state: scala.collection.Map[String, TaskResult],
      guardVerdicts: scala.collection.Map[Int, Boolean]): JoinState = {
    if (in.isEmpty) return JoinReady
    val fates = in.map { case (e, i) =>
      state.get(e.from) match {
        case None => JoinPending // upstream not terminal yet
        case Some(r) =>
          val statusOk = (e.kind, r.status) match {
            case (OnSuccess, Succeeded | Checkpointed) => true
            case (OnFailure, Failed) => true
            case (OnCompletion, Succeeded | Checkpointed | Failed) => true
            case _ => false // Skipped satisfies nothing
          }
          val guardOk = statusOk &&
            (e.guard.isEmpty || guardVerdicts.getOrElse(i, false))
          if (guardOk) JoinReady else JoinDead
      }
    }
    if (orJoin) {
      if (fates.contains(JoinReady)) JoinReady
      else if (fates.forall(_ == JoinDead)) JoinDead
      else JoinPending
    } else {
      if (fates.contains(JoinDead)) JoinDead
      else if (fates.forall(_ == JoinReady)) JoinReady
      else JoinPending
    }
  }

  private def validate(
      tasks: Seq[Task], edges: Seq[Edge], orJoins: Set[String]): Unit = {
    val names = tasks.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate task names: ${dups.mkString(", ")}")
    val known = names.toSet
    edges.foreach { e =>
      require(known(e.from) && known(e.to),
        s"edge ${e.from} -> ${e.to} references an unknown task")
      require(e.from != e.to, s"self-edge on ${e.from}")
    }
    orJoins.foreach(n => require(known(n), s"orJoin on unknown task $n"))
    // Kahn's algorithm — any remainder is a cycle
    var inDeg = names.map(n => n -> 0).toMap
    edges.foreach(e => inDeg += e.to -> (inDeg(e.to) + 1))
    val out = edges.groupBy(_.from)
    var queue = names.filter(inDeg(_) == 0).toList
    var seen = 0
    while (queue.nonEmpty) {
      val n = queue.head; queue = queue.tail; seen += 1
      out.getOrElse(n, Nil).foreach { e =>
        inDeg += e.to -> (inDeg(e.to) - 1)
        if (inDeg(e.to) == 0) queue ::= e.to
      }
    }
    require(seen == names.size,
      s"cycle through: ${inDeg.filter(_._2 > 0).keys.mkString(", ")}")
  }

  // ---- checkpoint file: same crash-safety idiom as the TxTable
  // manifest — full content to a temp path, atomic rename, `#eof`
  // trailer so a torn write reads as absent, not as a partial state.

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)
  private def dec(s: String): String = URLDecoder.decode(s, UTF_8)

  private def writeCheckpoint(
      spark: SparkSession, path: String,
      done: Set[String], vars: Map[String, String]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val os = fs.create(tmp, true)
    try {
      val sb = new StringBuilder
      done.toSeq.sorted.foreach(t => sb ++= s"task\t${enc(t)}\n")
      vars.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"var\t${enc(k)}\t${enc(v)}\n"
      }
      sb ++= "#eof\n"
      os.write(sb.result().getBytes(UTF_8))
    } finally os.close()
    if (!fs.rename(tmp, p)) { // rename-over needs delete-first on HDFS
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"checkpoint rename failed: $path")
    }
  }

  private def readCheckpoint(
      spark: SparkSession, path: String): (Set[String], Map[String, String]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (Set.empty, Map.empty)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n", -1)
    if (!lines.contains("#eof")) return (Set.empty, Map.empty) // torn write
    val done = Set.newBuilder[String]
    val vars = Map.newBuilder[String, String]
    lines.takeWhile(_ != "#eof").foreach { l =>
      l.split("\t", -1) match {
        case Array("task", t) => done += dec(t)
        case Array("var", k, v) => vars += dec(k) -> dec(v)
        case _ => ()
      }
    }
    (done.result(), vars.result())
  }
}
