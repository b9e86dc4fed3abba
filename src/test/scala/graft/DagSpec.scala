package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.dag.Dag
import graft.dag.Dag._

/** The orchestration runner: precedence-constraint semantics
  * (success/failure/completion edges, guards, AND/OR joins, skip
  * propagation), checkpoint-file restart (the mid-flight kill), graph
  * validation, and driver-side parallelism.
  */
class DagSpec extends SparkSpec {

  private def cpPath(tag: String) =
    s"target/tmp/dag_cp_${tag}_${System.nanoTime()}"

  private def noop: DagContext => Unit = _ => ()

  test("success/failure/completion edges route exactly like the reference's constraints") {
    val ran = scala.collection.concurrent.TrieMap.empty[String, Boolean]
    def mark(n: String): DagContext => Unit = _ => ran.put(n, true)
    val run = Dag.run(spark,
      tasks = Seq(
        Task("a", mark("a")),
        Task("probe", _ => sys.error("feed unavailable")),
        Task("b", mark("b")),               // a success →
        Task("alarm", mark("alarm")),       // a failure → (must skip)
        Task("quarantine", mark("quarantine")), // probe failure →
        Task("publish", mark("publish")),   // probe success → (must skip)
        Task("fin", mark("fin"))),          // probe completion →
      edges = Seq(
        Edge("a", "b", OnSuccess),
        Edge("a", "alarm", OnFailure),
        Edge("probe", "quarantine", OnFailure),
        Edge("probe", "publish", OnSuccess),
        Edge("probe", "fin", OnCompletion)),
      runId = "r1")
    assert(!run.succeeded)
    assert(run.status("a") == Succeeded && run.status("b") == Succeeded)
    assert(run.status("probe") == Failed)
    assert(run.status("alarm") == Skipped && !ran.contains("alarm"))
    assert(run.status("publish") == Skipped && !ran.contains("publish"))
    assert(run.status("quarantine") == Succeeded && ran.contains("quarantine"))
    assert(run.status("fin") == Succeeded && ran.contains("fin"))
    // audit rows carry the same verdicts
    val audit = run.audit(spark).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(audit("probe") == "failed" && audit("publish") == "skipped")
  }

  test("skip propagates: downstream of a skipped-only upstream is skipped") {
    val run = Dag.run(spark,
      tasks = Seq(
        Task("f", _ => sys.error("boom")),
        Task("x", noop), Task("y", noop)),
      edges = Seq(
        Edge("f", "x", OnSuccess),   // x skipped (f failed)
        Edge("x", "y", OnCompletion)), // completion of a SKIPPED task
      runId = "r")
    assert(run.status("x") == Skipped && run.status("y") == Skipped)
  }

  test("edge guards and OR-joins (expression + constraint forms)") {
    val run = Dag.run(spark,
      tasks = Seq(
        Task("load", ctx => ctx.set("n", "42")),
        Task("probe", _ => sys.error("down")),
        Task("big", noop),    // guard n > 100 → skipped
        Task("small", noop),  // guard n <= 100 → runs
        Task("either", noop)), // OR-join over (load success, probe success)
      edges = Seq(
        Edge("load", "big", OnSuccess, Some(v => v("n").toLong > 100)),
        Edge("load", "small", OnSuccess, Some(v => v("n").toLong <= 100)),
        Edge("load", "either", OnSuccess),
        Edge("probe", "either", OnSuccess)),
      orJoins = Set("either"),
      runId = "r")
    assert(run.status("big") == Skipped)
    assert(run.status("small") == Succeeded)
    assert(run.status("either") == Succeeded,
      "OR-join must fire on the satisfied edge despite the failed one")
    // same edges with the default AND-join must skip
    val and = Dag.run(spark,
      tasks = Seq(Task("load", noop), Task("probe", _ => sys.error("down")),
        Task("both", noop)),
      edges = Seq(Edge("load", "both"), Edge("probe", "both")),
      runId = "r2")
    assert(and.status("both") == Skipped)
  }

  test("checkpoint restart runs exactly the unfinished suffix (mid-flight kill)") {
    val cp = cpPath("restart")
    val execs = scala.collection.concurrent.TrieMap.empty[String, AtomicInteger]
    def counted(n: String)(body: DagContext => Unit): Task = Task(n, ctx => {
      execs.getOrElseUpdate(n, new AtomicInteger).incrementAndGet()
      body(ctx)
    })
    val healthy = new java.util.concurrent.atomic.AtomicBoolean(false)
    def tasks = Seq(
      counted("t1")(ctx => ctx.set("watermark", "v7")),
      counted("t2")(noop),
      counted("t3")(_ => if (!healthy.get) sys.error("killed mid-flight")),
      counted("t4")(ctx =>
        // t4 proves the restored variable state is visible downstream
        require(ctx.get("watermark").contains("v7"), "vars not restored")),
      counted("t5")(noop))
    val chain = Seq(Edge("t1", "t2"), Edge("t2", "t3"),
      Edge("t3", "t4"), Edge("t4", "t5"))

    val first = Dag.run(spark, tasks, chain, "run1", checkpoint = Some(cp))
    assert(!first.succeeded)
    assert(first.status("t2") == Succeeded && first.status("t3") == Failed)
    assert(first.status("t4") == Skipped && first.status("t5") == Skipped)
    assert(Files.exists(Paths.get(cp)), "failed run must leave its checkpoint")

    healthy.set(true)
    val second = Dag.run(spark, tasks, chain, "run2", checkpoint = Some(cp))
    assert(second.succeeded)
    // EXACTLY the unfinished suffix re-ran
    assert(second.status("t1") == Checkpointed &&
      second.status("t2") == Checkpointed)
    assert(Seq("t1", "t2").forall(execs(_).get == 1),
      s"completed tasks must not re-run: ${execs.map { case (k, v) => k -> v.get }}")
    assert(execs("t3").get == 2, "the failed task re-runs")
    assert(Seq("t4", "t5").forall(execs(_).get == 1),
      "tasks skipped by the failure run once, in the restart")
    // success retires the checkpoint (next run starts fresh)
    assert(!Files.exists(Paths.get(cp)))
  }

  test("per-task retries settle transient failures; the audit records the attempt") {
    val flaky = new AtomicInteger(0)
    val run = Dag.run(spark,
      tasks = Seq(
        Task("transient", _ =>
          if (flaky.incrementAndGet() < 3) sys.error("transient outage"),
          maxAttempts = 3),
        Task("hopeless", _ => sys.error("always down"), maxAttempts = 2),
        Task("after", noop)),
      edges = Seq(Edge("transient", "after")),
      runId = "r")
    assert(run.status("transient") == Succeeded && flaky.get == 3)
    assert(run.results.find(_.task == "transient").get.attempt == 3)
    assert(run.status("hopeless") == Failed)
    assert(run.results.find(_.task == "hopeless").get.attempt == 2)
    assert(run.status("after") == Succeeded)
  }

  test("a guard that throws is an unsatisfied constraint, not a runner crash") {
    val run = Dag.run(spark,
      tasks = Seq(Task("a", noop), Task("b", noop), Task("c", noop)),
      edges = Seq(
        Edge("a", "b", OnSuccess,
          Some(v => v("missing_key").toLong > 0)), // throws NoSuchElement
        Edge("a", "c", OnSuccess)),
      runId = "r")
    assert(run.status("b") == Skipped, "failing guard must skip, not crash")
    assert(run.status("c") == Succeeded)
  }

  test("malformed graphs refuse before running anything") {
    intercept[IllegalArgumentException] { // cycle
      Dag.run(spark, Seq(Task("a", noop), Task("b", noop)),
        Seq(Edge("a", "b"), Edge("b", "a")), "r")
    }
    intercept[IllegalArgumentException] { // unknown endpoint
      Dag.run(spark, Seq(Task("a", noop)), Seq(Edge("a", "ghost")), "r")
    }
    intercept[IllegalArgumentException] { // duplicate names
      Dag.run(spark, Seq(Task("a", noop), Task("a", noop)), Nil, "r")
    }
    intercept[IllegalArgumentException] { // self-edge
      Dag.run(spark, Seq(Task("a", noop)), Seq(Edge("a", "a")), "r")
    }
  }

  test("foreach group: parallel fan-out, sequential chaining, failure fails the join") {
    // parallel: items land in any order between the barriers
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val g = Dag.foreachGroup("load", Seq(1, 2, 3))((_, i) => seen.add(i): Unit)
    val run = Dag.run(spark,
      tasks = Task("pre", noop) +: g.tasks :+ Task("post", noop),
      edges = Edge("pre", g.start) +: g.edges :+ Edge(g.done, "post"),
      runId = "r")
    assert(run.succeeded && seen.size == 3)
    assert(run.status("post") == Succeeded)

    // sequential: strict order (the SSIS Foreach default)
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val sg = Dag.foreachGroup("seq", Seq(10, 20, 30), sequential = true)(
      (_, i) => order.add(i): Unit)
    assert(Dag.run(spark, sg.tasks, sg.edges, "r2").succeeded)
    assert(order.toArray.toSeq == Seq(10, 20, 30))

    // one failing item: the join never fires, downstream skips
    val fg = Dag.foreachGroup("bad", Seq(1, 2, 3))((_, i) =>
      if (i == 2) sys.error("item 2 down"))
    val failed = Dag.run(spark,
      tasks = fg.tasks :+ Task("after", noop),
      edges = fg.edges :+ Edge(fg.done, "after"),
      runId = "r3")
    assert(!failed.succeeded)
    assert(failed.status("bad#1") == Failed)
    assert(failed.status("bad.done") == Skipped)
    assert(failed.status("after") == Skipped)

    // empty loop degenerates to start → done
    val eg = Dag.foreachGroup("none", Seq.empty[Int])((_, _) => ())
    assert(Dag.run(spark, eg.tasks, eg.edges, "r4").succeeded)
  }

  test("fatal JVM errors abort the run — not retried into an audit row") {
    val attempts = new AtomicInteger(0)
    val oom = intercept[OutOfMemoryError] {
      Dag.run(spark,
        tasks = Seq(Task("boom", _ => {
          attempts.incrementAndGet()
          throw new OutOfMemoryError("synthetic (constructed, no real exhaustion)")
        }, maxAttempts = 3)),
        edges = Nil, runId = "r")
    }
    assert(oom.getMessage.contains("synthetic"))
    assert(attempts.get == 1,
      "a VirtualMachineError must propagate on the FIRST attempt, never retry")
  }

  test("audit timing covers the settling attempt only (retries excluded)") {
    val tries = new AtomicInteger(0)
    val firstFailAt = new java.util.concurrent.atomic.AtomicLong(0)
    val run = Dag.run(spark,
      tasks = Seq(Task("flaky", _ => {
        if (tries.incrementAndGet() == 1) {
          firstFailAt.set(System.currentTimeMillis())
          Thread.sleep(300)
          sys.error("transient")
        }
      }, maxAttempts = 2)),
      edges = Nil, runId = "r")
    val r = run.results.head
    assert(r.status == Succeeded && r.attempt == 2)
    assert(r.startedAtMs >= firstFailAt.get + 280,
      s"startedAtMs must be the attempt-2 start, not the attempt-1 start " +
        s"(started=${r.startedAtMs}, firstAttemptAt=${firstFailAt.get})")
    assert(r.endedAtMs - r.startedAtMs < 280,
      "duration must not include the failed attempt's 300ms")
  }

  test("edge guards are snapshotted when the source becomes terminal") {
    // `writer` runs strictly AFTER `a` is terminal (it is a's
    // downstream), so a→c's guard verdict is already fixed when the
    // flag appears: c must stay Skipped even though by the time its
    // join is last examined the live variables would satisfy the guard.
    val run = Dag.run(spark,
      tasks = Seq(
        Task("a", noop),
        Task("writer", ctx => ctx.set("flag", "on")),
        Task("c", noop)),
      edges = Seq(
        Edge("a", "writer", OnSuccess),
        Edge("a", "c", OnSuccess, Some(v => v.get("flag").contains("on"))),
        Edge("writer", "c", OnSuccess)),
      runId = "r")
    assert(run.status("writer") == Succeeded)
    assert(run.vars.get("flag").contains("on"))
    assert(run.status("c") == Skipped,
      "a later write by an unrelated task must not flip a settled guard")
    // …while the source's OWN writes are visible to its guards (they
    // happen before it turns terminal)
    val own = Dag.run(spark,
      tasks = Seq(Task("a", ctx => ctx.set("x", "1")), Task("b", noop)),
      edges = Seq(Edge("a", "b", OnSuccess, Some(v => v("x") == "1"))),
      runId = "r2")
    assert(own.status("b") == Succeeded)
  }

  test("checkpoint persists only variables committed by succeeded tasks") {
    val cp = cpPath("varscope")
    val healthy = new java.util.concurrent.atomic.AtomicBoolean(false)
    def awaitVar(ctx: DagContext, k: String): Unit = {
      val deadline = System.currentTimeMillis() + 10000
      while (ctx.get(k).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      require(ctx.get(k).nonEmpty, s"timed out waiting for $k")
    }
    def tasks = Seq(
      Task("p", ctx =>
        if (!healthy.get) {
          ctx.set("partial", "leak") // live write, then the task FAILS:
          ctx.set("p_wrote", "1")    // must never reach the checkpoint
          awaitVar(ctx, "committed_g")
          sys.error("dies after writing")
        } else
          // the restored state must carry g's committed var and must
          // NOT carry the failed attempt's partial write
          require(ctx.get("committed_g").contains("1") &&
            ctx.get("partial").isEmpty,
            s"restored vars leaked uncommitted state: ${ctx.snapshot}")),
      Task("g", ctx => { awaitVar(ctx, "p_wrote"); ctx.set("committed_g", "1") }))
    val first = Dag.run(spark, tasks, Nil, "run1",
      checkpoint = Some(cp), maxParallel = 2)
    assert(!first.succeeded && first.status("g") == Succeeded)
    healthy.set(true)
    val second = Dag.run(spark, tasks, Nil, "run2",
      checkpoint = Some(cp), maxParallel = 2)
    assert(second.succeeded,
      s"restart must see committed-only vars: ${second.results.mkString("; ")}")
    assert(second.status("g") == Checkpointed)
  }

  test("withErrorHandler: container-scoped OnError fires on any member failure") {
    val handled = new AtomicInteger(0)
    val g = Dag.foreachGroup("batch", Seq(1, 2, 3))((_, i) =>
      if (i == 2) sys.error("item 2 down"))
    val wired = Dag.withErrorHandler(g, Task("onError", _ => handled.incrementAndGet(): Unit))
    val run = Dag.run(spark, wired.tasks, wired.edges, "r",
      orJoins = wired.orJoins)
    assert(run.status("batch#1") == Failed)
    assert(run.status("onError") == Succeeded && handled.get == 1,
      "the handler runs exactly once for a failure anywhere in the scope")

    // clean run: the handler is skipped, everything else succeeds
    val ok = Dag.foreachGroup("ok", Seq(1, 2))((_, _) => ())
    val wiredOk = Dag.withErrorHandler(ok, Task("onError", _ => handled.incrementAndGet(): Unit))
    val clean = Dag.run(spark, wiredOk.tasks, wiredOk.edges, "r2",
      orJoins = wiredOk.orJoins)
    assert(clean.status("onError") == Skipped && handled.get == 1)
    assert(clean.results.filterNot(_.task == "onError")
      .forall(_.status == Succeeded))
  }

  test("independent branches run concurrently on the driver pool") {
    // rendezvous: each branch waits for the other — completes only if
    // both are genuinely in flight at once (a serial runner times out
    // a latch and fails the task, not the suite)
    val latch = new java.util.concurrent.CyclicBarrier(2)
    def meet: DagContext => Unit = _ =>
      latch.await(20, java.util.concurrent.TimeUnit.SECONDS)
    val run = Dag.run(spark,
      Seq(Task("left", meet), Task("right", meet), Task("join", noop)),
      Seq(Edge("left", "join"), Edge("right", "join")),
      runId = "r", maxParallel = 2)
    assert(run.succeeded, run.results.mkString("; "))
  }
}
