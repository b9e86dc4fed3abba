package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.dag.{Dag, Schedule}
import graft.dag.Dag._

/** The recurring-run driver: data-interval due math, exactly-once
  * catch-up over missed logical dates, failed-date retry, and the
  * `catchup = false` backlog collapse.
  */
class ScheduleSpec extends SparkSpec {

  private def statePath(tag: String) =
    s"target/tmp/sched_${tag}_${System.nanoTime()}"

  test("dueDates: a logical date is due once its data interval closes") {
    // intervals [0,10) [10,20) [20,30) are closed at now=35; [30,40) is open
    assert(Schedule.dueDates(0, 10, 35, Set.empty) == Seq(0, 10, 20))
    // nothing due before the first interval closes
    assert(Schedule.dueDates(0, 10, 9, Set.empty).isEmpty)
    assert(Schedule.dueDates(0, 10, 10, Set.empty) == Seq(0))
    // already-succeeded dates drop out
    assert(Schedule.dueDates(0, 10, 35, Set(0L, 20L)) == Seq(10))
    // catchup = false collapses the backlog to the latest due date
    assert(Schedule.dueDates(0, 10, 35, Set.empty, catchup = false) == Seq(20))
    intercept[IllegalArgumentException](Schedule.dueDates(0, 0, 35, Set.empty))
  }

  test("catch-up runs each missed logical date exactly once, in order") {
    val st = statePath("catchup")
    val ran = new ConcurrentLinkedQueue[Long]()
    val tasks = Seq(Task("work", ctx =>
      ran.add(ctx.get("logical_date_ms").get.toLong): Unit))

    // down for three intervals → one run per missed date, ascending
    val first = Schedule.runCatchup(spark, tasks, Nil, "daily",
      startMs = 0, periodMs = 10, nowMs = 35, stateFile = st)
    assert(first.map(_.logicalDateMs) == Seq(0, 10, 20))
    assert(first.forall(_.run.succeeded))
    assert(ran.toArray.toSeq == Seq(0L, 10L, 20L))
    assert(first.map(_.run.runId) == Seq("daily@0", "daily@10", "daily@20"))

    // same clock again: nothing new to do
    assert(Schedule.runCatchup(spark, tasks, Nil, "daily",
      0, 10, 35, st).isEmpty)
    // clock advances one interval: exactly the new date runs
    val next = Schedule.runCatchup(spark, tasks, Nil, "daily",
      0, 10, 45, st)
    assert(next.map(_.logicalDateMs) == Seq(30))
    assert(ran.toArray.toSeq == Seq(0L, 10L, 20L, 30L))
  }

  test("a failed logical date is retried on the next invocation; successes are not") {
    val st = statePath("retry")
    val healthy = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ran = new ConcurrentLinkedQueue[Long]()
    val tasks = Seq(Task("work", ctx => {
      val d = ctx.get("logical_date_ms").get.toLong
      ran.add(d)
      if (d == 10 && !healthy.get) sys.error("source down for [10,20)")
    }))

    val first = Schedule.runCatchup(spark, tasks, Nil, "daily",
      0, 10, 35, st)
    assert(first.map(r => r.logicalDateMs -> r.run.succeeded) ==
      Seq(0L -> true, 10L -> false, 20L -> true),
      "an earlier failed date must not block later independent dates")

    healthy.set(true)
    val second = Schedule.runCatchup(spark, tasks, Nil, "daily",
      0, 10, 35, st)
    assert(second.map(_.logicalDateMs) == Seq(10),
      "only the failed date re-runs")
    assert(second.head.run.succeeded)
    assert(ran.toArray.toSeq == Seq(0L, 10L, 20L, 10L))
  }

  test("catchup = false skips the backlog; per-date checkpoints resume mid-DAG") {
    val st = statePath("nocatchup")
    val ran = new ConcurrentLinkedQueue[Long]()
    val latest = Schedule.runCatchup(spark,
      Seq(Task("w", ctx => ran.add(ctx.get("logical_date_ms").get.toLong): Unit)),
      Nil, "hourly", 0, 10, 55, st, catchup = false)
    assert(latest.map(_.logicalDateMs) == Seq(40) && ran.size == 1)

    // per-date checkpoint: a two-task chain whose second task fails once
    // resumes from the failure (task 1 not re-executed) on retry
    val st2 = statePath("cp")
    val cpDir = statePath("cpdir")
    val t1Runs = new java.util.concurrent.atomic.AtomicInteger(0)
    val ok = new java.util.concurrent.atomic.AtomicBoolean(false)
    val chain = Seq(
      Task("t1", _ => t1Runs.incrementAndGet(): Unit),
      Task("t2", _ => if (!ok.get) sys.error("flaky")))
    val e = Seq(Edge("t1", "t2"))
    val r1 = Schedule.runCatchup(spark, chain, e, "cp",
      0, 10, 15, st2, checkpointDir = Some(cpDir))
    assert(r1.size == 1 && !r1.head.run.succeeded && t1Runs.get == 1)
    ok.set(true)
    val r2 = Schedule.runCatchup(spark, chain, e, "cp",
      0, 10, 15, st2, checkpointDir = Some(cpDir))
    assert(r2.size == 1 && r2.head.run.succeeded)
    assert(r2.head.run.status("t1") == Checkpointed && t1Runs.get == 1,
      "the retried date must resume from its own checkpoint")
  }
}
