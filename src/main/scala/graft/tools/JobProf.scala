package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-JOB wall-clock breakdown of a catalog query.
  *
  * Bench prices a query as one number, but many catalog queries are
  * MULTI-ACTION (DML phases, streaming folds, fixpoint rounds): the
  * driver submits dozens of Spark jobs per timed region, and the
  * optimization work needs to know which ACTION the seconds belong to
  * before touching a plan. This main runs each named query once warm
  * (untimed) and once instrumented, printing every job's wall, task
  * count, and call site, plus the DRIVER GAP between consecutive jobs
  * (planning/commit/listing time never shows inside any job).
  *
  * Not part of the driver contract; `sbt "runMain graft.tools.JobProf
  * q_stream_cc"`.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProf <query names…>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // mirror Bench: the timed harness prefers shuffled-hash joins
      // (guide §3.1, r19 A/B in Bench.scala) — every session must plan
      // the same way so correctness runs validate the timed plans
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B harness: GRAFT_EXTRA_CONF="k=v;k=v" applies session confs
    // before any query runs, so a candidate conf can be profiled
    // without touching the contract mains
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    for (name <- args) {
      // warm pass: JIT + codegen cache + fixture memos
      Exec.materialize(graft.SparkEntry.queries(name)(spark, dir))
      graft.CacheScope.release()
      spark.catalog.clearCache()
      val jobs = new java.util.concurrent.ConcurrentHashMap[
        Int, (Long, String, Int)]()
      val done = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, Long, Long, String, Int)]()
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs.put(js.jobId,
            (js.time, site, js.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          Option(jobs.remove(je.jobId)).foreach { case (t0, site, nt) =>
            done.add((je.jobId, t0, je.time, site, nt))
          }
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      Exec.materialize(graft.SparkEntry.queries(name)(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.release()
      spark.catalog.clearCache()
      // listener bus is async; give it a beat to drain
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._2)
      println(f"\n===== $name wall=$wall%.2f s, ${rows.size} jobs =====")
      var prevEnd = 0L
      var jobSum = 0L
      var gapSum = 0L
      for ((id, s, e, site, nt) <- rows) {
        val gap = if (prevEnd == 0) 0L else math.max(0, s - prevEnd)
        gapSum += gap
        jobSum += e - s
        println(f"job $id%4d ${(e - s) / 1e3}%7.3f s  gap=${gap / 1e3}%6.3f s  tasks=$nt%4d  $site")
        prevEnd = math.max(prevEnd, e)
      }
      println(f"job time total=${jobSum / 1e3}%.2f s, inter-job driver gaps=${gapSum / 1e3}%.2f s")
    }
    spark.stop()
  }
}
