package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // optional args: query names to profile (default: the full catalog)
    val picked =
      if (args.nonEmpty) graft.SparkEntry.queries.view.filterKeys(args.contains).toMap
      else graft.SparkEntry.queries
    for (i <- 1 to 3; (name, fn) <- picked.toSeq.sortBy(_._1)) {
      val t0 = System.nanoTime()
      Exec.materialize(fn(spark, dir))
      println(f"iter$i $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
