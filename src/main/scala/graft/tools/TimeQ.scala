package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time a named subset of catalog queries (args), 2 warm
  * iterations each, at SPARK_GRAFT_SF_DIR. Not part of the driver
  * contract.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2; name <- args) {
      val t0 = System.nanoTime()
      val n = Exec.materialize(graft.SparkEntry.queries(name)(spark, dir))
      println(f"TIMEQ iter$i $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.CacheScope.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
