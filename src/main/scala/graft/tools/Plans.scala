package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for key queries to review scan
  * pruning, pushdown, broadcast choice, and shuffle count.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.sameElements(Array("all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq(
        "q_pricing_summary", "q_datamart_customer", "q_lookup_cascade",
        "q_limit_by", "q_embed_cosine_pairs")
    for (n <- names) {
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
