package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: how does size+explode compose over the shingle expr? */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    for (i <- 1 to 2) {
      println(s"--- iter $i")
      val docs = graft.Tables.documents(spark, dir)
      val sh = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
      t("A select(size,explode)") {
        sh.select(col("doc_id"), size(col("sh")).as("nsh"),
          explode(col("sh")).as("g")).count()
      }
      t("B persist sh first") {
        val p = sh.persist()
        p.count()
        val n = p.select(col("doc_id"), size(col("sh")).as("nsh"),
          explode(col("sh")).as("g")).count()
        p.unpersist(); n
      }
      t("C posexplode trick") {
        sh.select(col("doc_id"), size(col("sh")).as("nsh"), col("sh"))
          .select(col("doc_id"), col("nsh"), explode(col("sh")).as("g"))
          .count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
