package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level profile of the jaccard pipeline. */
object Scratch3 {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      println(s"--- iter $i")
      val docs = graft.Tables.documents(spark, dir)
      val ex = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
        .select(col("doc_id").as("id"), size(col("sh")).as("nsh"),
          explode(col("sh")).as("g"))
        .persist()
      t("explode+persist")(ex.count())
      val a = ex.select(col("id").as("d1"), col("nsh").as("n1"), col("g"))
      val b = ex.select(col("id").as("d2"), col("nsh").as("n2"),
        col("g").as("g2"))
      val joined = a.join(b,
        col("g") === col("g2") && col("d1") < col("d2") &&
          col("n1") * lit(0.8) <= col("n2") &&
          col("n2") * lit(0.8) <= col("n1"))
      t("join count")(joined.count())
      val agg = joined.groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.8)
      t("agg count")(agg.count())
      ex.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
