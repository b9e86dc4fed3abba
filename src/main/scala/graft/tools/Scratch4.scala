package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only: microbench of the shingle expression chain. */
object Scratch4 {
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
      t("docs.count")(docs.count())
      t("textlen")(docs.agg(sum(length(col("text")))).head.getLong(0))
      val rep = docs.select(col("doc_id"), col("text"))
        .repartition(32)
      t("repartitioned count")(rep.count())
      t("tokens")(rep.select(explode(Text.tokens(col("text")))).count())
      t("shingles noDistinct")(rep.select(explode(
        Text.wordShingles(Text.tokens(col("text")), 3))).count())
      val tokCol = split(trim(col("text")), "\\s+")
      t("shingles viaPreTok")(rep
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
        .select(explode(Text.wordShingles(col("t"), 3))).count())
      t("shingles distinct")(rep.select(explode(array_distinct(
        Text.wordShingles(Text.tokens(col("text")), 3)))).count())
    }
    spark.stop()
  }
}
