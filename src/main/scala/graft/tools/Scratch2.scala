package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: minhash LSH stage-by-stage cost breakdown. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .filter(size(col("sh")) > 0)
    time("shingles count")(println("  docs=" + sh.count()))
    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    time("signatures")(println("  sigs=" + sig.select("doc_id", "sig").count()))
    val banded = sig.select(
      col("doc_id").as("id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        i => hash(slice(col("sig"), i * 4 + 1, lit(4))))))
    time("band bucket sizes")(
      banded.groupBy(col("pos"), col("col")).count()
        .agg(max("count"), avg("count"), count(lit(1))).show())
    val a = banded.select(col("id").as("d1"), col("pos").as("band"), col("col").as("bh"))
    val b = banded.select(col("id").as("d2"), col("pos").as("band2"), col("col").as("bh2"))
    time("candidate pairs")(println("  cands=" +
      a.join(b, col("band") === col("band2") && col("bh") === col("bh2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct().count()))
    spark.stop()
  }
}
