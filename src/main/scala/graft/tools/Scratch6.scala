package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: stage-level profile of the minhash LSH pipeline. */
object Scratch6 {
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
    val (bands, rowsPerBand) = (8, 4)
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    for (i <- 1 to 2) {
      println(s"--- iter $i")
      val docs = graft.Tables.documents(spark, dir)
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
        .filter(size(col("sh")) > 0).persist()
      t("sh")(sh.count())
      val sig = sh.select(col("doc_id").as("id"),
        Dedup.minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
        .persist()
      t("sig")(sig.count())
      val banded = sig.select(col("id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          i => hash(slice(col("sig"), i * rowsPerBand + 1, lit(rowsPerBand))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
      t("banded")(banded.count())
      val a = banded.select(col("id").as("d1"), col("band"), col("bandhash"))
      val b = banded.select(col("id").as("d2"), col("band").as("band2"),
        col("bandhash").as("bandhash2"))
      val cands = a.join(b,
          col("band") === col("band2") && col("bandhash") === col("bandhash2") &&
            col("d1") < col("d2"))
        .select("d1", "d2").dropDuplicates("d1", "d2")
      t("cands")(cands.count())
      val fin = cands
        .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
        .filter(col("inter") > 0)
      t("verify")(fin.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
