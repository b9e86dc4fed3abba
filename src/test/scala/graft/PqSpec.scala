package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    Tables.embeddings(spark, "/root/testdata/sf0.001").persist()

  test("pq: training is deterministic and codebooks have the declared shape") {
    val a = Pq.trainCodebooks(emb, "embedding", m = 8, ksub = 64)
    val b = Pq.trainCodebooks(emb, "embedding", m = 8, ksub = 64)
    assert(a.length == 8 && a.forall(_.length == 64) &&
      a.forall(_.forall(_.length == 8)))
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    // dim not divisible into m → loud refusal, not silent truncation
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(emb, "embedding", m = 7, ksub = 4)
    }
  }

  test("pq encode: every code in range, deterministic across runs") {
    val cb = Pq.trainCodebooks(emb, "embedding", m = 8, ksub = 64)
    val codes = emb.select(col("vec_id"),
        Pq.encode(col("embedding"), cb).as("code"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(codes.forall(_._2.length == 8))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 64)))
    val again = emb.select(col("vec_id"),
        Pq.encode(col("embedding"), cb).as("code"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(codes.toSeq == again.toSeq)
  }

  test("ivf-pq refined: shortlist + exact re-rank recalls the L2 top-5") {
    val n = emb.count()
    val nlist = Ivf.adaptiveNlist(n)
    val centroids = Ivf.trainCentroids(emb, "embedding", k = nlist)
    val cb = Pq.trainCodebooks(emb, "embedding", m = 8, ksub = 64)
    val queries = emb.filter(col("vec_id") < 20)
    // exact baseline in the SAME metric: ADC approximates squared L2,
    // so the reference is brute-force L2 top-5 (bruteForceTopK ranks
    // by cosine — a different ordering on unnormalized vectors)
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val exact = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"))
      .crossJoin(q).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", graft.functions.Vec.l2sq(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("d"), col("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // full probe isolates QUANTIZATION: with every bucket scanned, a
    // 50-id ADC shortlist must hand the exact re-rank nearly all of
    // the true top-5 — quantization noise may only decide shortlist
    // membership, never the final order
    val full = Pq.annTopKPqRefined(emb, queries, "vec_id", "embedding",
        k = 5, centroids, cb, nprobe = nlist, shortlist = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val fullRecall = (full & exact).size.toDouble / exact.size
    assert(fullRecall >= 0.85, s"refined full-probe recall $fullRecall")
    // production setting (nprobe = 4 of nlist ≈ √n): recall is capped
    // by the coarse probe on this weakly-clustered synthetic corpus —
    // the gate documents the floor, the knob is nprobe
    val got = Pq.annTopKPqRefined(emb, queries, "vec_id", "embedding",
        k = 5, centroids, cb, nprobe = 4, shortlist = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf-pq refined recall $recall too low")
  }

  test("ivf-pq assigned split: stored-index path is bit-identical to fused") {
    val centroids = Ivf.trainCentroids(
      emb, "embedding", k = Ivf.adaptiveNlist(emb.count()))
    val cb = Pq.trainCodebooks(emb, "embedding", m = 8, ksub = 64)
    val queries = emb.filter(col("vec_id") < 10)
    val fused = Pq.annTopKPq(emb, queries, "vec_id", "embedding",
        k = 5, centroids, cb, nprobe = 4)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // round-trip the compressed index through parquet — the stored form
    val dir = "target/tmp/pqspec_assigned"
    Pq.assignCorpusPq(emb, "vec_id", "embedding", centroids, cb)
      .write.mode("overwrite").parquet(dir)
    val stored = Pq.annTopKPqAssigned(
        spark.read.parquet(dir), queries, "vec_id", "embedding",
        k = 5, centroids, cb, nprobe = 4)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(fused == stored)
  }
}
