package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Knn

/** Similarity search over the `embeddings` table (BASELINE.json north
  * star). The oracle computes cosine with the same sequential double
  * fold (`list_reduce` ≡ Spark `aggregate`), so similarity values are
  * bit-identical and thresholds/ranks agree exactly.
  */
object VectorQueries {

  def all: Seq[Q] = Seq(cosinePairs, srpPairs, knnBrute, knnAnn, knnIvf,
    embedDecontaminate)

  /** SRP-bucketed near-dup pairs — the catalog's SCALE default for
    * whole-corpus embedding dedup (the exact `q_embed_cosine_pairs`
    * stays the small-scale oracle gate). Subset-of-exact + recall
    * proven in the spec.
    */
  val srpPairs: Q = Q.noOracle("q_embed_srp_pairs") { (s, dir) =>
    Knn.cosinePairsBucketed(
      Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  /** IVF (centroid-bucketed) ANN top-5 — the second scale path;
    * recall vs brute force measured in the spec.
    */
  val knnIvf: Q = Q.noOracle("q_knn_ivf") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.operators.Ivf.annTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, numCentroids = 16, nprobe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  private val cosineSql =
    """list_reduce(list_transform(range(1, len(E1)+1), i -> CAST(E1[i] AS DOUBLE)*CAST(E2[i] AS DOUBLE)), (x,y) -> x+y)
      | / (sqrt(list_reduce(list_transform(range(1, len(E1)+1), i -> CAST(E1[i] AS DOUBLE)*CAST(E1[i] AS DOUBLE)), (x,y) -> x+y))
      |    * sqrt(list_reduce(list_transform(range(1, len(E2)+1), i -> CAST(E2[i] AS DOUBLE)*CAST(E2[i] AS DOUBLE)), (x,y) -> x+y)))"""
      .stripMargin.replace("\n", "")

  /** Embedding near-dup pairs: cosine ≥ 0.4 over all id-ordered pairs
    * (brute-force baseline; SRP-bucketed variant is the scale path).
    */
  val cosinePairs: Q = Q(
    "q_embed_cosine_pairs",
    s"""SELECT a.vec_id AS d1, b.vec_id AS d2,
       |  ${cosineSql.replace("E1", "a.embedding").replace("E2", "b.embedding")} AS cosine
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${cosineSql.replace("E1", "a.embedding").replace("E2", "b.embedding")} >= 0.4
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Knn.cosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)
      .orderBy(col("d1"), col("d2"))
  }

  /** Brute-force cosine top-5 for query vectors (vec_id < 10):
    * the ANN correctness baseline.
    */
  val knnBrute: Q = Q(
    "q_knn_brute",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
       |scored AS (SELECT query_id, neighbor_id,
       |    ${cosineSql.replace("E1", "qv").replace("E2", "nv")} AS cosine
       |  FROM q JOIN c ON query_id <> neighbor_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Knn.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** SRP-LSH bucketed ANN top-5 (scale path; recall measured in the
    * spec against the brute-force baseline).
    */
  val knnAnn: Q = Q.noOracle("q_knn_ann") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Knn.annTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, dim = 64)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-space decontamination: corpus vectors (vec_id % 20 ≠ 0)
    * scanned against the benchmark slice (vec_id % 20 = 0) — one row
    * per contaminated corpus id with hit count and max cosine. The
    * oracle recomputes the same broadcast-join-then-aggregate from the
    * brute-force pair set with the identical sequential cosine fold.
    * (Declared after `cosineSql`: object vals initialize in order.)
    */
  val embedDecontaminate: Q = Q(
    "q_embed_decontaminate",
    s"""WITH b AS (SELECT vec_id AS bench_id, embedding AS bv
       |    FROM embeddings WHERE vec_id % 20 = 0),
       |c AS (SELECT vec_id, embedding AS cv
       |    FROM embeddings WHERE vec_id % 20 <> 0),
       |scored AS (SELECT c.vec_id,
       |    ${cosineSql.replace("E1", "cv").replace("E2", "bv")} AS cosine
       |  FROM c JOIN b ON c.vec_id <> b.bench_id)
       |SELECT vec_id, COUNT(*) AS n_hits, MAX(cosine) AS max_cosine
       |FROM scored WHERE cosine >= 0.4
       |GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    graft.operators.Knn.decontaminate(
      emb.filter(col("vec_id") % 20 =!= 0),
      emb.filter(col("vec_id") % 20 === 0),
      "vec_id", "embedding", tau = 0.4)
      .orderBy(col("vec_id"))
  }
}
