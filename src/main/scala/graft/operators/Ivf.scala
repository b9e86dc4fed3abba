package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.TrackedDataFrame
import graft.functions.Vec

/** IVF-style ANN (inverted-file index over coarse centroids) — the
  * second scale path for similarity search next to SRP-LSH
  * (BASELINE.json north star: "an IVF or LSH-bucketed variant").
  *
  * Index build: k centroids trained driver-side with Lloyd iterations
  * on a bounded deterministic sample (centroids are MODEL METADATA —
  * k·dim doubles — the one legitimate collect in the pipeline; the
  * corpus itself never leaves executors). Assignment and probing are
  * pure expressions: each corpus row joins its nearest centroid id,
  * each query probes the `nprobe` nearest centroid buckets.
  * Shuffles: one on the bucket id for the candidate join — candidate
  * count ≈ corpus × nprobe / k, tunable independently of recall via
  * (k, nprobe). Recall measured against `Knn.bruteForceTopK` in the
  * spec.
  */
object Ivf {

  /** Deterministic Lloyd training on a sample. Sample selection,
    * initialization, and iteration order are all seed-fixed, so the
    * index is reproducible across runs/retries. The sample is taken in
    * xxhash64(vector) order — a deterministic uniform draw across the
    * WHOLE corpus; a bare `limit` would take the first partition's
    * rows, which on a sorted/partitioned corpus biases every centroid
    * to one region of the space.
    */
  /** CORPUS-ADAPTIVE centroid count: nlist ≈ √n, floored at 16 and
    * capped (the r13 census proved the fixed k = 16 saturates exactly
    * like fixed SRP bits: by 20k vectors the probe join's candidate
    * count reaches the uniform floor n²·nprobe/k — quadratic in
    * corpus from there). √n keeps per-bucket occupancy ≈ √n too, so
    * candidates per query ≈ nprobe·√n — sublinear in corpus. The cap
    * bounds the driver-side Lloyd cost and the centroid literal; past
    * it (n > ~16M vectors) training belongs on executors (hierarchical
    * / mini-batch k-means over a sampled frame — the documented seam),
    * not in a bigger driver loop.
    */
  def adaptiveNlist(n: Long, cap: Int = 4096): Int =
    math.max(16L, math.min(cap.toLong,
      math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong)).toInt

  /** `iters`/`sampleSize` ≤ 0 = derive from k: sample 8 points per
    * centroid (floor 2000 — the fixed pre-adaptive default, so k ≤ 250
    * trains on the identical sample) and trade Lloyd rounds for k
    * (8 rounds at dictionary-size k, 4 past it — the driver-side
    * budget stays ~O(sample·k·dim) either way).
    */
  def trainCentroids(
      df: DataFrame, vecCol: String, k: Int,
      iters: Int = 0, sampleSize: Int = 0): Array[Array[Double]] = {
    val nIters = if (iters > 0) iters else if (k <= 64) 8 else 4
    val nSample = if (sampleSize > 0) sampleSize else math.max(2000, 8 * k)
    val sample = df.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)))
      .limit(nSample)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    // k-means++-lite init: evenly strided sample points (deterministic)
    var centroids = Array.tabulate(k)(i => sample((i * sample.length / k) % sample.length).clone())
    for (_ <- 1 to nIters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** All centroids as ONE nested-array literal — a single Literal
    * node instead of k×dim `lit` nodes (the same Catalyst-tree lesson
    * as Knn.planesLit: at adaptive nlist a per-component literal
    * forest is ~100k nodes and analysis dominates the query).
    */
  private def centroidsLit(cs: Array[Array[Double]]): Column =
    typedlit(cs.map(_.toSeq: Seq[Double]).toSeq: Seq[Seq[Double]])

  /** Squared distance of `vec` to each centroid, as an array column
    * (same sequential fold per centroid as before — `transform` over
    * the literal changes the tree shape, not the arithmetic, so the
    * DuckDB replay stays bit-identical).
    */
  private def distances(vec: Column, centroids: Array[Array[Double]]): Column =
    transform(centroidsLit(centroids), c => Vec.l2sq(vec, c))

  /** Nearest-centroid bucket id (argmin over the distance array). */
  def bucketId(vec: Column, centroids: Array[Array[Double]]): Column = {
    val d = distances(vec, centroids)
    array_position(d, array_min(d)).cast("int") - 1
  }

  /** The `nprobe` nearest bucket ids for a query vector. */
  def probeBuckets(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val d = distances(vec, centroids)
    slice(
      transform(
        array_sort(zip_with(
          d, sequence(lit(0), lit(centroids.length - 1)),
          (dist, idx) => struct(dist.as("d"), idx.as("i")))),
        x => x.getField("i")),
      1, nprobe)
  }

  /** IVF ANN top-k: corpus assigned to its nearest bucket, queries
    * probe their `nprobe` nearest buckets, candidates scored by exact
    * cosine, top-k per query.
    */
  def annTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, numCentroids: Int, nprobe: Int): DataFrame =
    annTopKWith(corpus, queries, idCol, vecCol, k,
      trainCentroids(corpus, vecCol, numCentroids), nprobe)

  /** [[annTopK]] from PRECOMPUTED centroids — everything downstream of
    * training (assignment argmin, nprobe probing, candidate join,
    * cosine top-k) is pure expression logic over the centroid model,
    * so given the centroids as a parquet fixture the whole pipeline
    * replays bit-for-bit in ANSI SQL (q_knn_ivf's full oracle gate;
    * only the Lloyd loop itself stays spec-gated). This is also the
    * production split at 100 TB: the index (k·dim doubles) is model
    * metadata trained once and stored, while per-cycle queries pay
    * only assignment + probing.
    */
  def annTopKWith(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    annTopKAssigned(assignCorpus(corpus, idCol, vecCol, centroids),
      queries, idCol, vecCol, k, centroids, nprobe)

  /** The corpus half of the IVF index: each row assigned to its
    * nearest centroid bucket, with the vector and its norm carried for
    * verification — (`neighbor_id`, `nvec`, `nn`, `bucket`). At 100 TB
    * this is STORED INDEX STATE next to the centroids: it changes only
    * when the corpus does, so a production deployment materializes it
    * once per corpus version and every query cycle pays only
    * [[annTopKAssigned]] (probing + candidate join + top-k), never
    * re-assignment (the x_ivf_query_only rehearsal entry prices
    * exactly this split).
    */
  def assignCorpus(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    corpus
      .select(col(idCol), col(vecCol)).repartition(par) // 1-row-group scans
      .select(
        col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        Vec.norm(col(vecCol)).as("nn"),
        bucketId(col(vecCol), centroids).as("bucket"))
  }

  /** The query half: probe the `nprobe` nearest buckets of a
    * PRE-ASSIGNED corpus ([[assignCorpus]]'s output, freshly computed
    * or read back from storage), score candidates by exact cosine,
    * top-k per query. Same expressions as the fused [[annTopKWith]],
    * so results are bit-identical either way.
    */
  def annTopKAssigned(
      assigned: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val c = assigned
    // probe-bucket array persists before the explode so the centroid
    // distance expressions aren't re-evaluated per exploded row
    // (project collapse — see Dedup.jaccardPairs)
    val qB = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec"),
      Vec.norm(col(vecCol)).as("qn"),
      probeBuckets(col(vecCol), centroids, nprobe).as("qbuckets")).persistTracked()
    val q = qB.select(col("query_id"), col("qvec"), col("qn"),
      explode(col("qbuckets")).as("qbucket"))
    // candidate count observed for the bench artifact (VERDICT r12
    // item 5): rows materialized by the probe-bucket join
    val scored = graft.tools.RunMetrics.observedCount("cand_ivf",
        c.join(q,
          col("bucket") === col("qbucket") &&
            col("query_id") =!= col("neighbor_id")))
      .withColumn("cosine",
        Vec.dot(col("qvec"), col("nvec")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cosine"))
  }
}
