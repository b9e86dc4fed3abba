package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export: the "global shuffle + split into N
  * files" step between a curated corpus and a training run. The
  * reference's parallel-export pattern (`Integration/Scripts/
  * Перелив данных из PostgreSQL в ClickHouse.md:245-251` — fixed
  * worker count, table-hash work split) has the same shape; here the
  * split must additionally be REPRODUCIBLE: re-running the export on
  * the same corpus — at any cluster layout — must produce the same
  * shard membership and the same intra-shard order, so a training job
  * can be resumed, audited, or exactly re-created.
  *
  * Both properties come from the same device ([[graft.queries.Reshape]]
  * hash-sampling's md5 trick, widened): shard = md5(id) mod N and
  * intra-shard order = md5(id) — a cryptographic hash of a stable key
  * is simultaneously the shuffle (adjacent source rows scatter across
  * shards and positions) and the determinism (nothing depends on
  * partitioning, timing, or engine RNG). No `orderBy(rand())`
  * anywhere — an RNG shuffle is irreproducible BY DESIGN and a resume
  * hazard.
  *
  * 100 TB posture: assignment is a per-row projection; the export is
  * one hash-partitioned write (`repartition(N, shard)` +
  * `sortWithinPartitions`) — a single exchange, each shard written by
  * exactly one task, append-free and rerunnable. Shard sizes
  * concentrate at n/N ± O(√(n/N)) (md5 is uniform), asserted in
  * ShardSpec.
  */
object Shard {

  /** 60 bits of md5 as a non-negative long — enough that mod-N bias
    * (≤ N/2^60) is unmeasurable for any practical shard count.
    */
  private def h60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Stable shard id in [0, n) for each row. */
  def assign(id: Column, n: Int): Column = {
    require(n >= 1, s"shard count must be ≥ 1, got $n")
    h60(id) % n
  }

  /** The export layout: `__shard` column added, one output partition
    * per shard, rows ordered by (hash, id) within each — the
    * deterministic global shuffle.
    *
    * The sort leads with `__shard` deliberately: the partitioned
    * writer REQUIRES its input ordered by the partition column and
    * inserts its own sort otherwise — which would let EliminateSorts
    * drop this one, silently replacing the hash order with stable
    * source order (caught by ShardSpec's scatter test). With `__shard`
    * first, the writer's requirement is already satisfied and the
    * (hash, id) order reaches the files.
    */
  def layout(df: DataFrame, id: Column, n: Int): DataFrame =
    df.withColumn("__shard", assign(id, n))
      .repartition(n, col("__shard"))
      .sortWithinPartitions(col("__shard"), md5(id.cast("string")), id)

  /** Write `df` as `n` shard directories (`__shard=K`) under `root`
    * and return the per-shard manifest (shard, n_rows) actually
    * written — reading it back from the output, not trusting the plan.
    */
  def export(df: DataFrame, root: String, id: Column, n: Int): DataFrame = {
    val spark = df.sparkSession
    layout(df, id, n).write
      .partitionBy("__shard").mode("overwrite").parquet(root)
    spark.read.parquet(root)
      .groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
