package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch preparation: assign each
  * document to a fixed-token-budget pack (the sample-packing step
  * between a cleaned corpus and a training run — documents
  * concatenate into ~budget-token sequences, so short documents don't
  * waste padding).
  *
  * Semantics: GREEDY SEQUENTIAL packing in id order — a document
  * starts in the pack where its shard's running token total stood
  * (pack = ⌊prior-cumsum / budget⌋), so packs fill to the budget and
  * may overflow by at most one document (the standard streaming pack;
  * deterministic, restart-safe, and exactly expressible in window
  * SQL, which is what the oracle checks).
  *
  * Scale shape: packing is INHERENTLY ordered within a pack stream —
  * the assignment is defined by the running sum — so parallelism
  * comes from sharding: each shard packs independently under one
  * window (one shuffle on the shard key), and the shard count is the
  * 100 TB knob (thousands of shards ⇒ thousands of independent pack
  * streams, each a modest sorted run). A single global stream would
  * serialize; that is a property of the operation's definition, not
  * of this implementation.
  */
object Pack {

  /** @param weight per-row cost column (token count)
    * @param numShards independent pack streams; rows shard by
    *                  `idCol % numShards` (numeric ids — deterministic
    *                  and oracle-reproducible, unlike a hash)
    * @return input columns + `shard` + `pack_id`
    */
  def pack(
      df: DataFrame, idCol: String, weight: Column,
      budget: Long, numShards: Int): DataFrame = {
    require(budget > 0 && numShards > 0, "pack: budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(numShards.toLong)))
      .withColumn("__w", weight.cast("long"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("__w")) / budget.toDouble).cast("long"))
      .drop("__cum", "__w")
  }
}
