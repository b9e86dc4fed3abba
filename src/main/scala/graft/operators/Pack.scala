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

  /** Context-window chunking — the step between a cleaned corpus and
    * [[pack]]: split each document's token stream into windows of
    * `window` tokens advancing by `window - overlap` (the standard
    * overlapping chunker in front of a fixed-context trainer). The
    * final window may be short; a window is emitted only if it adds
    * tokens the previous one did not already cover (`start = 0`, or
    * `previous start + window < n`), so a short tail fully contained
    * in its predecessor is dropped rather than re-emitted. Zero-token
    * documents produce no chunks.
    *
    * Pure per-row Catalyst expressions (sequence/filter/slice/
    * array_join inside whole-stage codegen) — NO shuffle, no UDF; the
    * operator scales with the scan. Output: `idCol`, `chunk_id`
    * (0-based window ordinal), `n_tok` (tokens in this chunk),
    * `chunk_text` (the window re-joined with single spaces —
    * tokenization is whitespace, so re-joining is lossless up to
    * whitespace runs, same convention as the oracle).
    */
  def chunkWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): $overlap vs $window")
    val stride = window - overlap
    val t = graft.functions.Text.tokens(col(textCol))
    df.select(col(idCol), t.as("__t"))
      .filter(size(col("__t")) > 0)
      .select(col(idCol), col("__t"),
        explode(filter(
          sequence(lit(0), size(col("__t")) - 1, lit(stride)),
          s => s === 0 || (s - stride + window) < size(col("__t"))))
          .as("__s"))
      .select(
        col(idCol),
        (col("__s") / stride).cast("long").as("chunk_id"),
        least(lit(window), size(col("__t")) - col("__s")).cast("long")
          .as("n_tok"),
        array_join(slice(col("__t"), col("__s") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
