package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the large-scale training-data pipeline
  * (BASELINE.json north star): tokenization, shingling, normalization,
  * fingerprinting, language-ID and quality scoring. All pure Column
  * expressions — codegen'd, no UDFs, fully distributed.
  *
  * Cross-engine determinism: every kernel is also expressible in ANSI
  * SQL (DuckDB lambdas) with identical semantics, which is what the
  * correctness oracle runs.
  */
object Text {

  /** Whitespace tokens, empties dropped (leading/trailing/multiple
    * separators produce no empty tokens in either engine).
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Word n-gram shingles over a token array (already-distinct NOT
    * applied — compose with `array_distinct`). Empty when fewer than
    * `n` tokens (guarded: Spark's `sequence` would otherwise count
    * DOWN for start > stop).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Duplicate-token ratio: 1 − |distinct tokens| / |tokens| — the
    * repetition/boilerplate signal of quality filtering (a high ratio
    * marks template or degenerate text). 0.0 for empty documents.
    * Pure double arithmetic on counts, so bit-identical across
    * engines.
    */
  def repetitionRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0)).otherwise(
      lit(1.0) -
        size(array_distinct(t)).cast("double") / size(t).cast("double"))
  }

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * non-alphanumerics (keeping spaces), collapse whitespace, trim.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""),
      "\\s+", " "))

  /** Deterministic document fingerprint: md5 of the normalized text —
    * the exact-dedup key. (md5 hex is identical across engines;
    * xxhash64 is not exposed by the oracle engine.)
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Stopword-overlap score: how many DISTINCT members of `words`
    * appear in the token array.
    */
  def overlapScore(toks: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), array(words.map(lit): _*)))
      .cast("long")

  /** Punctuation character count. */
  def punctCount(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("long")

  /** Mean token length as an exact double ratio (identical division in
    * both engines given identical integer inputs).
    */
  def avgTokenLen(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      size(t).cast("double")
  }
}
