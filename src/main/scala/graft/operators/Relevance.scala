package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-relevance scoring for training-data curation — the retrieval
  * and language-model lenses a 100-TB pipeline filters with:
  *
  *   - [[bm25]]: Okapi BM25 scores of every document against a fixed
  *     query-term set (Robertson et al., TREC-3 1994; Robertson &
  *     Zaragoza 2009) — the standard device for "pull the documents
  *     most like this probe set" (targeted subcorpus selection,
  *     eval-adjacent retrieval audits).
  *   - [[bigramNll]]: per-document cross-entropy under an add-k
  *     smoothed bigram model trained on the corpus itself (Jurafsky &
  *     Martin ch. 3, Lidstone smoothing) — the classic cheap
  *     perplexity proxy for quality filtering: word salad and
  *     boilerplate sit in the tail of the corpus' own n-gram
  *     distribution.
  *
  * Scale shape: both are linear scans + keyed aggregations. BM25
  * prunes the token stream to the query terms BEFORE any shuffle (the
  * per-doc-term frame is |queryTerms|-bounded per doc) and the df
  * side is ≤ |queryTerms| rows — broadcast by construction. The LM's
  * count tables are vocabulary/bigram-type-sized (≪ corpus; the joins
  * shuffle on token keys and AQE broadcasts them when small). Driver
  * state is three bounded scalars (N, Σdl, |V|) — never data rows.
  *
  * Float portability (the PSI rule, AnalyticsQueries.driftPsi): every
  * per-term contribution derives from exact integer counts, the
  * per-document fold runs in a deterministic order (term asc / bigram
  * position asc) from an exact 0.0 seed, and the single rounding to 9
  * decimals happens once at the end — so a DuckDB oracle replays the
  * whole computation to the bit modulo last-ulp ln() differences the
  * rounding absorbs.
  */
object Relevance {

  /** Whitespace tokens, empties dropped — the q_freq_tokens device
    * (`string_split(text, ' ')` + non-empty filter on the oracle
    * side), so token identity is already proven portable.
    */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      filter(split(col(textCol), " "), t => t =!= "").as("t"))

  /** BM25 score of every document containing at least one query term.
    * Output: (doc_id, score) — score rounded to 9 decimals, docs with
    * no query-term hit absent (sparse retrieval semantics).
    *
    * Term contribution, mirrored textually by the SQL oracle:
    * {{{
    *   idf  = ln((N - df + 0.5)/(df + 0.5) + 1.0)
    *   term = idf * (tf*(k1+1.0)) / (tf + k1*((1.0-b) + (b*dl)/avgdl))
    * }}}
    * with the +1 idf variant (Lucene's, never negative) and
    * avgdl = Σdl/N computed as one exact-integer division.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: need at least one query term")
    val toks = tokens(docs, idCol, textCol)
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    // two bounded driver scalars (corpus size, total length), not data
    val g = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
    val n = g.getLong(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = g.getLong(1).toDouble / n
    val tf = toks.select(col("doc_id"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*)) // prune BEFORE the shuffle
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val idf = log(
      ((lit(n) - col("df")) + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val term = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") +
        lit(k1) * ((lit(1.0) - lit(b)) + (lit(b) * col("dl")) / lit(avgdl)))
    tf.join(broadcast(dfq), "tok") // ≤ |queryTerms| rows
      .join(dl, "doc_id")
      .select(col("doc_id"), col("tok"), term.as("term"))
      .groupBy(col("doc_id"))
      // ordered fold (term asc) from an exact 0.0 seed — the oracle's
      // list_reduce(list(term ORDER BY tok)) lands on the same bits
      .agg(aggregate(
        transform(
          sort_array(collect_list(struct(col("tok"), col("term")))),
          s => s.getField("term")),
        lit(0.0), _ + _).as("raw"))
      .select(col("doc_id"), round(col("raw"), 9).as("score"))
  }

  /** Per-document average negative log-likelihood under an add-k
    * bigram LM trained on the corpus itself. Output: (doc_id,
    * n_bigrams, nll) for every document with ≥ 2 tokens — nll rounded
    * to 9 decimals; higher = less like the corpus (the quality-filter
    * cut is the caller's percentile choice).
    *
    * p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·|V|) with c(w1) the plain
    * unigram count and |V| the unigram vocabulary — every probability
    * a ratio of exact integers, so the only float divergence is ln()'s
    * last ulp.
    */
  def bigramNll(
      docs: DataFrame, idCol: String, textCol: String,
      addK: Double = 1.0): DataFrame = {
    val toks = tokens(docs, idCol, textCol)
    val uni = toks.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.count() // bounded driver scalar
    // adjacent-pair frame via two shifted slices zipped in place — no
    // self-join, no window: one projection per doc row
    val nT = size(col("t"))
    val bg = toks.filter(nT >= 2)
      .select(col("doc_id"), posexplode(zip_with(
        slice(col("t"), lit(1), nT - 1), slice(col("t"), lit(2), nT - 1),
        (a, w) => struct(a.as("w1"), w.as("w2")))))
      .select(col("doc_id"), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val lp = log(
      (col("c2") + lit(addK)) / (col("c1") + lit(addK) * lit(vocab)))
    bg.join(c2, Seq("w1", "w2")).join(uni, Seq("w1"))
      .select(col("doc_id"), col("pos"), lp.as("lp"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // position-ordered fold, exact 0.0 seed (the PSI device)
        aggregate(
          transform(
            sort_array(collect_list(struct(col("pos"), col("lp")))),
            s => s.getField("lp")),
          lit(0.0), _ + _).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"),
        round((-col("sum_lp")) / col("n_bigrams"), 9).as("nll"))
  }
}
