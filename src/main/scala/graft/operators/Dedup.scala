package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3
import graft.functions.Text

/** Document deduplication for the training-data pipeline: exact
  * (fingerprint hash), exact-Jaccard with shingle blocking, MinHash
  * LSH (the 100 TB path), and SimHash. Every operator is a pure
  * DataFrame transform: blocking keys make the candidate set linear
  * in data size (no O(n²) cross join anywhere), shuffles happen only
  * on blocking keys, and per-key group sizes are bounded by shingle
  * selectivity — the properties that survive a 1000-executor scale-up.
  */
object Dedup {

  /** Exact dedup by normalized-text fingerprint: first (lowest id)
    * document per fingerprint is canonical, the rest are flagged with
    * their canonical's id. One shuffle on the fingerprint.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    df.withColumn("fp", Text.fingerprint(col(textCol)))
      .withColumn("canonical_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
  }

  /** Distinct word-n-gram shingle set per document. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(
      col(idCol),
      array_distinct(Text.wordShingles(Text.tokens(col(textCol)), n)).as("sh"))

  /** Exact n-gram-Jaccard near-dup pairs with PREFIX-FILTERED shingle
    * blocking (the PPJoin family): under any global shingle order, a
    * pair with J ≥ τ must overlap in the first |X|−⌈τ·|X|⌉+1 shingles
    * of each side (since J ≥ τ ⇒ |A∩B| ≥ τ·|A|), so the blocking join
    * explodes only that prefix — candidate volume shrinks by ~(1−τ)²
    * versus all-shingle blocking, with ZERO recall loss. Candidates
    * travel as narrow id pairs; full shingle sets re-attach for the
    * exact Jaccard verification. The oracle replays full blocking, so
    * the equality of results proves the filter lossless. The
    * oracle-checkable reference for the LSH variants below.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double): DataFrame = {
    // Persisted: feeds the two blocking sides + the verification join.
    val sh = shingles(df, idCol, textCol, n).persist()
    val prefixLen = (size(col("sh")) -
      ceil(lit(tau) * size(col("sh"))).cast("int") + 1)
    val exploded = sh.select(
      col(idCol).as("id"),
      size(col("sh")).as("nsh"),
      explode(slice(array_sort(col("sh")), lit(1), greatest(prefixLen, lit(1))))
        .as("g"))
    val a = exploded.select(col("id").as("d1"), col("nsh").as("n1"), col("g"))
    val b = exploded.select(col("id").as("d2"), col("nsh").as("n2"),
      col("g").as("g2"))
    // length filter (PPJoin): J ≥ τ requires τ·|B| ≤ |A| ≤ |B|/τ —
    // prunes size-incompatible pairs inside the join, before the
    // dedup shuffle
    val cands = a.join(b,
        col("g") === col("g2") && col("d1") < col("d2") &&
          col("n1") * lit(tau) <= col("n2") &&
          col("n2") * lit(tau) <= col("n1"))
      .select("d1", "d2").dropDuplicates("d1", "d2")
    cands
      .join(sh.select(col(idCol).as("d1"), col("sh").as("sh1")), "d1")
      .join(sh.select(col(idCol).as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** MinHash signature. Each shingle is hashed ONCE (`xxhash64`); the
    * `numPerms` permutations are affine maps `a_p*h + b_p` over that
    * 64-bit value (universal hashing, wrap-around multiplication) —
    * 1 string hash + numPerms multiply-adds per shingle instead of
    * numPerms string hashes. Pure expressions, computed in the scan
    * stage.
    */
  def minhashSignature(sh: Column, numPerms: Int): Column =
    graft.plans.MinHashSig(sh, numPerms)

  /** MinHash-LSH near-dup pairs (the scale path): band the signature
    * (`bands` × `rowsPerBand`), bucket-join on (band index, band
    * hash), then verify candidates with TRUE Jaccard ≥ tau so the
    * output has no false positives — LSH only bounds recall.
    * At 100 TB: the only shuffles are on band buckets and pair keys;
    * signature width is a constant (bands*rowsPerBand longs/doc).
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    // Two persists, both deliberately NARROW: the shingle sets (one
    // copy per doc — the verification join probes them for the few
    // candidates) and the banded keys (id+band+hash, three scalars per
    // band row). Carrying the shingle arrays through the ×bands
    // explosion would multiply the cached footprint by the band count
    // and evict under memory pressure, silently recomputing from text.
    val sh = shingles(df, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .persist()
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
      .select(
        col(idCol).as("id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          i => hash(slice(col("sig"), i * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandhash")
      .persist()
    val a = banded.select(col("id").as("d1"), col("band"), col("bandhash"))
    val b = banded.select(col("id").as("d2"), col("band").as("band2"),
      col("bandhash").as("bandhash2"))
    val cands = a.join(b,
        col("band") === col("band2") && col("bandhash") === col("bandhash2") &&
          col("d1") < col("d2"))
      .select("d1", "d2").dropDuplicates("d1", "d2")
    cands
      .join(sh.select(col(idCol).as("d1"), col("sh").as("sh1")), "d1")
      .join(sh.select(col(idCol).as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens. MurmurHash3 (JVM-stable,
    * seed-fixed) provides the per-token 64 bits; the signature is the
    * sign vector of per-bit vote counts. A narrow `map` — no shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        val votes = new Array[Int](64)
        toks.foreach { t =>
          val h1 = MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xffffffffL
          val h2 = MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL
          val h = (h1 << 32) | h2
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        (id, sig)
      }
      .toDF(idCol, "simhash")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Banding
    * by pigeonhole: distance ≤ 3 ⇒ at least one of 4 16-bit blocks is
    * identical, so candidates join on (block index, block value) —
    * never all-pairs.
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-block banding guarantees recall only for maxDist <= 3")
    val blocks = sigs.select(
      col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "blk")
      .withColumnRenamed("col", "blkval")
      .persist() // both join sides scan this; avoid recomputing simhash
    val a = blocks.select(col("id").as("d1"), col("simhash").as("s1"),
      col("blk"), col("blkval"))
    val b = blocks.select(col("id").as("d2"), col("simhash").as("s2"),
      col("blk").as("blk2"), col("blkval").as("blkval2"))
    a.join(b,
        col("blk") === col("blk2") && col("blkval") === col("blkval2") &&
          col("d1") < col("d2"))
      .select("d1", "d2", "s1", "s2").dropDuplicates("d1", "d2")
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }
}
