package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join (100 TB posture; SURVEY §7.2 build-plan note:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting remains the tool when one side must be replicated anyway
  * (e.g. a medium-size dimension too big to broadcast joined against a
  * fact with a few giant keys). The left (skewed) side gets a random
  * salt in [0, factor); the right side replicates each row `factor`
  * times; the join key becomes (key, salt) — hot keys spread over
  * `factor` reducers.
  *
  * Salt uses a DETERMINISTIC hash of a caller-chosen distributor
  * column (not `rand()`): results stay reproducible and retry-safe
  * (a task retry re-derives the same salt — `rand()` would not).
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame, other: DataFrame,
      key: String, otherKey: String,
      distributor: String, factor: Int,
      joinType: String = "inner"): DataFrame = {
    // The right side is replicated `factor` times, so join types that
    // emit unmatched RIGHT rows ("right"/"full") would duplicate each
    // unmatched right row factor times — restrict to the salt-correct
    // family.
    require(
      Set("inner", "left", "left_outer", "left_semi", "left_anti")(joinType),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(col(distributor)), lit(factor.toLong)))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    l.join(r,
        l(key) === r(otherKey) && l("__salt") === r("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Top-k hottest keys — the diagnostic for picking `factor`. */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(k)
}
