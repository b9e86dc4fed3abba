package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary lookup (SURVEY J6; reference: Datamarts/Правильное
  * построение витрины с множественными агрегациями.md:54-76 —
  * `CREATE DICTIONARY … LAYOUT(HASHED())` + `dictGet` inside
  * projections).
  *
  * Two forms, matching the two ClickHouse usages:
  *  - `asMap`: the dictionary as a LITERAL map expression — an O(1)
  *    per-row lookup usable inside any projection (the `dictGet`
  *    shape). The dictionary is collected to the driver and ships
  *    with the plan, so it must be dictionary-sized (≤ a few MB) —
  *    same constraint ClickHouse's HASHED layout imposes.
  *  - bigger reference tables: use `Lookup` (broadcast join) instead.
  *    [[get]] picks between the two automatically.
  */
object Dict {

  /** Literal-map dictionaries above this row count refuse ([[asMap]])
    * or reroute to the broadcast join ([[get]]). */
  val MaxLiteralRows = 1000000

  /** Collect a small (key, value) DataFrame into a literal map Column.
    * Keys/values must be simple scalar types.
    *
    * The size guard runs BEFORE materialization: a mis-pointed
    * million-row "dictionary" fails fast on a bounded
    * `limit(N + 1).collect()`, never by OOMing the driver on an
    * unbounded collect (same bounded-probe pattern as Mix.targets).
    */
  def asMap(dict: DataFrame, keyCol: String, valueCol: String): Column = {
    val rows =
      dict.select(col(keyCol), col(valueCol)).limit(MaxLiteralRows + 1).collect()
    require(rows.length <= MaxLiteralRows,
      s"dictionary too large for a literal map (> $MaxLiteralRows rows); " +
        "use Dict.get or Lookup (broadcast join) instead")
    map(rows.flatMap(r => Seq(lit(r.get(0)), lit(r.get(1)))).toIndexedSeq: _*)
  }

  /** `dictGet(dict, key)` with a default for missing keys. */
  def dictGet(dictMap: Column, key: Column, default: Column): Column =
    coalesce(element_at(dictMap, key), default)

  /** Size-adaptive `dictGet`: add `outCol = dict[keyOf]` (with
    * `default` for misses) to `df`, routing by dictionary size — a
    * literal map when it fits ([[asMap]]), a broadcast left join when
    * it does not. The probe is a bounded `limit(N + 1).count()`, so
    * oversized dictionaries never reach the driver.
    */
  def get(
      df: DataFrame, dict: DataFrame, keyCol: String, valueCol: String,
      keyOf: Column, outCol: String,
      default: Column = lit(null)): DataFrame = {
    val kv = dict.select(col(keyCol), col(valueCol))
    if (kv.limit(MaxLiteralRows + 1).count() <= MaxLiteralRows)
      df.withColumn(outCol, dictGet(asMap(kv, keyCol, valueCol), keyOf, default))
    else {
      val r = broadcast(kv.withColumnRenamed(keyCol, "__dict_key")
        .withColumnRenamed(valueCol, "__dict_val"))
      df.join(r, keyOf === r("__dict_key"), "left")
        .withColumn(outCol, coalesce(r("__dict_val"), default))
        .drop("__dict_key", "__dict_val")
    }
  }
}
