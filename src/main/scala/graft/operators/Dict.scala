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
  */
object Dict {

  /** Collect a small (key, value) DataFrame into a literal map Column.
    * Keys/values must be simple scalar types.
    */
  def asMap(dict: DataFrame, keyCol: String, valueCol: String): Column = {
    val rows = dict.select(col(keyCol), col(valueCol)).collect()
    require(rows.length <= 1000000, "dictionary too large for a literal map")
    map(rows.flatMap(r => Seq(lit(r.get(0)), lit(r.get(1)))).toIndexedSeq: _*)
  }

  /** `dictGet(dict, key)` with a default for missing keys. */
  def dictGet(dictMap: Column, key: Column, default: Column): Column =
    coalesce(element_at(dictMap, key), default)
}
