package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-deterministic grouped collection.
  *
  * The reference leans heavily on ordered grouped arrays:
  * `groupArray(x)` into array columns (Datamarts/Правильное построение
  * витрины с множественными агрегациями.md:23,63) and
  * `STRING_AGG(expr, sep ORDER BY pos)` for codegen
  * (Integration/Scripts/Скрипт для миграции….md:29-55). Spark's
  * `collect_list` order is partition-dependent, so every collection
  * here carries an explicit sort key: collect `struct(ord, v)`, sort
  * the array, project the value — deterministic on any cluster layout,
  * which is what makes the result stable at 1000-executor scale and
  * hash-comparable against a single-node oracle.
  */
object OrderedAgg {

  /** `groupArray(v)` ordered by `ord` (ascending). */
  def sortedList(v: Column, ord: Column): Column =
    transform(
      array_sort(collect_list(struct(ord.as("o"), v.as("v")))),
      x => x.getField("v"))

  /** Multi-attribute ordered collection keeping positional linkage —
    * the `arrayZip(groupArray(a), groupArray(b))` shape
    * (Datamarts/…витрины….md:119-133) collapsed into one pass:
    * collect structs, sort by `ord`, done. Field names of `vs` are
    * preserved.
    */
  def sortedZip(ord: Column, vs: (String, Column)*): Column =
    transform(
      array_sort(collect_list(struct(
        (ord.as("__ord") +: vs.map { case (n, c) => c.as(n) }): _*))),
      x => struct(vs.map { case (n, _) => x.getField(n).as(n) }: _*))

  /** `STRING_AGG(v, sep ORDER BY ord)`. */
  def stringAgg(v: Column, ord: Column, sep: String): Column =
    array_join(sortedList(v, ord), sep)
}
