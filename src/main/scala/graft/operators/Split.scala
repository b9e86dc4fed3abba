package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SSIS Conditional Split (reference: …/Глава 05…md:75, …/Глава
  * 08…md:110): route each row to the FIRST output whose predicate
  * matches, with a default output for the rest.
  *
  * Spark-first shape: one `when` chain producing a route tag in a
  * single codegen'd pass — N separate `filter(!p1 && … && pN)` scans
  * would read the input N times. Downstream consumers filter on the
  * tag; at scale that is a column predicate pushed into each branch.
  */
object Split {

  /** Adds `tagCol` holding the name of the first matching route, or
    * `default` when none match.
    */
  def tag(
      df: DataFrame,
      routes: Seq[(String, Column)],
      default: String = "default",
      tagCol: String = "route"): DataFrame = {
    val tagged = routes.foldLeft(lit(null).cast("string")) {
      case (acc, (name, pred)) => coalesce(acc, when(pred, name))
    }
    df.withColumn(tagCol, coalesce(tagged, lit(default)))
  }

  /** Materialized per-route DataFrames (match + default last). Parent
    * should be cached by the caller if all branches are consumed.
    */
  def outputs(
      df: DataFrame,
      routes: Seq[(String, Column)],
      default: String = "default"): Map[String, DataFrame] = {
    val tagged = tag(df, routes, default)
    (routes.map(_._1) :+ default)
      .map(n => n -> tagged.filter(col("route") === n).drop("route"))
      .toMap
  }
}
