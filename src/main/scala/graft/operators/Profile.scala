package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Profiling (reference: …/Глава 03…md:81-85 Data Profiling Task;
  * …/Глава 10…md:18-29 — NULL %, value distribution, key-candidate
  * checks before building ETL).
  *
  * One aggregate pass computes (count, nulls, distinct) for every
  * column, then a `stack` reshapes to one row per column — a single
  * scan regardless of column count. `countDistinct` is exact (needed
  * for key-candidate detection, where approx would lie); swap in
  * `approx_count_distinct` for 100 TB interactive profiling.
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct) per requested column. */
  def apply(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __n_$c, __null_$c, __dist_$c")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_rows, n_null, n_distinct)")
  }

  /** Key candidates: columns whose distinct count equals row count. */
  def keyCandidates(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val p = apply(df, cols)
      .filter(col("n_distinct") === col("n_rows") - col("n_null"))
      .filter(col("n_null") === 0)
    p.select("col_name").collect().map(_.getString(0)).toSeq
  }
}
