package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a testdata dir, with an
  * optional ANSI-SQL oracle the driver runs in DuckDB on the same
  * parquet. Column names MUST agree between `run`'s output and the
  * oracle's SELECT list — the correctness gate sorts columns by name
  * before hashing.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
