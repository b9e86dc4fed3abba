package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a testdata dir, with an
  * optional ANSI-SQL oracle the driver runs in DuckDB on the same
  * parquet. Column names MUST agree between `run`'s output and the
  * oracle's SELECT list — the correctness gate sorts columns by name
  * before hashing.
  *
  * The oracle is held as a THUNK and rendered when [[oracle]] is read
  * (Verify dumps oracle_sql.json AFTER running every query), so an
  * oracle that replays a query-written fixture (q_knn_ivf's centroid
  * parquet) can embed the path of the dataset dir the query actually
  * ran against instead of one global path two interleaved dirs would
  * clobber (ADVICE r12). Oracle expressions must stay pure apart from
  * such run-recorded paths.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracleFn: Option[() => String]) {
  def oracle: Option[String] = oracleFn.map(_())
}

object Q {
  /** The dataset dir oracle thunks render for. Set by [[graft.Verify]]
    * (and by any test that renders oracles) BEFORE reading `oracle`,
    * so an oracle that replays run-recorded state (q_knn_ivf's
    * centroid fixture, the SRP queries' derived bit count) reads the
    * record keyed by THIS dir instead of a last-run-wins global —
    * fully interleaved runs against two dirs can no longer clobber
    * each other's replay parameters (ADVICE r13).
    */
  @volatile var renderDir: String = "/root/testdata/sf0.01"

  def apply(name: String, oracle: => String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(() => oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
