package graft.queries

/** Aggregates every query module into the driver-facing maps. */
object Catalog {
  def all: Seq[Q] =
    Relational.all ++ Reshape.all ++ Scalar.all ++ CdcQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ SourceQueries.all ++
      QualityQueries.all ++ StreamQueries.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
