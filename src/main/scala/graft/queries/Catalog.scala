package graft.queries

/** Aggregates every query module into the driver-facing maps. */
object Catalog {
  def all: Seq[Q] = {
    val qs =
      Relational.all ++ Reshape.all ++ Scalar.all ++ CdcQueries.all ++
        TextQueries.all ++ VectorQueries.all ++ SourceQueries.all ++
        QualityQueries.all ++ StreamQueries.all ++ AnalyticsQueries.all ++
        DagQueries.all
    // a duplicate name would silently drop a query from the toMap
    // below — and with it from the correctness gate
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate catalog query names: ${dups.mkString(",")}")
    qs
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
