package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExactAgg
import graft.sources.{CsvIngest, TypeMatrix}

/** Source/sink surface exercised end-to-end (SURVEY §2.1): the
  * migration pipeline's interchange round-trip — export to the
  * reference's CSV dialect ('^' delimiter, literal NULL), land in an
  * all-string staging, typed-promote through the §1.2 matrix, then
  * aggregate. The oracle aggregates the original parquet directly, so
  * the query proves the text round-trip is lossless.
  */
object SourceQueries {

  def all: Seq[Q] = Seq(csvRoundtrip)

  val csvRoundtrip: Q = Q(
    "q_csv_roundtrip",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    // absolute path: the driver may invoke Verify from any CWD
    val out = s"/root/repo/target/tmp/interchange_${new java.io.File(dir).getName}"
    CsvIngest.writeInterchange(cust, out)
    val meta = TypeMatrix.introspect(cust.schema)
    val target = TypeMatrix.structType(meta)
    val (good, bad) = CsvIngest.splitCorrupt(
      CsvIngest.readStaging(s, out, target), runId = "roundtrip")
    CsvIngest.enforceBudget(good.count(), bad.count())
    val (typed, _) = CsvIngest.promote(good, target, runId = "roundtrip")
    typed.groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        ExactAgg.dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }
}
