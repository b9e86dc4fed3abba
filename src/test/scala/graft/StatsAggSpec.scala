package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Manifest-stats aggregate pushdown (StatsAgg + GraftAggScanBuilder):
  * unfiltered COUNT/MIN/MAX through the SQL catalog answer from
  * manifest metadata alone — planned as a LocalTableScan, zero parquet
  * files opened — and every inexactness refuses into the normal scan,
  * never into a wrong answer.
  */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_statsagg_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.sa", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sa.warehouse", wh)
    spark.sql("CREATE NAMESPACE sa.t")
  }

  private def leaves(p: SparkPlan): Seq[SparkPlan] = p.collectLeaves().flatMap {
    case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
    case l => Seq(l)
  }

  /** The query never touches data: its only leaf is a LocalTableScan. */
  private def assertLocal(df: DataFrame): Unit = {
    val ls = leaves(df.queryExecution.executedPlan)
    assert(ls.nonEmpty && ls.forall(_.isInstanceOf[LocalTableScanExec]),
      s"expected manifest-stats LocalTableScan, got:\n${df.queryExecution.executedPlan}")
  }

  /** The query fell back to a real parquet scan. */
  private def assertScans(df: DataFrame): Unit = {
    val ls = leaves(df.queryExecution.executedPlan)
    assert(ls.exists(_.isInstanceOf[BatchScanExec]),
      s"expected a parquet BatchScan fallback, got:\n${df.queryExecution.executedPlan}")
  }

  test("COUNT(*) / COUNT(col) / MIN / MAX answer from the manifest, zero files read") {
    cat
    spark.sql("CREATE TABLE sa.t.m (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql("INSERT INTO sa.t.m VALUES (1,'A',1.5),(2,'A',NULL),(3,'B',-2.25),(4,'B',8.0)")
    spark.sql("INSERT INTO sa.t.m VALUES (5,'C',NULL)")

    val q = spark.sql(
      "SELECT count(*) AS n, count(v) AS nv, min(k) AS mnk, max(k) AS mxk, " +
        "min(v) AS mnv, max(v) AS mxv FROM sa.t.m")
    assertLocal(q)
    assert(q.collect().toSeq == Seq(Row(5L, 3L, 1L, 5L, -2.25, 8.0)))
    // string min/max on the short partition column also answer exactly
    val qs = spark.sql("SELECT min(p) AS a, max(p) AS b FROM sa.t.m")
    assertLocal(qs)
    assert(qs.collect().toSeq == Seq(Row("A", "C")))
  }

  test("GROUP BY the partition column stays metadata-only, per-group exact") {
    cat
    val q = spark.sql(
      "SELECT p, count(*) AS n, count(v) AS nv, max(v) AS mx " +
        "FROM sa.t.m GROUP BY p ORDER BY p")
    assertLocal(q)
    assert(q.collect().toSeq == Seq(
      Row("A", 2L, 1L, 1.5), Row("B", 2L, 2L, 8.0), Row("C", 1L, 0L, null)))
  }

  test("grouped pushdown refuses entries without the partition prefix — no NULL-group lie") {
    cat
    spark.sql("CREATE TABLE sa.t.mix (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO sa.t.mix VALUES (1,'A'),(2,'B')")
    // a programmatic append WITHOUT the layout spec: its entries carry
    // an EMPTY partition string on a catalog-partitioned table
    graft.sources.TxTable.append(
      Seq((3L, "A")).toDF("k", "p"), s"$wh/t/mix", partitionCol = None)
    // the grouped fold can no longer attribute every file — it must
    // fall back to a real scan and still answer exactly
    val g = spark.sql(
      "SELECT p, count(*) AS n FROM sa.t.mix GROUP BY p ORDER BY p")
    assertScans(g)
    assert(g.collect().toSeq == Seq(Row("A", 2L), Row("B", 1L)))
    // UNGROUPED aggregates don't depend on attribution and stay local
    val c = spark.sql("SELECT count(*) AS n FROM sa.t.mix")
    assertLocal(c)
    assert(c.as[Long].head() == 3L)
  }

  test("any filter, SUM, or DISTINCT falls back to the real scan — and agrees") {
    cat
    val filtered = spark.sql("SELECT count(*) AS n FROM sa.t.m WHERE k > 2")
    assertScans(filtered)
    assert(filtered.as[Long].head() == 3L)
    val sum = spark.sql("SELECT sum(k) AS s FROM sa.t.m")
    assertScans(sum)
    assert(sum.as[Long].head() == 15L)
    val dist = spark.sql("SELECT count(DISTINCT p) AS d FROM sa.t.m")
    assertScans(dist)
    assert(dist.as[Long].head() == 3L)
  }

  test("long string bounds refuse MIN (truncation) and MAX (dropped) rather than lie") {
    cat
    spark.sql("CREATE TABLE sa.t.s (k BIGINT, s STRING)")
    val long = "z" * 80 // beyond FileStats.MaxStringLen: max dropped, min truncated
    spark.sql(s"INSERT INTO sa.t.s VALUES (1, '$long'), (2, '${"a" * 80}')")
    val q = spark.sql("SELECT min(s) AS a, max(s) AS b FROM sa.t.s")
    assertScans(q)
    assert(q.collect().toSeq == Seq(Row("a" * 80, "z" * 80)))
    // counts still answer locally: rows/nulls are unaffected by truncation
    val c = spark.sql("SELECT count(s) AS n FROM sa.t.s")
    assertLocal(c)
    assert(c.as[Long].head() == 2L)
  }

  test("timestamp/date/decimal bounds answer in full precision; empty table answers too") {
    cat
    spark.sql("CREATE TABLE sa.t.ty (ts TIMESTAMP, d DATE, dec DECIMAL(9,3))")
    // INT96 (Spark's legacy default) carries no sound bounds — written
    // that way, a timestamp MIN/MAX refuses into the scan fallback.
    // INT64 micros is the layout this engine wants for skipping.
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try spark.sql(
      "INSERT INTO sa.t.ty VALUES " +
        "(TIMESTAMP '2026-01-02 03:04:05.123456', DATE '2026-01-02', 12.345), " +
        "(TIMESTAMP '2025-12-31 23:59:59.999999', DATE '2025-12-31', -0.001)")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val q = spark.sql(
      "SELECT min(ts) AS a, max(ts) AS b, min(d) AS c, max(d) AS e, " +
        "min(dec) AS f, max(dec) AS g FROM sa.t.ty")
    assertLocal(q)
    assert(q.collect().toSeq == Seq(Row(
      Timestamp.valueOf("2025-12-31 23:59:59.999999"),
      Timestamp.valueOf("2026-01-02 03:04:05.123456"),
      java.sql.Date.valueOf("2025-12-31"), java.sql.Date.valueOf("2026-01-02"),
      BigDecimal("-0.001").bigDecimal, BigDecimal("12.345").bigDecimal)))

    spark.sql("CREATE TABLE sa.t.empty (k BIGINT, v DOUBLE)")
    val e = spark.sql("SELECT count(*) AS n, min(v) AS mn FROM sa.t.empty")
    assertLocal(e)
    assert(e.collect().toSeq == Seq(Row(0L, null)))
  }

  test("time travel: aggregates answer from the pinned snapshot's manifest") {
    cat
    spark.sql("CREATE TABLE sa.t.tt (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO sa.t.tt VALUES (1,'A'),(2,'B')")
    spark.sql("INSERT INTO sa.t.tt VALUES (3,'B'),(4,'B')")
    val now = spark.sql("SELECT count(*) AS n, max(k) AS m FROM sa.t.tt")
    assertLocal(now)
    assert(now.collect().toSeq == Seq(Row(4L, 4L)))
    val v1 = spark.sql(
      "SELECT count(*) AS n, max(k) AS m FROM sa.t.tt VERSION AS OF 1")
    assertLocal(v1)
    assert(v1.collect().toSeq == Seq(Row(2L, 2L)))
  }
}
