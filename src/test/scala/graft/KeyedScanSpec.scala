package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Storage-partitioned joins (GraftKeyedScan + KeyedLayout): under
  * `spark.sql.sources.v2.bucketing.enabled`, two graft tables
  * partitioned on the same key join with NO shuffle on either side —
  * the scan plans one split per partition value and reports
  * KeyGroupedPartitioning, so Spark zips matching key groups instead
  * of exchanging both tables.
  */
class KeyedScanSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_keyed_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.kj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.kj.warehouse", wh)
    spark.sql("CREATE NAMESPACE kj.t")
    spark.sql("CREATE TABLE kj.t.a (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql("CREATE TABLE kj.t.b (k BIGINT, p STRING, w DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      """INSERT INTO kj.t.a VALUES
        |(1,'A',1.0),(2,'A',2.0),(3,'B',3.0),(4,'B',4.0),(5,'C',5.0)""".stripMargin)
    spark.sql(
      """INSERT INTO kj.t.b VALUES
        |(1,'A',10.0),(2,'A',20.0),(3,'B',30.0),(9,'C',90.0)""".stripMargin)
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case s: ShuffleExchangeLike => s
    case a: AdaptiveSparkPlanExec => return shuffles(a.executedPlan)
  }

  private def withSpj[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.graft.preserveDataGrouping" -> "true",
      // join keys (p, k) are a SUPERSET of the partition key (p) —
      // allow co-partitioning on the subset, Spark's documented knob
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      // align sides when a partition value exists on only one of them
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // no ORDER BY: a global sort would add its own (legitimate) range
  // exchange — rows sort client-side instead
  private val joinSql =
    """SELECT a.k, a.p, a.v, b.w FROM kj.t.a a JOIN kj.t.b b
      |ON a.p = b.p AND a.k = b.k""".stripMargin

  private def sorted(rows: Seq[Row]): Seq[Row] = rows.sortBy(_.getLong(0))

  private val expected = Seq(
    Row(1L, "A", 1.0, 10.0), Row(2L, "A", 2.0, 20.0), Row(3L, "B", 3.0, 30.0))

  test("co-partitioned join plans with zero shuffles and agrees with the shuffled plan") {
    cat
    val spjRows = withSpj {
      val q = spark.sql(joinSql)
      assert(shuffles(q.queryExecution.executedPlan).isEmpty,
        s"expected a storage-partitioned join, got:\n${q.queryExecution.executedPlan}")
      q.collect().toSeq
    }
    assert(sorted(spjRows) == expected)
    // flag off (broadcast also disabled so the comparison plan is the
    // exchange join, not a broadcast): same result, shuffles present
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q2 = spark.sql(joinSql)
      assert(shuffles(q2.queryExecution.executedPlan).nonEmpty,
        "without the flag the stock scan shuffles as before")
      assert(sorted(q2.collect().toSeq) == expected)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("partition values missing on one side still join correctly without a shuffle") {
    cat
    // 'D' exists only in a; 'C' has no matching keys — both sides align
    spark.sql("INSERT INTO kj.t.a VALUES (7,'D',7.0)")
    val rows = withSpj {
      val q = spark.sql(joinSql)
      assert(shuffles(q.queryExecution.executedPlan).isEmpty)
      q.collect().toSeq
    }
    assert(sorted(rows) == expected)
  }

  test("file skipping survives the keyed layout: a pruned partition leaves the plan") {
    cat
    withSpj {
      // v > 2.5 prunes partition A's single file via manifest stats;
      // the keyed scan must plan only the surviving key groups
      val q = spark.sql(
        """SELECT a.k, a.p FROM kj.t.a a JOIN kj.t.b b
          |ON a.p = b.p AND a.k = b.k WHERE a.v > 2.5 AND b.w > 2.5""".stripMargin)
      assert(q.collect().toSeq == Seq(Row(3L, "B")))
    }
  }

  test("aggregation keyed on the partition column rides the grouped layout too") {
    cat
    withSpj {
      val q = spark.sql(
        "SELECT p, sum(v) AS s FROM kj.t.a GROUP BY p")
      assert(shuffles(q.queryExecution.executedPlan).isEmpty,
        s"group-by on the partition key should not exchange:\n${q.queryExecution.executedPlan}")
      assert(q.collect().toSeq.sortBy(_.getString(0)) ==
        Seq(Row("A", 3.0), Row("B", 7.0), Row("C", 5.0), Row("D", 7.0)))
    }
  }

  /** Skewed-bucket straggler posture (VERDICT r7 item 3): one task
    * per key group is the fully-clustered SPJ contract, so a hot
    * bucket serializes through one task and AQE cannot split it. With
    * `partiallyClusteredDistribution.enabled` Spark instead keeps the
    * big side's splits apart (one task per FILE of the hot bucket)
    * and replicates the small side's matching groups — which only
    * works because GraftKeyedScan plans per-file splits rather than
    * pre-merging each group.
    */
  test("partially-clustered distribution splits a hot bucket across tasks") {
    cat
    spark.sql(
      "CREATE TABLE kj.t.fact (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql(
      "CREATE TABLE kj.t.dim (k BIGINT, name STRING) PARTITIONED BY (bucket(4, k))")
    // three commits land three files in the hot key's bucket (k=1);
    // the other keys stay single-file
    (1 to 3).foreach { i =>
      spark.sql(
        s"""INSERT INTO kj.t.fact
           |SELECT 1 AS k, CAST(id * $i AS DOUBLE) AS v FROM range(0, 200)
           |UNION ALL SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(2, 6)
           |""".stripMargin)
    }
    spark.sql("INSERT INTO kj.t.dim VALUES (1,'hot'),(2,'b'),(3,'c'),(4,'d'),(5,'e')")
    val joinSql =
      """SELECT f.k, f.v, d.name FROM kj.t.fact f JOIN kj.t.dim d
        |ON f.k = d.k""".stripMargin
    def partsOf(q: DataFrame): Int =
      q.queryExecution.executedPlan.execute().getNumPartitions
    val groupCount = {
      val snap = graft.sources.TxTable.currentSnapshot(
        spark, s"$wh/t/fact").get
      snap.entries.map(_.partition).distinct.size
    }
    val (fullRows, fullParts, partialRows, partialParts) = withSpj {
      val full = spark.sql(joinSql)
      assert(shuffles(full.queryExecution.executedPlan).isEmpty)
      val (fr, fp) = (full.collect().toSeq, partsOf(full))
      val keys = Seq(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true")
      val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val partial = spark.sql(joinSql)
        assert(shuffles(partial.queryExecution.executedPlan).isEmpty,
          s"partially-clustered SPJ must stay shuffle-free:\n" +
            partial.queryExecution.executedPlan)
        (fr, fp, partial.collect().toSeq, partsOf(partial))
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // fully clustered: exactly one task per live key group
    assert(fullParts == groupCount, s"full=$fullParts groups=$groupCount")
    // partially clustered: the hot bucket's 3 files run as 3 tasks
    assert(partialParts > groupCount,
      s"expected >$groupCount tasks (hot bucket split), got $partialParts")
    // and the replicated-dim join computes the exact same rows
    def key(r: Row): (Long, Double, String) =
      (r.getLong(0), r.getDouble(1), r.getString(2))
    assert(partialRows.map(key).sorted == fullRows.map(key).sorted)
    assert(fullRows.size == 3 * 200 + 3 * 4) // k=1 hot rows + k∈{2,3,4,5} per commit
  }
}
