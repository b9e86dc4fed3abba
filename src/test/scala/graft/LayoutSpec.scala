package graft

import org.apache.spark.sql.functions._
import graft.operators.Audit
import graft.sources.PartitionedWriter

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeSorted produces hive partitions with in-file sort order") {
    val dir = s"target/tmp/layout_${System.nanoTime()}"
    val df = Tables.orders(spark, sf)
    PartitionedWriter.writeSorted(df, dir,
      partitionCols = Seq("o_orderstatus"), sortCols = Seq("o_custkey"))
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("o_orderstatus="))
    assert(dirs.toSet == Set("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    // partition pruning reaches the scan
    val pruned = back.filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      df.filter(col("o_orderstatus") === "F").count())
    assert(!plan.contains("o_orderstatus=O"), "other partitions not listed")
  }

  test("writeBucketed joins without an exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    PartitionedWriter.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_custkey"), 4)
    PartitionedWriter.writeBucketed(
      Tables.customer(spark, sf).select("c_custkey", "c_name"),
      "b_customer", Seq("c_custkey"), 4)
    val j = spark.table("b_orders").join(
      spark.table("b_customer"),
      col("o_custkey") === col("c_custkey"))
    val exchanges = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "bucketed join must not shuffle")
    assert(j.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("Audit.withAudit appends run metadata; observed counts in one pass") {
    val df = Tables.customer(spark, sf)
    val audited = Audit.withAudit(df, "run42")
    val row = audited.select("run_id", "source_file").head
    assert(row.getString(0) == "run42")
    assert(row.getString(1).contains("customer.parquet"))
    val (instrumented, obs) = Audit.observed(df, s"obs_${System.nanoTime()}")
    val n = instrumented.count()
    assert(obs.get("n_rows") == n)
  }

  test("custom expressions are callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_l2sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l,
        |  size(graft_minhash(array('a', 'b'), 8)) AS m,
        |  graft_simhash('hello world') AS s""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
    assert(r.getInt(2) == 8)
    assert(!r.isNullAt(3))
  }

  test("sketch/histogram aggregates are callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_bucket(CAST(7 AS DOUBLE), array(2.0D, 5.0D, 9.0D)) AS b,
        |  graft_hist(v, 0.0D, 10.0D, 2) AS h,
        |  graft_freq_items(w, 64) AS f
        |FROM VALUES (1.0D, 'a'), (6.0D, 'a'), (7.0D, 'b') AS t(v, w)
        |GROUP BY 1""".stripMargin).head
    assert(r.getInt(0) == 2) // two boundaries ≤ 7
    assert(r.getSeq[Long](1) == Seq(0L, 1L, 2L, 0L))
    val items = r.getSeq[org.apache.spark.sql.Row](2)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(items == Map("a" -> 2L, "b" -> 1L))
    // union folds states built by graft_hist
    val u = spark.sql(
      """SELECT graft_hist_union(h) AS h FROM (
        |  SELECT graft_hist(v, 0.0D, 10.0D, 2) AS h
        |  FROM VALUES (1.0D), (6.0D) AS t(v) GROUP BY v)""".stripMargin).head
    assert(u.getSeq[Long](0) == Seq(0L, 1L, 1L, 0L))
    // config args must be literals, loudly
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_hist(v, v, 10.0D, 2) FROM VALUES (1.0D) t(v)")
        .collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
