package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, TxTable}

/** Partition evolution (`CALL relayout` / `TxTable.rewriteAll`'s
  * `newLayout`): one commit re-places every row under a new layout
  * spec, the manifest records each version's OWN spec, and every
  * layout-bound contract (pruning, SPJ partitioning report, DML group
  * rewrite, placement of later appends) binds to the spec a version's
  * files were actually written under — including across time travel
  * and restore.
  */
class RelayoutSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_relayout_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.rl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rl.warehouse", wh)
    spark.sql("CREATE NAMESPACE rl.t")
  }

  private def mk(name: String, spec: String, rows: Int = 100): String = {
    cat
    spark.sql(s"CREATE TABLE rl.t.$name (k BIGINT, p STRING, v DOUBLE) " +
      s"PARTITIONED BY ($spec)")
    (1 to rows).map(k => (k.toLong, if (k % 2 == 0) "even" else "odd",
        k * 1.5)).toDF("k", "p", "v")
      .writeTo(s"rl.t.$name").append()
    s"$wh/t/$name"
  }

  private def partitioningOf(table: String): String =
    spark.sql(s"EXPLAIN SELECT * FROM $table").head().getString(0)

  test("bucket count grows: one commit, new placement, per-version layout") {
    val root = mk("grow", "bucket(4, k)")
    val vPre = TxTable.currentVersion(spark, root).get
    val partsPre = TxTable.currentSnapshot(spark, root).get
      .entries.map(_.partition).toSet
    assert(partsPre.forall(_.startsWith("_bucket=")) && partsPre.size <= 4)
    spark.sql("CALL rl.system.relayout('t.grow', 'bucket(16, k)')")
    val snap = TxTable.currentSnapshot(spark, root).get
    assert(snap.version == vPre + 1, "relayout is ONE commit")
    assert(snap.layout.contains("bucket(16,k)"),
      s"manifest must record the new spec, got ${snap.layout}")
    val parts = snap.entries.map(_.partition).toSet
    assert(parts.forall(_.startsWith("_bucket=")) && parts.size > 4,
      s"rows must re-place under 16 buckets, got ${parts.size} groups")
    // rows identical
    assert(spark.sql("SELECT sum(k) FROM rl.t.grow").as[Long].head() ==
      (1L to 100L).sum)
    // the sidecar keeps the CREATION spec — pre-tracking versions of
    // old tables must keep resolving to the layout they were written
    // under (the documented fallback rule)
    assert(GraftCatalog.layoutOf(spark, root, snap.copy(layout = None))
      .contains("bucket(4,k)"))
  }

  test("time travel binds each version to its OWN layout") {
    val root = mk("tt", "bucket(4, k)")
    spark.sql("CALL rl.system.relayout('t.tt', 'bucket(16, k)')")
    // pre-relayout version still reads in full...
    assert(spark.sql("SELECT count(*) FROM rl.t.tt VERSION AS OF 1")
      .as[Long].head() == 100L)
    // ...and its table handle reports the OLD partitioning (a scan
    // bound to the new spec would mis-prune the old _bucket dirs)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val c = spark.sessionState.catalogManager.catalog("rl")
      .asInstanceOf[TableCatalog]
    val id = Identifier.of(Array("t"), "tt")
    assert(c.loadTable(id, "1").partitioning().head.toString
      .contains("4"), "v1 must bind bucket(4)")
    assert(c.loadTable(id).partitioning().head.toString
      .contains("16"), "current must bind bucket(16)")
  }

  test("identity -> bucket and -> unpartitioned relayouts") {
    val root = mk("kinds", "p")
    assert(TxTable.currentSnapshot(spark, root).get.entries
      .forall(_.partition.startsWith("p=")))
    spark.sql("CALL rl.system.relayout('t.kinds', 'bucket(8, k)')")
    val s1 = TxTable.currentSnapshot(spark, root).get
    assert(s1.entries.forall(_.partition.startsWith("_bucket=")))
    assert(spark.sql("SELECT count(*) FROM rl.t.kinds WHERE p = 'even'")
      .as[Long].head() == 50L)
    // '' = explicitly unpartitioned; must NOT fall back to the sidecar
    spark.sql("CALL rl.system.relayout('t.kinds', '')")
    val s2 = TxTable.currentSnapshot(spark, root).get
    assert(s2.layout.contains("") && s2.entries.forall(_.partition.isEmpty),
      s"got layout=${s2.layout} parts=${s2.entries.map(_.partition).toSet}")
    assert(GraftCatalog.layoutOf(spark, root, s2).isEmpty,
      "explicit '' must override the creation sidecar")
    assert(spark.sql("SELECT sum(k) FROM rl.t.kinds").as[Long].head() ==
      (1L to 100L).sum)
  }

  test("restore to a pre-relayout version reverts the effective layout") {
    val root = mk("rest", "bucket(4, k)")
    spark.sql("CALL rl.system.relayout('t.rest', 'bucket(16, k)')")
    spark.sql("CALL rl.system.restore('t.rest', 1)")
    val snap = TxTable.currentSnapshot(spark, root).get
    // the restored version's files are the ORIGINAL bucket(4) files —
    // the commit must carry their layout, or pruning would hash with
    // the wrong modulus
    assert(GraftCatalog.layoutOf(spark, root, snap).contains("bucket(4,k)"),
      s"got ${snap.layout}")
    assert(spark.sql("SELECT count(*) FROM rl.t.rest").as[Long].head() == 100L)
  }

  test("DML and appends after a relayout follow the NEW spec") {
    val root = mk("dml", "bucket(4, k)")
    spark.sql("CALL rl.system.relayout('t.dml', 'bucket(16, k)')")
    spark.sql("INSERT INTO rl.t.dml VALUES (101, 'odd', 151.5)")
    val afterIns = TxTable.currentSnapshot(spark, root).get
    assert(afterIns.entries.forall(_.partition.startsWith("_bucket=")))
    // a bucket-key point DELETE group-prunes and rewrites under the
    // new layout; correctness over the relayouted table
    spark.sql("DELETE FROM rl.t.dml WHERE k = 50")
    assert(spark.sql("SELECT count(*) FROM rl.t.dml").as[Long].head() == 100L)
    // the merge-on-read leg composes too
    spark.conf.set("spark.graft.dml.mode", "mor")
    try spark.sql("DELETE FROM rl.t.dml WHERE k % 9 = 0")
    finally spark.conf.unset("spark.graft.dml.mode")
    val want = ((1L to 101L).toSet - 50L).filterNot(_ % 9 == 0)
    assert(spark.sql("SELECT k FROM rl.t.dml").as[Long].collect().toSet
      == want)
  }

  test("relayouted tables regain the zero-shuffle co-bucketed join") {
    cat
    // two bucket(4) tables relayouted to bucket(8): the SPJ contract
    // must bind to the NEW manifest-carried spec on both sides
    spark.sql("CREATE TABLE rl.t.j1 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE rl.t.j2 (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO rl.t.j1 SELECT id, id * 1.0 FROM range(0, 200)")
    spark.sql("INSERT INTO rl.t.j2 SELECT id, id * 2.0 FROM range(0, 200)")
    spark.sql("CALL rl.system.relayout('t.j1', 'bucket(8, k)')")
    spark.sql("CALL rl.system.relayout('t.j2', 'bucket(8, k)')")
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.graft.preserveDataGrouping" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = spark.sql(
        """SELECT sum(a.v + b.w) AS s FROM rl.t.j1 a
          |JOIN rl.t.j2 b ON a.k = b.k""".stripMargin)
      // the JOIN is shuffle-free; the single global-aggregate
      // SinglePartition exchange above it is inherent
      val joins = df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, df.queryExecution.executedPlan.toString)
      val below = joins.flatMap(_.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
      })
      assert(below.isEmpty,
        s"post-relayout co-bucketed join must be shuffle-free below " +
          s"the join:\n${df.queryExecution.executedPlan}")
      assert(df.as[Double].head() == (0 until 200).map(_ * 3.0).sum)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("relayout refuses bad specs loudly") {
    mk("bad", "bucket(4, k)", rows = 10)
    val e1 = intercept[Exception] {
      spark.sql("CALL rl.system.relayout('t.bad', 'bucket(8, nope)')")
    }
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[Exception] {
      spark.sql("CALL rl.system.relayout('t.bad', 'bucket(8, v)')")
    }
    assert(e2.getMessage.contains("unsupported bucket column type"))
  }

  test("relayout over outstanding deletion vectors materializes them") {
    val root = mk("dv", "bucket(4, k)")
    spark.conf.set("spark.graft.dml.mode", "mor")
    try spark.sql("DELETE FROM rl.t.dv WHERE k % 5 = 0")
    finally spark.conf.unset("spark.graft.dml.mode")
    val vDel = TxTable.currentVersion(spark, root).get
    assert(TxTable.currentSnapshot(spark, root).get.dvs.nonEmpty)
    spark.sql("CALL rl.system.relayout('t.dv', 'bucket(16, k)')")
    val snap = TxTable.currentSnapshot(spark, root).get
    // the rewrite read through the delete set, so the new layout's
    // files carry only visible rows and the DV metadata clears
    assert(snap.dvs.isEmpty, "relayout must materialize the delete set")
    assert(spark.sql("SELECT k FROM rl.t.dv").as[Long].collect().toSet ==
      (1L to 100L).filterNot(_ % 5 == 0).toSet)
    // time travel to the DV-bearing version still merges its deletes
    assert(TxTable.readVersion(spark, root, vDel).count() == 80L)
  }

  test("CDF across a relayout version is empty (pure re-placement)") {
    val root = mk("cdf", "bucket(4, k)")
    val vPre = TxTable.currentVersion(spark, root).get
    spark.sql("CALL rl.system.relayout('t.cdf', 'bucket(16, k)')")
    // every file was swapped, but every ROW is identical — the
    // change feed's identical-value reconciliation must net to zero
    val delta = graft.sources.ChangeFeed.between(
      spark, root, vPre, vPre + 1, Seq("k"))
    assert(delta.count() == 0L,
      "a relayout must not surface row changes downstream")
    // ...while a real change after the relayout still surfaces
    spark.sql("DELETE FROM rl.t.cdf WHERE k = 42")
    val d2 = graft.sources.ChangeFeed.between(
      spark, root, vPre + 1, vPre + 2, Seq("k"))
    assert(d2.select("k", "_op").collect().map(_.toString).toSeq ==
      Seq("[42,delete]"))
  }

  test("clone of a relayouted table keeps the new layout") {
    val root = mk("cl", "bucket(4, k)", rows = 20)
    spark.sql("CALL rl.system.relayout('t.cl', 'bucket(16, k)')")
    spark.sql("CALL rl.system.clone('t.cl', 't.cl2')")
    val snap = TxTable.currentSnapshot(spark, s"$wh/t/cl2").get
    assert(GraftCatalog.layoutOf(spark, s"$wh/t/cl2", snap)
      .contains("bucket(16,k)"), s"got ${snap.layout}")
    assert(spark.sql("SELECT count(*) FROM rl.t.cl2").as[Long].head() == 20L)
  }
}
