package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import graft.sources.{GraftPartitioningIndex, TxTable}

/** The DSv2 SQL surface (GraftCatalog): DDL/DML lifecycle, time
  * travel, metadata-only evolution, and planning-time file skipping —
  * all through `spark.sql` text, no programmatic API in the loop.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_warehouse_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc.warehouse", wh)
  }

  test("CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT lifecycle in pure SQL") {
    cat
    spark.sql("CREATE NAMESPACE gc.etl")
    spark.sql(
      "CREATE TABLE gc.etl.orders (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    assert(spark.sql("SHOW TABLES IN gc.etl").select("tableName")
      .as[String].collect().toSeq == Seq("orders"))
    assert(spark.sql("SELECT * FROM gc.etl.orders").count() == 0,
      "CREATE TABLE commits an empty v0")
    spark.sql(
      "INSERT INTO gc.etl.orders VALUES (1, 'A', 10.0), (2, 'B', 20.0)")
    spark.sql("INSERT INTO gc.etl.orders VALUES (3, 'A', 30.0)")
    assert(spark.sql(
      "SELECT p, sum(v) AS s FROM gc.etl.orders GROUP BY p ORDER BY p")
      .collect().toSeq == Seq(Row("A", 40.0), Row("B", 20.0)))
    // INSERTs are transactional appends: one version each
    val root = s"$wh/etl/orders"
    assert(TxTable.currentVersion(spark, root).contains(2L))
    // layout partitioning from PARTITIONED BY reached the data files
    assert(TxTable.currentSnapshot(spark, root).get.entries
      .forall(_.partition.startsWith("p=")))
  }

  /** Every live data file under the root (layout-level — proves a
    * metadata-only op wrote nothing).
    */
  private def dataFiles(root: String): Set[String] = {
    val dir = java.nio.file.Paths.get(root, "data")
    if (!java.nio.file.Files.exists(dir)) return Set.empty
    val s = java.nio.file.Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    } finally s.close()
  }

  test("DELETE: partition predicates go metadata-only; row predicates copy-on-write") {
    cat
    spark.sql("CREATE NAMESPACE gc.rl")
    spark.sql(
      "CREATE TABLE gc.rl.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      """INSERT INTO gc.rl.t VALUES
        |(1,'A',1.0),(2,'A',2.0),(3,'B',3.0),(4,'B',4.0),(5,'C',5.0)"""
        .stripMargin)
    val root = s"$wh/rl/t"
    // partition-only predicate: ONE metadata commit, zero data movement
    val before = dataFiles(root)
    spark.sql("DELETE FROM gc.rl.t WHERE p = 'C'")
    val s2 = TxTable.currentSnapshot(spark, root).get
    assert(s2.version == 2L, "metadata delete is one commit")
    assert(dataFiles(root) == before, "metadata delete writes no data file")
    assert(!s2.entries.exists(_.partition == "p=C"))
    assert(spark.sql("SELECT count(*) FROM gc.rl.t").as[Long].head() == 4L)
    // row-level predicate with a partition conjunct: copy-on-write
    // rewrites ONLY partition A — B keeps its exact files
    val bFiles = s2.entries.filter(_.partition == "p=B").map(_.relPath).toSet
    spark.sql("DELETE FROM gc.rl.t WHERE p = 'A' AND k = 1")
    val s3 = TxTable.currentSnapshot(spark, root).get
    assert(s3.version == 3L)
    assert(s3.entries.filter(_.partition == "p=B").map(_.relPath).toSet
      == bFiles, "untouched partition keeps its exact files")
    assert(spark.sql("SELECT k FROM gc.rl.t ORDER BY k").as[Long]
      .collect().toSeq == Seq(2L, 3L, 4L))
    // the whole history stays time-travelable
    assert(spark.sql("SELECT count(*) FROM gc.rl.t VERSION AS OF 1")
      .as[Long].head() == 5L)
    assert(spark.sql("SELECT count(*) FROM gc.rl.t VERSION AS OF 2")
      .as[Long].head() == 4L)
  }

  test("DELETE: the runtime group filter rewrites only partitions with matches") {
    cat
    spark.sql("CREATE NAMESPACE gc.rgf")
    spark.sql(
      "CREATE TABLE gc.rgf.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      """INSERT INTO gc.rgf.t VALUES
        |(1,'A',1.0),(2,'A',2.0),(3,'B',3.0),(4,'B',4.0)""".stripMargin)
    val root = s"$wh/rgf/t"
    val s1 = TxTable.currentSnapshot(spark, root).get
    val aFiles = s1.entries.filter(_.partition == "p=A").map(_.relPath).toSet
    // the condition never mentions p — group selection must come from
    // Spark's runtime row-level-operation filter (SELECT DISTINCT p
    // WHERE k = 3 → only B is scanned and replaced)
    spark.sql("DELETE FROM gc.rgf.t WHERE k = 3")
    val s2 = TxTable.currentSnapshot(spark, root).get
    assert(s2.entries.filter(_.partition == "p=A").map(_.relPath).toSet
      == aFiles,
      "a partition with no matching rows must keep its exact files " +
        "(runtime group filtering)")
    assert(spark.sql("SELECT k FROM gc.rgf.t ORDER BY k").as[Long]
      .collect().toSeq == Seq(1L, 2L, 4L))
  }

  test("DELETE / TRUNCATE handle the null partition exactly") {
    cat
    spark.sql("CREATE NAMESPACE gc.np")
    spark.sql(
      "CREATE TABLE gc.np.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO gc.np.t VALUES (1,'A',1.0),(2,NULL,2.0),(3,NULL,3.0)")
    val root = s"$wh/np/t"
    val before = dataFiles(root)
    // p = 'A' must NOT touch the null partition (= is never true on null)
    spark.sql("DELETE FROM gc.np.t WHERE p = 'A'")
    assert(dataFiles(root) == before)
    assert(spark.sql("SELECT k FROM gc.np.t ORDER BY k").as[Long]
      .collect().toSeq == Seq(2L, 3L))
    // IS NULL is partition-uniform too: still metadata-only
    spark.sql("DELETE FROM gc.np.t WHERE p IS NULL")
    assert(dataFiles(root) == before, "IS NULL delete is metadata-only")
    assert(spark.sql("SELECT count(*) FROM gc.np.t").as[Long].head() == 0L)
    // and the table is still appendable + history intact
    spark.sql("INSERT INTO gc.np.t VALUES (9,'Z',9.0)")
    assert(spark.sql("SELECT count(*) FROM gc.np.t VERSION AS OF 1")
      .as[Long].head() == 3L)
  }

  test("UPDATE rewrites matching partitions in place, CHECKs enforced") {
    cat
    spark.sql("CREATE NAMESPACE gc.up")
    spark.sql(
      "CREATE TABLE gc.up.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO gc.up.t VALUES (1,'A',1.0),(2,'A',2.0),(3,'B',3.0)")
    val root = s"$wh/up/t"
    spark.sql("CALL gc.system.add_check('up.t', 'v_pos', 'v > 0.0')")
    val s2 = TxTable.currentSnapshot(spark, root).get
    val bFiles = s2.entries.filter(_.partition == "p=B").map(_.relPath).toSet
    spark.sql("UPDATE gc.up.t SET v = v * 10 WHERE p = 'A' AND k = 2")
    val s3 = TxTable.currentSnapshot(spark, root).get
    assert(s3.entries.filter(_.partition == "p=B").map(_.relPath).toSet
      == bFiles, "UPDATE of partition A leaves B's files untouched")
    assert(spark.sql("SELECT sum(v) FROM gc.up.t").as[Double].head() == 24.0)
    // an UPDATE that violates a CHECK is refused atomically — nothing
    // committed, table state unchanged
    val e = intercept[Exception] {
      spark.sql("UPDATE gc.up.t SET v = -5.0 WHERE k = 1")
    }
    assert(e.getMessage != null && e.getMessage.contains("v_pos"),
      s"CHECK name surfaces in the refusal: ${e.getMessage}")
    assert(TxTable.currentSnapshot(spark, root).get.version == s3.version)
    assert(spark.sql("SELECT sum(v) FROM gc.up.t").as[Double].head() == 24.0)
    // an UPDATE may move rows ACROSS partitions: source partition is
    // replaced, destination gains the row additively
    spark.sql("UPDATE gc.up.t SET p = 'B' WHERE k = 1")
    assert(spark.sql(
      "SELECT p, count(*) AS n FROM gc.up.t GROUP BY p ORDER BY p")
      .as[(String, Long)].collect().toSeq == Seq(("A", 1L), ("B", 2L)))
  }

  test("MERGE INTO: update + delete + insert land as ONE commit") {
    cat
    spark.sql("CREATE NAMESPACE gc.mg")
    spark.sql(
      "CREATE TABLE gc.mg.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO gc.mg.t VALUES (1,'A',1.0),(2,'A',2.0),(3,'B',3.0)")
    val root = s"$wh/mg/t"
    val v1 = TxTable.currentSnapshot(spark, root).get.version
    Seq((1L, "A", 10.0, "U"), (3L, "B", 0.0, "D"), (7L, "C", 7.0, "I"))
      .toDF("k", "p", "v", "op").createOrReplaceTempView("mg_src")
    spark.sql(
      """MERGE INTO gc.mg.t t USING mg_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (s.k, s.p, s.v)"""
        .stripMargin)
    val s2 = TxTable.currentSnapshot(spark, root).get
    assert(s2.version == v1 + 1, "the whole MERGE is one manifest commit")
    assert(spark.sql("SELECT k, p, v FROM gc.mg.t ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq
      == Seq((1L, "A", 10.0), (2L, "A", 2.0), (7L, "C", 7.0)))
    assert(spark.sql("SELECT count(*) FROM gc.mg.t VERSION AS OF 1")
      .as[Long].head() == 3L, "pre-MERGE state stays time-travelable")
  }

  test("TRUNCATE TABLE is a metadata-only commit; history survives") {
    cat
    spark.sql("CREATE NAMESPACE gc.trc")
    spark.sql(
      "CREATE TABLE gc.trc.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gc.trc.t VALUES (1,'A',1.0),(2,'B',2.0)")
    val root = s"$wh/trc/t"
    val before = dataFiles(root)
    spark.sql("TRUNCATE TABLE gc.trc.t")
    assert(dataFiles(root) == before, "truncate moves no data")
    assert(spark.sql("SELECT count(*) FROM gc.trc.t").as[Long].head() == 0L)
    assert(TxTable.currentSnapshot(spark, root).get.entries.isEmpty)
    assert(spark.sql("SELECT count(*) FROM gc.trc.t VERSION AS OF 1")
      .as[Long].head() == 2L)
  }

  test("VERSION AS OF time travel; snapshots refuse writes") {
    cat
    spark.sql("CREATE NAMESPACE gc.tt")
    spark.sql("CREATE TABLE gc.tt.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gc.tt.t VALUES (1, 1.0)")              // v1
    spark.sql("INSERT OVERWRITE gc.tt.t VALUES (1, 99.0), (2, 2.0)") // v2
    assert(spark.sql("SELECT sum(v) FROM gc.tt.t").as[Double].head() == 101.0)
    assert(spark.sql("SELECT sum(v) FROM gc.tt.t VERSION AS OF 1")
      .as[Double].head() == 1.0, "the overwritten state stays queryable")
    assert(spark.sql("SELECT count(*) FROM gc.tt.t VERSION AS OF 0")
      .as[Long].head() == 0L)
    // TIMESTAMP AS OF through SQL: v1's commit instant sees v1's state
    // (ISO-8601 with Z — zone-explicit, independent of the JVM default)
    val t1 = java.time.Instant
      .ofEpochMilli(TxTable.snapshot(spark, s"$wh/tt/t", 1L).ts).toString
    assert(spark.sql(
      s"SELECT sum(v) FROM gc.tt.t TIMESTAMP AS OF '$t1'")
      .as[Double].head() == 1.0)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gc.tt.t VERSION AS OF 1 VALUES (9, 9.0)")
    }
    assert(e.getMessage.toLowerCase.contains("time travel") ||
      e.getMessage.toLowerCase.contains("immutable") ||
      e.getMessage.toLowerCase.contains("syntax"),
      s"unexpected refusal shape: ${e.getMessage}")
  }

  test("ALTER TABLE ADD/DROP COLUMNS is metadata-only; CHECKs and CTAS compose") {
    cat
    spark.sql("CREATE NAMESPACE gc.ddl")
    spark.sql("CREATE TABLE gc.ddl.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gc.ddl.t VALUES (1, 1.5)")
    val root = s"$wh/ddl/t"
    val filesBefore = TxTable.currentSnapshot(spark, root).get.entries.toSet
    spark.sql("ALTER TABLE gc.ddl.t ADD COLUMNS (note STRING)")
    assert(TxTable.currentSnapshot(spark, root).get.entries.toSet ==
      filesBefore, "widening rewrote data files")
    assert(spark.sql("SELECT note FROM gc.ddl.t").collect().toSeq ==
      Seq(Row(null)), "existing rows backfill NULL")
    spark.sql("INSERT INTO gc.ddl.t VALUES (2, 2.5, 'hi')")
    spark.sql("ALTER TABLE gc.ddl.t DROP COLUMNS (note)")
    assert(spark.sql("SELECT * FROM gc.ddl.t").columns.toSeq == Seq("k", "v"))
    // CTAS through the catalog
    spark.sql(
      "CREATE TABLE gc.ddl.t2 AS SELECT k, v * 2 AS v2 FROM gc.ddl.t")
    assert(spark.sql("SELECT sum(v2) FROM gc.ddl.t2").as[Double].head() == 8.0)
    // DROP TABLE
    spark.sql("DROP TABLE gc.ddl.t2")
    assert(spark.sql("SHOW TABLES IN gc.ddl").count() == 1)
  }

  test("SQL reads plan through the manifest: stats skipping prunes files, filters push down") {
    cat
    spark.sql("CREATE NAMESPACE gc.skip")
    spark.sql("CREATE TABLE gc.skip.m (k BIGINT, v DOUBLE)")
    // two single-file inserts with disjoint k ranges in manifest stats
    spark.sql("INSERT INTO gc.skip.m SELECT /*+ REPARTITION(1) */ id, " +
      "CAST(id AS DOUBLE) FROM range(0, 100)")
    spark.sql("INSERT INTO gc.skip.m SELECT /*+ REPARTITION(1) */ id, " +
      "CAST(id AS DOUBLE) FROM range(1000, 1100)")
    assert(TxTable.currentSnapshot(spark, s"$wh/skip/m").get.entries.size == 2)
    val df = spark.sql("SELECT sum(v) FROM gc.skip.m WHERE k >= 1000")
    assert(df.as[Double].head() == (1000 until 1100).sum.toDouble)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a DSv2 BatchScan")
    val pscan = scans.head.scan.asInstanceOf[ParquetScan]
    assert(pscan.pushedFilters.nonEmpty, "filter did not reach the parquet scan")
    val idx = pscan.fileIndex.asInstanceOf[GraftPartitioningIndex]
    assert(idx.delegate.lastListedCount == 1,
      s"stats skipping kept ${idx.delegate.lastListedCount} of 2 files")
  }

  test("catalog hygiene: exists/refusals, rename, namespace drop semantics, hostile names") {
    cat
    spark.sql("CREATE NAMESPACE gc.hy")
    spark.sql("CREATE TABLE gc.hy.a (k BIGINT)")
    // duplicate create refuses; IF NOT EXISTS is quiet
    assert(intercept[Exception](spark.sql("CREATE TABLE gc.hy.a (k BIGINT)"))
      .getMessage.toUpperCase.contains("EXISTS"))
    spark.sql("CREATE TABLE IF NOT EXISTS gc.hy.a (k BIGINT)")
    // rename within the warehouse
    spark.sql("INSERT INTO gc.hy.a VALUES (7)")
    // the RENAME TO target is catalog-relative in Spark's v2 path
    spark.sql("ALTER TABLE gc.hy.a RENAME TO hy.b")
    assert(spark.sql("SELECT k FROM gc.hy.b").as[Long].head() == 7L)
    assert(!spark.catalog.tableExists("gc.hy.a"))
    // non-cascade namespace drop refuses while non-empty
    assert(intercept[Exception](spark.sql("DROP NAMESPACE gc.hy"))
      .getMessage.toUpperCase.contains("EMPTY"))
    spark.sql("DROP NAMESPACE gc.hy CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN gc").as[String].collect()
      .contains("hy"))
    // a path-traversal identifier can never escape the warehouse
    val bad = intercept[Exception](
      spark.sql(s"CREATE TABLE gc.`..`.`oops` (k BIGINT)"))
    assert(bad.getMessage.contains("illegal identifier") ||
      bad.getMessage.toUpperCase.contains("PARSE"),
      s"hostile name not refused: ${bad.getMessage}")
  }

  test("CREATE TABLE never erases a colliding directory: namespaces and stray dirs survive") {
    cat
    spark.sql("CREATE NAMESPACE gc.safe")
    spark.sql("CREATE TABLE gc.safe.keepme (k BIGINT)")
    spark.sql("INSERT INTO gc.safe.keepme VALUES (42)")
    // 'gc.safe' is a namespace directory full of tables; a CREATE TABLE
    // whose name collides with it must refuse, not delete the subtree
    val e = intercept[Exception](spark.sql("CREATE TABLE gc.safe (k BIGINT)"))
    assert(e.getMessage.contains("non-empty"), s"got: ${e.getMessage}")
    assert(spark.sql("SELECT k FROM gc.safe.keepme").as[Long].head() == 42L)
    // same for any pre-existing non-table directory under the warehouse
    val stray = new java.io.File(s"$wh/safe/straydir/inside")
    assert(stray.mkdirs())
    val e2 = intercept[Exception](
      spark.sql("CREATE TABLE gc.safe.straydir (k BIGINT)"))
    assert(e2.getMessage.contains("non-empty"), s"got: ${e2.getMessage}")
    assert(stray.exists(), "the colliding directory must be untouched")
    // an EMPTY leftover directory is fine to claim
    assert(new java.io.File(s"$wh/safe/emptydir").mkdirs())
    spark.sql("CREATE TABLE gc.safe.emptydir (k BIGINT)")
    spark.sql("INSERT INTO gc.safe.emptydir VALUES (1)")
    assert(spark.sql("SELECT k FROM gc.safe.emptydir").as[Long].head() == 1L)
  }

  test("DML on a DATE-partitioned table: metadata delete, CoW update, mixed-writer grouping") {
    cat
    spark.sql("CREATE NAMESPACE gc.dt")
    spark.sql(
      "CREATE TABLE gc.dt.ev (k BIGINT, d DATE, v DOUBLE) PARTITIONED BY (d)")
    spark.sql("INSERT INTO gc.dt.ev VALUES " +
      "(1, DATE'2024-01-01', 1.0), (2, DATE'2024-01-01', 2.0), " +
      "(3, DATE'2024-01-02', 3.0), (4, DATE'2024-01-03', 4.0)")
    // row-predicate UPDATE: copy-on-write must render the date
    // partition value (previously threw mid-execution)
    spark.sql("UPDATE gc.dt.ev SET v = 20.0 WHERE k = 2")
    assert(spark.sql("SELECT sum(v) FROM gc.dt.ev").as[Double].head() == 28.0)
    // the rewritten entries carry the SAME d=yyyy-MM-dd partition
    // strings the append path writes — one partition group per date
    val snap = TxTable.currentSnapshot(spark, s"$wh/dt/ev").get
    assert(snap.entries.forall(_.partition.matches("d=\\d{4}-\\d{2}-\\d{2}")),
      s"partition strings: ${snap.entries.map(_.partition)}")
    // partition-uniform DELETE stays metadata-only on dates
    val before = snap.version
    spark.sql("DELETE FROM gc.dt.ev WHERE d = DATE'2024-01-03'")
    assert(spark.sql("SELECT count(*) FROM gc.dt.ev").as[Long].head() == 3L)
    // and MERGE touches only the matched date partitions
    spark.sql("CREATE TABLE gc.dt.upd (k BIGINT, d DATE, v DOUBLE)")
    spark.sql("INSERT INTO gc.dt.upd VALUES (3, DATE'2024-01-02', 30.0), " +
      "(9, DATE'2024-01-09', 9.0)")
    spark.sql(
      """MERGE INTO gc.dt.ev t USING gc.dt.upd s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT k, v FROM gc.dt.ev ORDER BY k").collect().toSeq ==
      Seq(Row(1L, 1.0), Row(2L, 20.0), Row(3L, 30.0), Row(9L, 9.0)))
    assert(before >= 0)
  }

  test("CALL compact with a partition scope bin-packs only that group") {
    cat
    spark.sql("CREATE NAMESPACE gc.hot")
    spark.sql("CREATE TABLE gc.hot.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO gc.hot.t SELECT /*+ REPARTITION(1) */ id, 'a' " +
        s"FROM range(${i * 10}, ${i * 10 + 10})")
      spark.sql(s"INSERT INTO gc.hot.t SELECT /*+ REPARTITION(1) */ id, 'b' " +
        s"FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val root = s"$wh/hot/t"
    val before = TxTable.currentSnapshot(spark, root).get
    assert(before.entries.count(_.partition == "p=a") == 3)
    spark.sql("CALL gc.system.compact('hot.t', 134217728, 'p=a')")
    val after = TxTable.currentSnapshot(spark, root).get
    assert(after.entries.count(_.partition == "p=a") == 1,
      s"scoped group must bin-pack: ${after.entries.map(_.partition)}")
    assert(after.entries.filter(_.partition == "p=b").toSet ==
      before.entries.filter(_.partition == "p=b").toSet,
      "out-of-scope group must be byte-untouched")
    assert(spark.sql("SELECT count(*) FROM gc.hot.t").as[Long].head() == 60L)
  }

  test("identity partition groups prune on expressions stats cannot interpret") {
    cat
    spark.sql("CREATE NAMESPACE gc.idp")
    spark.sql("CREATE TABLE gc.idp.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gc.idp.t VALUES (1, 'aa'), (2, 'ab'), (3, 'bb')")
    val df = spark.sql("SELECT k FROM gc.idp.t WHERE p LIKE 'a%'")
    assert(df.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val idx = plan.collect { case b: BatchScanExec => b }.head
      .scan.asInstanceOf[ParquetScan]
      .fileIndex.asInstanceOf[GraftPartitioningIndex]
    assert(idx.delegate.lastListedCount == 2,
      s"LIKE 'a%' must list the two a-groups, got ${idx.delegate.lastListedCount}")
  }

  test("CALL detail reports version, totals, layout, and check count") {
    cat
    spark.sql("CREATE NAMESPACE gc.det")
    spark.sql(
      "CREATE TABLE gc.det.t (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gc.det.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gc.system.add_check('det.t', 'k_pos', 'k > 0')")
    val row = spark.sql("CALL gc.system.detail('det.t')").head()
    assert(row.getLong(0) == 2L, s"create + insert + check = v2: $row")
    assert(row.getLong(1) >= 1L && row.getLong(2) > 0L)
    assert(row.getString(3) == "p")
    assert(row.getLong(4) == 1L)
    assert(row.getString(5).endsWith("det/t"))
  }

  test("CALL vacuum_retain keeps windowed history, reclaims beyond it") {
    cat
    spark.sql("CREATE NAMESPACE gc.vr")
    spark.sql("CREATE TABLE gc.vr.t (k BIGINT)")
    spark.sql("INSERT INTO gc.vr.t VALUES (1)")          // v1
    spark.sql("INSERT OVERWRITE gc.vr.t VALUES (2)")     // v2: v1's file orphans
    // generous retention: every version is inside the window, nothing
    // to reclaim
    assert(spark.sql("CALL gc.system.vacuum_retain('vr.t', 1000)")
      .as[Long].head() == 0L)
    // zero retention: only the current version survives; v1's
    // overwritten file goes
    assert(spark.sql("CALL gc.system.vacuum_retain('vr.t', 0)")
      .as[Long].head() == 1L)
    assert(spark.sql("SELECT k FROM gc.vr.t").as[Long].head() == 2L)
    // time travel to the vacuumed version now fails loudly (the file
    // is gone; RESTORE additionally pre-checks and names the vacuum)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gc.vr.t VERSION AS OF 1").collect())
    assert(e.getMessage.contains("vacuum") ||
      e.getMessage.contains("does not exist"), e.getMessage)
  }

  test("CALL export_files writes one file per row from SQL text") {
    cat
    spark.sql("CREATE NAMESPACE gc.lob")
    spark.sql("CREATE TABLE gc.lob.docs (id BIGINT, payload BINARY)")
    spark.sql("INSERT INTO gc.lob.docs SELECT id, encode(" +
      "concat('payload-', id), 'UTF-8') FROM range(0, 5)")
    val out = s"target/tmp/lob_call_${System.nanoTime()}"
    val Row(files: Long, bytes: Long) = spark.sql(
      s"CALL gc.system.export_files('lob.docs', 'id', 'payload', '$out')")
      .head()
    assert(files == 5L)
    val onDisk = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".bin")).sortBy(_.getName)
    assert(onDisk.length == 5)
    assert(bytes == onDisk.map(_.length()).sum)
    val got = new String(java.nio.file.Files.readAllBytes(
      onDisk.find(_.getName == "3.bin").get.toPath), "UTF-8")
    assert(got == "payload-3")
  }

  test("CALL procedures: history, compact, zorder, restore, vacuum run from SQL text") {
    cat
    spark.sql("CREATE NAMESPACE gc.proc")
    spark.sql("CREATE TABLE gc.proc.t (k BIGINT, v DOUBLE)")
    (1 to 4).foreach(i => spark.sql(
      s"INSERT INTO gc.proc.t SELECT /*+ REPARTITION(1) */ id, " +
        s"CAST(id AS DOUBLE) FROM range(${i * 100}, ${i * 100 + 50})"))
    val root = s"$wh/proc/t"
    // history: one row per version (create + 4 inserts)
    val hist = spark.sql("CALL gc.system.history('proc.t')")
    assert(hist.columns.take(2).toSeq == Seq("version", "files"))
    assert(hist.count() == 5)
    // compact: 4 small files bin-pack; rows identical
    val Row(compactV: Long, liveFiles: Long) =
      spark.sql("CALL gc.system.compact('proc.t')").head()
    assert(compactV == 5L && liveFiles < 4,
      s"expected a bin-packed commit, got v$compactV with $liveFiles files")
    assert(spark.sql("SELECT count(*) FROM gc.proc.t").as[Long].head() == 200L)
    // zorder in place: one more version, same rows
    assert(spark.sql("CALL gc.system.zorder('proc.t', 'k', 2)")
      .as[Long].head() == 6L)
    assert(spark.sql("SELECT sum(k) FROM gc.proc.t").as[Long].head() ==
      (100 until 150).sum + (200 until 250).sum + (300 until 350).sum +
        (400 until 450).sum)
    // restore to the pre-compaction state
    assert(spark.sql("CALL gc.system.restore('proc.t', 4)")
      .as[Long].head() == 7L)
    assert(TxTable.currentSnapshot(spark, root).get.entries.size == 4,
      "restored state must have the pre-compaction file layout")
    // vacuum everything older than current: compacted/zordered files go
    val deleted = spark.sql("CALL gc.system.vacuum('proc.t', 7)")
      .as[Long].head()
    assert(deleted > 0, "vacuum found nothing to delete")
    assert(spark.sql("SELECT count(*) FROM gc.proc.t").as[Long].head() == 200L,
      "vacuum deleted live files")
    // unknown procedure refuses loudly (Spark wraps the catalog's error)
    val nope = intercept[Exception](spark.sql("CALL gc.system.nope('x')"))
    assert(nope.getMessage.contains("no such graft procedure") ||
      nope.getMessage.contains("FAILED_TO_LOAD_ROUTINE"))
  }

  test("concurrent SQL INSERTs all land (optimistic retry behind the catalog)") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    cat
    spark.sql("CREATE NAMESPACE gc.race")
    spark.sql("CREATE TABLE gc.race.t (k BIGINT)")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      Await.result(Future.sequence((0 until 4).map(i => Future {
        spark.sql(s"INSERT INTO gc.race.t VALUES ($i)")
      })), 120.seconds)
      assert(spark.sql("SELECT count(*) FROM gc.race.t").as[Long].head() == 4L)
      assert(TxTable.currentVersion(spark, s"$wh/race/t").contains(4L))
    } finally pool.shutdown()
  }

  test("SQL INSERT inherits CHECK constraints and schema refusal from the format") {
    cat
    spark.sql("CREATE NAMESPACE gc.ck")
    spark.sql("CREATE TABLE gc.ck.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gc.ck.t VALUES (1, 5.0)")
    assert(spark.sql("CALL gc.system.add_check('ck.t', 'v_pos', 'v > 0')")
      .as[Long].head() == 2L)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gc.ck.t VALUES (2, -1.0)")
    }
    assert(e.getMessage.contains("v_pos"),
      s"CHECK not enforced through SQL INSERT: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM gc.ck.t").as[Long].head() == 1L,
      "refused INSERT must commit nothing")
    // dropping the constraint (from SQL) lets the same row in
    spark.sql("CALL gc.system.drop_check('ck.t', 'v_pos')")
    spark.sql("INSERT INTO gc.ck.t VALUES (2, -1.0)")
    assert(spark.sql("SELECT count(*) FROM gc.ck.t").as[Long].head() == 2L)
  }

  test("the outbound change feed captures SQL DELETE/UPDATE/MERGE commits") {
    import graft.sources.ChangeFeed
    cat
    spark.sql("CREATE NAMESPACE gc.cf")
    spark.sql(
      "CREATE TABLE gc.cf.t (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO gc.cf.t VALUES (1,'A',1.0),(2,'A',2.0),(3,'B',3.0),(4,'B',4.0)")
    val root = s"$wh/cf/t"
    def feed(from: Long, to: Long): Set[(Long, String, Double, String)] =
      ChangeFeed.between(spark, root, from, to, Seq("k"))
        .select("k", "p", "v", ChangeFeed.OpCol)
        .as[(Long, String, Double, String)].collect().toSet

    spark.sql("DELETE FROM gc.cf.t WHERE k = 2") // copy-on-write rewrite
    assert(feed(1L, 2L) == Set((2L, "A", 2.0, "delete")),
      "partition co-residents of the rewrite must not appear as changes")
    spark.sql("UPDATE gc.cf.t SET v = 40.0 WHERE k = 4")
    assert(feed(2L, 3L) == Set((4L, "B", 40.0, "update")))
    // an UPDATE that moves a row across partitions is ONE update op
    // with the post-image partition, not a delete+insert pair
    spark.sql("UPDATE gc.cf.t SET p = 'C' WHERE k = 3")
    assert(feed(3L, 4L) == Set((3L, "C", 3.0, "update")))
    spark.sql(
      """MERGE INTO gc.cf.t t
        |USING (SELECT 1L AS k, true AS del, 0.0 AS nv UNION ALL
        |       SELECT 4L, false, 400.0 UNION ALL
        |       SELECT 9L, false, 9.0) s
        |ON t.k = s.k
        |WHEN MATCHED AND s.del THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (s.k, 'A', s.nv)"""
        .stripMargin)
    assert(feed(4L, 5L) == Set(
      (1L, "A", 1.0, "delete"), (4L, "B", 400.0, "update"),
      (9L, "A", 9.0, "insert")))
    // the net feed across the whole DML history is the final state
    assert(feed(0L, 5L) == Set(
      (3L, "C", 3.0, "insert"), (4L, "B", 400.0, "insert"),
      (9L, "A", 9.0, "insert")))
  }

  test("CALL cdc_lag reports hours-behind and retention headroom per pipeline") {
    cat
    val path = s"target/tmp/cdc_lag_states_${System.nanoTime()}"
    val now = System.currentTimeMillis()
    // one fresh pipeline, one 60h-stale pipeline (72h retention,
    // 24h alert threshold ⇒ 12h headroom ⇒ alert)
    Seq(
      ("orders_pipeline", 1000L, new java.sql.Timestamp(now - 60L * 3600000)),
      ("events_pipeline", 2000L, new java.sql.Timestamp(now)))
      .toDF("state_name", "state", "last_update")
      .coalesce(1).write.parquet(path)
    val rows = spark.sql(s"CALL gc.system.cdc_lag('$path', 72, 24)")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val (lagO, headO, alertO) = rows("orders_pipeline")
    assert(lagO >= 59.9 && lagO <= 61.0, s"stale lag: $lagO")
    assert(headO <= 12.1 && alertO,
      s"12h headroom must alert under the 24h threshold: $headO")
    val (lagE, headE, alertE) = rows("events_pipeline")
    assert(lagE < 1.0 && headE > 70.0 && !alertE,
      s"fresh pipeline must not alert: $lagE/$headE")
  }
}
