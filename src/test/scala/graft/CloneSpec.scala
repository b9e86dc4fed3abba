package graft

import org.apache.spark.sql.Row
import graft.sources.TxTable

/** Zero-copy shallow clone (TxTable.cloneTable + CALL clone): the
  * clone's v0 references the source's files in place, then lives as an
  * independent read-write table — writes/DML/compact localize files
  * under the clone's root, and vacuum on the clone can never delete
  * source data (its candidates come from listing the clone's own data
  * dir).
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_clone_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.cl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cl.warehouse", wh)
    spark.sql("CREATE NAMESPACE cl.t")
    spark.sql(
      "CREATE TABLE cl.t.src (k BIGINT, p STRING, v DOUBLE) PARTITIONED BY (p)")
    spark.sql(
      "INSERT INTO cl.t.src VALUES (1,'A',1.0),(2,'A',2.0),(3,'B',3.0),(4,'B',4.0)")
  }

  private def files(root: String): Set[String] = {
    val dir = java.nio.file.Paths.get(root, "data")
    if (!java.nio.file.Files.exists(dir)) return Set.empty
    val s = java.nio.file.Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(_.toString).toSet
    } finally s.close()
  }

  test("clone is one metadata commit: reads equal, zero data files copied") {
    cat
    val srcFiles = files(s"$wh/t/src")
    spark.sql("CALL cl.system.clone('t.src', 't.dst')")
    assert(files(s"$wh/t/dst").isEmpty, "shallow clone must copy no data file")
    assert(spark.sql("SELECT * FROM cl.t.dst ORDER BY k").collect().toSeq ==
      spark.sql("SELECT * FROM cl.t.src ORDER BY k").collect().toSeq)
    assert(files(s"$wh/t/src") == srcFiles)
    // manifest-stats aggregates answer through external entries too
    assert(spark.sql("SELECT count(*) AS n, max(k) AS m FROM cl.t.dst")
      .collect().toSeq == Seq(Row(4L, 4L)))
    // layout carried: partition-scoped metadata DELETE works on the clone
    spark.sql("DELETE FROM cl.t.dst WHERE p = 'A'")
    assert(spark.sql("SELECT count(*) FROM cl.t.dst").as[Long].head() == 2L)
  }

  test("clone and source diverge independently; source files survive clone vacuum") {
    cat
    spark.sql("CALL cl.system.clone('t.src', 't.fork')")
    val root = s"$wh/t/fork"
    // row-level DML on the clone rewrites a partition INTO the clone
    spark.sql("UPDATE cl.t.fork SET v = 40.0 WHERE k = 4")
    assert(files(root).nonEmpty, "the rewrite localizes files under the clone")
    assert(spark.sql("SELECT v FROM cl.t.src WHERE k = 4").as[Double].head() == 4.0,
      "the source never sees the clone's mutation")
    // compact bin-packs each partition's small files into clone-LOCAL
    // files — external references localize gradually through normal
    // maintenance
    TxTable.compact(spark, root)
    val snap = TxTable.currentSnapshot(spark, root).get
    assert(snap.entries.forall(!_.relPath.startsWith("/")),
      s"compact must localize every external entry: ${snap.entries}")
    // drop pre-localization history, then vacuum the clone
    val srcFiles = files(s"$wh/t/src")
    val deleted = TxTable.vacuum(spark, root, snap.version)
    assert(files(s"$wh/t/src") == srcFiles,
      s"clone vacuum (deleted $deleted) must never touch source files")
    assert(spark.sql("SELECT sum(v) FROM cl.t.fork").as[Double].head() ==
      1.0 + 2.0 + 3.0 + 40.0)
    // and the source still reads its original rows
    assert(spark.sql("SELECT sum(v) FROM cl.t.src").as[Double].head() == 10.0)
  }

  test("clone of a bucket table keeps the joinable layout; clone refuses onto an existing table") {
    cat
    spark.sql(
      "CREATE TABLE cl.t.bsrc (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(2, k))")
    spark.sql(
      "INSERT INTO cl.t.bsrc SELECT id AS k, id * 1.0 AS v FROM range(0, 20)")
    spark.sql("CALL cl.system.clone('t.bsrc', 't.bdst')")
    val snap = TxTable.currentSnapshot(spark, s"$wh/t/bdst").get
    assert(snap.entries.forall(_.partition.startsWith("_bucket=")))
    // appends to the clone keep bucketing (layout file copied)
    spark.sql("INSERT INTO cl.t.bdst SELECT id AS k, 0.0 AS v FROM range(20, 24)")
    val snap2 = TxTable.currentSnapshot(spark, s"$wh/t/bdst").get
    assert(snap2.entries.forall(_.partition.startsWith("_bucket=")))
    assert(spark.sql("SELECT count(*) FROM cl.t.bdst").as[Long].head() == 24L)
    val e = intercept[Exception] {
      spark.sql("CALL cl.system.clone('t.src', 't.bdst')")
    }
    assert(e.getMessage.contains("already exists and is non-empty"))
  }

  test("source vacuum refuses while a clone lives; force overrides; dropped clone unblocks") {
    cat
    spark.sql("CREATE TABLE cl.t.vsrc (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO cl.t.vsrc VALUES (1,'A'),(2,'B')")
    spark.sql("CALL cl.system.clone('t.vsrc', 't.vclone')")
    val srcRoot = s"$wh/t/vsrc"
    // compact the SOURCE so pre-compaction files become vacuum
    // candidates — exactly the files the clone's v0 still references
    TxTable.compact(spark, srcRoot)
    val v = TxTable.currentSnapshot(spark, srcRoot).get.version
    val e = intercept[IllegalArgumentException] {
      TxTable.vacuum(spark, srcRoot, v)
    }
    assert(e.getMessage.contains("live shallow clone"))
    // the guard runs on the SQL CALL surface too
    val e2 = intercept[Exception] {
      spark.sql(s"CALL cl.system.vacuum('t.vsrc', $v)").collect()
    }
    assert(e2.getMessage.contains("live shallow clone"))
    // the clone still reads its full v0 through external entries
    assert(spark.sql("SELECT count(*) FROM cl.t.vclone").as[Long].head() == 2L)
    // force overrides (the documented escape hatch) — but first prove
    // a DROPPED clone stops blocking: stale markers self-prune
    spark.sql("DROP TABLE cl.t.vclone")
    assert(TxTable.liveClones(spark, srcRoot).isEmpty)
    assert(TxTable.vacuum(spark, srcRoot, v) >= 0) // no clone, no refusal
    // and force is accepted on the SQL surface
    spark.sql(s"CALL cl.system.vacuum('t.vsrc', $v, true)").collect()
    assert(spark.sql("SELECT count(*) FROM cl.t.vsrc").as[Long].head() == 2L)
  }

  test("clone refuses a populated namespace directory as destination") {
    cat
    spark.sql("CREATE NAMESPACE cl.t.sub")
    spark.sql("CREATE TABLE cl.t.sub.inner (k BIGINT)")
    spark.sql("INSERT INTO cl.t.sub.inner VALUES (7)")
    // dst 't.sub' resolves to the namespace directory holding 'inner':
    // committing a _manifest there would convert the namespace into a
    // table and hide its children — must refuse, leaving it intact
    val e = intercept[Exception] {
      spark.sql("CALL cl.system.clone('t.src', 't.sub')")
    }
    assert(e.getMessage.contains("non-empty"))
    assert(spark.sql("SELECT k FROM cl.t.sub.inner").as[Long].head() == 7L)
    assert(spark.sql("SHOW NAMESPACES IN cl.t").collect()
      .exists(_.getString(0).endsWith("sub")))
  }

  test("time travel on the clone: v0 is the clone point, its own history after") {
    cat
    spark.sql("CALL cl.system.clone('t.src', 't.tt')")
    spark.sql("INSERT INTO cl.t.tt VALUES (9,'C',9.0)")
    assert(spark.sql("SELECT count(*) FROM cl.t.tt VERSION AS OF 0")
      .as[Long].head() == 4L)
    assert(spark.sql("SELECT count(*) FROM cl.t.tt").as[Long].head() == 5L)
    // restore across external entries verifies their existence directly
    spark.sql("CALL cl.system.restore('t.tt', 0)")
    assert(spark.sql("SELECT count(*) FROM cl.t.tt").as[Long].head() == 4L)
  }
}
