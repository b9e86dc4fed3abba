package graft

import graft.sources.TxTable

/** Versioned table properties (SQL `TBLPROPERTIES` / `ALTER TABLE
  * SET/UNSET TBLPROPERTIES` → manifest `#prop=` lines): properties
  * ride the same commit/carry-forward machinery as every other
  * metadata, so time travel and restore see per-version maps — and
  * `write.dml.mode=mor` makes merge-on-read the PER-TABLE default
  * for plain SQL DML (session conf still overrides per statement).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_props_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.warehouse", wh)
    spark.sql("CREATE NAMESPACE gp.t")
  }

  private def mk(name: String, tblprops: String = ""): String = {
    cat
    spark.sql(s"CREATE TABLE gp.t.$name (k BIGINT, p STRING, v DOUBLE) " +
      s"PARTITIONED BY (bucket(4, k)) $tblprops")
    (1 to 50).map(k => (k.toLong, if (k % 2 == 0) "e" else "o", k * 1.0))
      .toDF("k", "p", "v").writeTo(s"gp.t.$name").append()
    s"$wh/t/$name"
  }

  test("SET/UNSET TBLPROPERTIES are versioned metadata-only commits") {
    val root = mk("basic")
    val v0 = TxTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE gp.t.basic " +
      "SET TBLPROPERTIES('team'='etl', 'retention.hours'='168')")
    val s1 = TxTable.currentSnapshot(spark, root).get
    assert(s1.version == v0 + 1 &&
      s1.props == Map("team" -> "etl", "retention.hours" -> "168"))
    // metadata-only: entries untouched
    assert(s1.entries.map(_.relPath) ==
      TxTable.snapshot(spark, root, v0).entries.map(_.relPath))
    spark.sql("ALTER TABLE gp.t.basic UNSET TBLPROPERTIES('team')")
    assert(TxTable.currentSnapshot(spark, root).get.props ==
      Map("retention.hours" -> "168"))
    // time travel shows each version's own map
    assert(TxTable.snapshot(spark, root, v0).props.isEmpty)
    assert(TxTable.snapshot(spark, root, v0 + 1).props.contains("team"))
    // properties carry forward through ordinary commits
    spark.sql("INSERT INTO gp.t.basic VALUES (51, 'o', 51.0)")
    assert(TxTable.currentSnapshot(spark, root).get.props ==
      Map("retention.hours" -> "168"))
    // and surface through SHOW TBLPROPERTIES
    val shown = spark.sql("SHOW TBLPROPERTIES gp.t.basic")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("retention.hours").contains("168"))
  }

  test("engine-computed keys refuse SET; restore reverts properties") {
    val root = mk("guard")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gp.t.guard SET TBLPROPERTIES('version'='9')")
    }
    assert(e.getMessage.contains("read-only"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gp.t.guard SET TBLPROPERTIES('check.x'='k>0')")
    }
    assert(e2.getMessage.contains("read-only"))
    spark.sql("ALTER TABLE gp.t.guard SET TBLPROPERTIES('a'='1')")
    val vWith = TxTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE gp.t.guard UNSET TBLPROPERTIES('a')")
    spark.sql(s"CALL gp.system.restore('t.guard', $vWith)")
    assert(TxTable.currentSnapshot(spark, root).get.props == Map("a" -> "1"))
  }

  test("write.dml.mode=mor makes merge-on-read the table's DML default") {
    val root = mk("mode",
      "TBLPROPERTIES('write.dml.mode'='mor')")
    val before = TxTable.currentSnapshot(spark, root).get
      .entries.map(_.relPath).toSet
    spark.sql("DELETE FROM gp.t.mode WHERE k % 7 = 0")
    val snap = TxTable.currentSnapshot(spark, root).get
    assert(snap.entries.map(_.relPath).toSet == before,
      "table-default mor DELETE must not rewrite data files")
    assert(snap.dvs.map(_.rows).sum == 7L)
    // an EXPLICIT session conf overrides the table property
    spark.conf.set("spark.graft.dml.mode", "cow")
    try spark.sql("DELETE FROM gp.t.mode WHERE k = 1")
    finally spark.conf.unset("spark.graft.dml.mode")
    val cow = TxTable.currentSnapshot(spark, root).get
    assert(cow.entries.map(_.relPath).toSet != snap.entries.map(_.relPath).toSet,
      "session cow override must rewrite the touched group")
    assert(spark.sql("SELECT count(*) FROM gp.t.mode").as[Long].head() ==
      50L - 7L - 1L)
  }
}
