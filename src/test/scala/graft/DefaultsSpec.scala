package graft

import graft.sources.TxTable

/** Column DEFAULT values (Spark's SUPPORT_COLUMN_DEFAULT_VALUE over
  * the manifest's metadata-capable schema form): CREATE-time
  * defaults, partial INSERTs and the DEFAULT keyword, ALTER COLUMN
  * SET/DROP DEFAULT as versioned metadata commits, and refusal of
  * non-constant default expressions.
  */
class DefaultsSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_defaults_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gv.warehouse", wh)
    spark.sql("CREATE NAMESPACE gv.m")
  }

  test("CREATE-time defaults fill partial INSERTs and the DEFAULT keyword") {
    cat
    spark.sql("CREATE TABLE gv.m.t (k BIGINT, v DOUBLE DEFAULT 1.5, " +
      "tag STRING DEFAULT 'none') PARTITIONED BY (bucket(4, k))")
    val root = s"$wh/m/t"
    // the defaults persisted in the manifest's JSON schema form
    val json = TxTable.currentSnapshot(spark, root).get.schemaJson.get
    assert(json.contains("CURRENT_DEFAULT") && json.contains("1.5"))
    spark.sql("INSERT INTO gv.m.t (k) VALUES (1)")
    spark.sql("INSERT INTO gv.m.t VALUES (2, 9.0, 'x'), (3, DEFAULT, DEFAULT)")
    assert(spark.sql("SELECT k, v, tag FROM gv.m.t ORDER BY k")
      .collect().map(_.toString).toSeq ==
      Seq("[1,1.5,none]", "[2,9.0,x]", "[3,1.5,none]"))
  }

  test("ALTER COLUMN SET/DROP DEFAULT are versioned, affect future inserts only") {
    cat
    spark.sql("CREATE TABLE gv.m.a (k BIGINT, v DOUBLE DEFAULT 1.5)")
    spark.sql("INSERT INTO gv.m.a (k) VALUES (1)")
    val root = s"$wh/m/a"
    val vBefore = TxTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE gv.m.a ALTER COLUMN v SET DEFAULT 7.5")
    assert(TxTable.currentVersion(spark, root).get == vBefore + 1,
      "SET DEFAULT is one metadata commit")
    spark.sql("INSERT INTO gv.m.a (k) VALUES (2)")
    spark.sql("ALTER TABLE gv.m.a ALTER COLUMN v DROP DEFAULT")
    spark.sql("INSERT INTO gv.m.a (k) VALUES (3)")
    assert(spark.sql("SELECT k, v FROM gv.m.a ORDER BY k")
      .collect().map(_.toString).toSeq ==
      Seq("[1,1.5]", "[2,7.5]", "[3,null]"))
    // per-version schemas: the pre-SET version still records 1.5
    assert(TxTable.snapshot(spark, root, vBefore).schemaJson.get
      .contains("1.5"))
    // existing rows were never rewritten by any of it
    assert(TxTable.snapshot(spark, root, vBefore).entries.map(_.relPath)
      .forall(TxTable.currentSnapshot(spark, root).get.entries
        .map(_.relPath).contains))
  }

  test("ADD COLUMN DEFAULT backfills existing rows at read, metadata-only") {
    cat
    spark.sql("CREATE TABLE gv.m.ac (k BIGINT)")
    spark.sql("INSERT INTO gv.m.ac VALUES (1), (2)")
    val root = s"$wh/m/ac"
    val before = TxTable.currentSnapshot(spark, root).get
      .entries.map(_.relPath).toSet
    spark.sql("ALTER TABLE gv.m.ac ADD COLUMN w DOUBLE DEFAULT 3.0")
    spark.sql("INSERT INTO gv.m.ac (k) VALUES (9)")
    // existing rows read the frozen EXISTS_DEFAULT (the parquet
    // reader fills it for files lacking the column — zero rewrite),
    // the new row resolves CURRENT_DEFAULT
    assert(spark.sql("SELECT k, w FROM gv.m.ac ORDER BY k")
      .collect().map(_.toString).toSeq ==
      Seq("[1,3.0]", "[2,3.0]", "[9,3.0]"))
    assert(before.subsetOf(TxTable.currentSnapshot(spark, root).get
      .entries.map(_.relPath).toSet),
      "ADD COLUMN DEFAULT must not rewrite existing files")
    // the two defaults diverge after a SET DEFAULT: old files keep
    // the frozen backfill, new inserts take the new default
    spark.sql("ALTER TABLE gv.m.ac ALTER COLUMN w SET DEFAULT 8.0")
    spark.sql("INSERT INTO gv.m.ac (k) VALUES (10)")
    assert(spark.sql("SELECT k, w FROM gv.m.ac ORDER BY k")
      .collect().map(_.toString).toSeq ==
      Seq("[1,3.0]", "[2,3.0]", "[9,3.0]", "[10,8.0]"))
  }

  test("non-constant DEFAULT expressions refuse loudly") {
    cat
    spark.sql("CREATE TABLE gv.m.bad (k BIGINT, v DOUBLE)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gv.m.bad ALTER COLUMN v SET DEFAULT k + 1")
    }
    assert(e.getMessage.toLowerCase.contains("k") ||
      e.getMessage.contains("DEFAULT"), e.getMessage)
  }

  test("DML, programmatic appends, and relayout all work on defaults tables") {
    cat
    spark.sql("CREATE TABLE gv.m.x (k BIGINT, v DOUBLE DEFAULT 1.5) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gv.m.x (k) SELECT id FROM range(1, 21)")
    val root = s"$wh/m/x"
    // the persisted DDL form must stay metadata-free (parseable):
    // DEFAULT clauses live only in the JSON form
    val snap0 = TxTable.currentSnapshot(spark, root).get
    assert(!snap0.schemaDdl.contains("DEFAULT"),
      s"DDL form must not render defaults: ${snap0.schemaDdl}")
    assert(snap0.schemaJson.get.contains("CURRENT_DEFAULT"))
    // copy-on-write DML
    spark.sql("UPDATE gv.m.x SET v = 9.0 WHERE k = 1")
    // merge-on-read DML (delta writer parses the DDL on executors)
    spark.conf.set("spark.graft.dml.mode", "mor")
    try {
      spark.sql("DELETE FROM gv.m.x WHERE k = 2")
      spark.sql("UPDATE gv.m.x SET v = 8.0 WHERE k = 3")
    } finally spark.conf.unset("spark.graft.dml.mode")
    // programmatic append (plain DataFrame carries no metadata)
    TxTable.append(Seq((50L, 5.0)).toDF("k", "v"), root,
      Some("bucket(4,k)"))
    // re-layout (full rewrite through the metadata-capable schema)
    spark.sql(s"CALL gv.system.relayout('m.x', 'bucket(8, k)')")
    assert(spark.sql("SELECT v FROM gv.m.x WHERE k = 1")
      .as[Double].head() == 9.0)
    assert(spark.sql("SELECT v FROM gv.m.x WHERE k = 3")
      .as[Double].head() == 8.0)
    assert(spark.sql("SELECT count(*) FROM gv.m.x").as[Long].head() == 20L)
    // the default still resolves after all of it
    spark.sql("INSERT INTO gv.m.x (k) VALUES (99)")
    assert(spark.sql("SELECT v FROM gv.m.x WHERE k = 99")
      .as[Double].head() == 1.5)
  }

  test("mor DML refuses loudly on tables claiming _file/_pos") {
    cat
    spark.sql("CREATE TABLE gv.m.clash (k BIGINT, _file STRING)")
    spark.sql("INSERT INTO gv.m.clash VALUES (1, 'a')")
    spark.conf.set("spark.graft.dml.mode", "mor")
    try {
      val e = intercept[Exception] {
        spark.sql("DELETE FROM gv.m.clash WHERE k = 1")
      }
      assert(e.getMessage.contains("row-lineage"), e.getMessage)
    } finally spark.conf.unset("spark.graft.dml.mode")
  }

  test("a CREATE with an unanalyzable CHECK fails whole, leaving no table") {
    cat
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gv.m.broken (k BIGINT, " +
        "CONSTRAINT c CHECK (nope > 0))")
    }
    assert(e.getMessage.contains("does not analyze") ||
      e.getMessage.toLowerCase.contains("nope"), e.getMessage)
    assert(!spark.catalog.tableExists("gv.m.broken"),
      "a failing constraint must fail the whole CREATE")
  }

  test("defaults survive unrelated commits and restore") {
    cat
    spark.sql("CREATE TABLE gv.m.s (k BIGINT, v DOUBLE DEFAULT 2.5)")
    spark.sql("INSERT INTO gv.m.s (k) VALUES (1)")
    val root = s"$wh/m/s"
    spark.sql("ALTER TABLE gv.m.s ADD CONSTRAINT vp CHECK (v > 0)")
    spark.sql("INSERT INTO gv.m.s (k) VALUES (2)")
    assert(spark.sql("SELECT sum(v) FROM gv.m.s").as[Double].head() == 5.0)
    val vKeep = TxTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE gv.m.s ALTER COLUMN v DROP DEFAULT")
    spark.sql(s"CALL gv.system.restore('m.s', $vKeep)")
    spark.sql("INSERT INTO gv.m.s (k) VALUES (3)")
    assert(spark.sql("SELECT v FROM gv.m.s WHERE k = 3")
      .as[Double].head() == 2.5, "restore must revert the schema metadata")
  }
}
