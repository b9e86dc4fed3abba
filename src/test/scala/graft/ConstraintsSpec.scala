package graft

import graft.sources.TxTable

/** SQL CHECK constraints as first-class DDL (Spark 4's v2 constraint
  * API → the engine's versioned CHECK map): inline CONSTRAINT in
  * CREATE TABLE, ALTER TABLE ADD/DROP CONSTRAINT, DESCRIBE surface,
  * Spark-side write enforcement on top of the engine's own
  * commit-time enforcement, and loud refusal of constraint kinds
  * nothing enforces.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_cons_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.gn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gn.warehouse", wh)
    spark.sql("CREATE NAMESPACE gn.m")
  }

  test("inline CHECK at CREATE: stored versioned, enforced, described") {
    cat
    spark.sql("CREATE TABLE gn.m.t (k BIGINT, v DOUBLE, " +
      "CONSTRAINT v_pos CHECK (v >= 0)) PARTITIONED BY (bucket(4, k))")
    val root = s"$wh/m/t"
    assert(TxTable.currentSnapshot(spark, root).get.checks ==
      Map("v_pos" -> "v >= 0"))
    spark.sql("INSERT INTO gn.m.t VALUES (1, 1.0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gn.m.t VALUES (2, -5.0)")
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM gn.m.t").as[Long].head() == 1L)
    val desc = spark.sql("DESCRIBE EXTENDED gn.m.t")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("# Constraints") && desc.contains("CHECK (v >= 0)"),
      desc)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT are versioned metadata commits") {
    cat
    spark.sql("CREATE TABLE gn.m.a (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gn.m.a VALUES (1, 1.0), (2, 2.0)")
    val root = s"$wh/m/a"
    spark.sql("ALTER TABLE gn.m.a ADD CONSTRAINT k_small CHECK (k < 1000)")
    assert(TxTable.currentSnapshot(spark, root).get.checks ==
      Map("k_small" -> "k < 1000"))
    // adding a constraint EXISTING rows violate refuses — Spark
    // validates the table before alterTable even reaches the engine
    // (and addCheck's own validation backstops programmatic callers)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gn.m.a ADD CONSTRAINT v_big CHECK (v > 10)")
    }
    assert(e.getMessage.contains("v > 10"), e.getMessage)
    spark.sql("ALTER TABLE gn.m.a DROP CONSTRAINT k_small")
    assert(TxTable.currentSnapshot(spark, root).get.checks.isEmpty)
    // IF EXISTS tolerates a missing name; plain DROP refuses
    spark.sql("ALTER TABLE gn.m.a DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception] {
      spark.sql("ALTER TABLE gn.m.a DROP CONSTRAINT nope")
    }
  }

  test("non-CHECK constraints refuse loudly instead of decorating") {
    cat
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gn.m.pk (k BIGINT, v DOUBLE, " +
        "CONSTRAINT pk PRIMARY KEY (k))")
    }
    assert(e.getMessage.contains("CHECK constraints only"), e.getMessage)
    assert(!spark.catalog.tableExists("gn.m.pk"))
  }
}
