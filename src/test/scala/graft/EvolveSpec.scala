package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{ChangeFeed, MergeOnRead, TxTable}

/** Schema evolution beyond add/drop: RENAME COLUMN (metadata-only via
  * manifest aliases + coalescing reads) and TYPE WIDENING
  * (metadata-only via the parquet reader's value-preserving upcasts).
  * Time travel preserves each version's own schema; localization is an
  * explicit full rewrite (CALL rewrite_table).
  */
class EvolveSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String) =
    s"target/tmp/evolve_${tag}_${System.nanoTime()}"

  private def seed = (1L to 50L).map(k =>
    (k, s"n$k", k.toInt)).toDF("k", "name", "qty")

  test("renameColumn is metadata-only; reads coalesce old files' historical name") {
    val root = freshRoot("rn")
    TxTable.create(seed, root, None)
    val before = TxTable.currentSnapshot(spark, root).get.entries.toSet
    TxTable.renameColumn(spark, root, "name", "title")          // v1
    val snap = TxTable.currentSnapshot(spark, root).get
    assert(snap.entries.toSet == before, "rename must not rewrite files")
    assert(snap.aliases == Map("title" -> Seq("name")))
    val back = TxTable.read(spark, root)
    assert(back.schema.fieldNames.toSeq == Seq("k", "title", "qty"))
    assert(back.select("k", "title").as[(Long, String)].collect().toMap
      == (1L to 50L).map(k => k -> s"n$k").toMap)
    // appends carry the NEW name; mixed old/new files still coalesce
    TxTable.append((51L to 60L).map(k => (k, s"n$k", k.toInt))
      .toDF("k", "title", "qty"), root, None)                    // v2
    assert(TxTable.read(spark, root).select("title").as[String]
      .collect().toSet == (1L to 60L).map(k => s"n$k").toSet)
    // a second rename chains the alias history
    TxTable.renameColumn(spark, root, "title", "label")          // v3
    assert(TxTable.currentSnapshot(spark, root).get.aliases ==
      Map("label" -> Seq("name", "title")))
    assert(TxTable.read(spark, root).select("label").as[String]
      .collect().toSet == (1L to 60L).map(k => s"n$k").toSet)
    // time travel reads each version under its OWN schema
    assert(TxTable.readVersion(spark, root, 0L).schema.fieldNames.toSeq
      == Seq("k", "name", "qty"))
    assert(TxTable.readVersion(spark, root, 1L).schema.fieldNames.toSeq
      == Seq("k", "title", "qty"))
    // readWhere on the renamed column: stats keyed by the old physical
    // name cannot prune old files, but the answer stays exact
    assert(TxTable.readWhere(spark, root, col("label") === "n7")
      .select("k").as[Long].collect().toSeq == Seq(7L))
  }

  test("rename refusals: layout column, collisions, CHECKs") {
    val root = freshRoot("rnref")
    TxTable.create(seed.withColumn("p", col("k") % 2), root, Some("p"))
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, root, "p", "part")
    }
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, root, "name", "qty")
    }
    TxTable.renameColumn(spark, root, "name", "title")
    // the historical name cannot be reused while the alias lives
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, root, "title", "name")
    }
    intercept[IllegalArgumentException] {
      TxTable.addColumns(spark, root,
        Seq(StructField("name", StringType)))
    }
    // a CHECK on the to-be-renamed column refuses the rename
    TxTable.addCheck(spark, root, "qty_pos", "qty >= 0")
    TxTable.renameColumn(spark, root, "title", "label") // unrelated: fine
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, root, "qty", "amount")
    }
  }

  test("SQL surface: ALTER TABLE RENAME COLUMN + ALTER COLUMN TYPE + rewrite_table") {
    val wh = freshRoot("sqlwh")
    spark.conf.set("spark.sql.catalog.gev", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gev.warehouse", wh)
    spark.sql("CREATE NAMESPACE gev.m")
    spark.sql("CREATE TABLE gev.m.t (k INT, name STRING, v FLOAT)")
    spark.sql("INSERT INTO gev.m.t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    spark.sql("ALTER TABLE gev.m.t RENAME COLUMN name TO title")
    spark.sql("ALTER TABLE gev.m.t ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE gev.m.t ALTER COLUMN v TYPE DOUBLE")
    // merged read through the catalog: old files' name + narrow types
    assert(spark.sql("SELECT k, title, v FROM gev.m.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
    // post-evolution INSERT carries the new shape; both generations read
    spark.sql("INSERT INTO gev.m.t VALUES (3000000000, 'c', 3.5)")
    assert(spark.sql("SELECT sum(k) FROM gev.m.t").as[Long].head()
      == 3000000003L)
    // DML refuses while the rename is metadata-only…
    val e = intercept[Exception] {
      spark.sql("UPDATE gev.m.t SET v = 0.0 WHERE k = 1")
    }
    assert(e.getMessage.contains("rewrite_table"), e.getMessage)
    // …and works after localization
    spark.sql("CALL gev.system.rewrite_table('m.t')")
    val snap = TxTable.currentSnapshot(spark, s"$wh/m/t").get
    assert(snap.aliases.isEmpty, "rewrite_table must clear aliases")
    spark.sql("UPDATE gev.m.t SET v = 0.0 WHERE k = 1")
    assert(spark.sql("SELECT v FROM gev.m.t WHERE k = 1")
      .as[Double].head() == 0.0)
    assert(spark.sql("SELECT count(*) FROM gev.m.t").as[Long].head() == 3L)
  }

  test("widenColumn: value-preserving upcasts only; bucket layout column refuses") {
    val root = freshRoot("wd")
    TxTable.create(seed, root, None)
    val before = TxTable.currentSnapshot(spark, root).get.entries.toSet
    TxTable.widenColumn(spark, root, "qty", LongType)
    assert(TxTable.currentSnapshot(spark, root).get.entries.toSet == before,
      "widening must not rewrite files")
    assert(TxTable.read(spark, root).schema("qty").dataType == LongType)
    assert(TxTable.read(spark, root).agg(sum("qty")).as[Long].head()
      == (1 to 50).map(_.toLong).sum)
    // narrowing and lossy changes refuse
    intercept[IllegalArgumentException] {
      TxTable.widenColumn(spark, root, "qty", IntegerType)
    }
    intercept[IllegalArgumentException] {
      TxTable.widenColumn(spark, root, "qty", FloatType)
    }
    // CHECKs must re-analyze (and keep holding — values unchanged)
    TxTable.addCheck(spark, root, "k_pos", "k > 0")
    intercept[IllegalArgumentException] { // k is already LongType: no-op refused
      TxTable.widenColumn(spark, root, "k", LongType)
    }
  }

  test("widening a bucket layout column refuses (hash is type-dependent)") {
    val wh = freshRoot("wdbkt")
    spark.conf.set("spark.sql.catalog.gwb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwb.warehouse", wh)
    spark.sql("CREATE NAMESPACE gwb.m")
    spark.sql(
      "CREATE TABLE gwb.m.t (k INT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gwb.m.t VALUES (1, 1.0)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gwb.m.t ALTER COLUMN k TYPE BIGINT")
    }
    assert(e.getMessage.contains("placement parity"), e.getMessage)
  }

  test("rename composes with merge-on-read deletes, CDF, and compaction") {
    val root = freshRoot("mix")
    TxTable.create(seed.repartition(4), root, None)             // v0
    TxTable.renameColumn(spark, root, "name", "title")          // v1
    // MoR delete ON the renamed column (alias-projected condition)
    val (_, n) = MergeOnRead.deleteWhere(spark, root,
      col("title").isin("n3", "n4"))                            // v2
    assert(n == 2L)
    assert(TxTable.read(spark, root).count() == 48L)
    // CDF across the rename+delete versions surfaces the deletes
    // under the NEW column name
    val cdf = ChangeFeed.between(spark, root, 0L, 2L, Seq("k"))
    assert(cdf.schema.fieldNames.contains("title"))
    assert(cdf.filter(col(ChangeFeed.OpCol) === "delete")
      .select("k").as[Long].collect().toSet == Set(3L, 4L))
    // compaction localizes BOTH: fresh files carry the new name and
    // shed deleted rows; reads stay exact
    TxTable.compact(spark, root)                                // v3
    assert(TxTable.read(spark, root).select("title").as[String]
      .collect().toSet == (1L to 50L).filterNot(Set(3L, 4L).contains)
        .map(k => s"n$k").toSet)
  }

  test("widenColumn refuses exact-type no-ops and unsupported pairs") {
    val root = freshRoot("wdref")
    TxTable.create(Seq((1, BigDecimal("1.23"))).toDF("k", "d")
      .select(col("k"), col("d").cast("decimal(5,2)").as("d")), root, None)
    TxTable.widenColumn(spark, root, "d", DecimalType(10, 2))
    assert(TxTable.read(spark, root).select("d").as[BigDecimal].head()
      == BigDecimal("1.23"))
    // scale change is NOT value-preserving at the physical layer
    intercept[IllegalArgumentException] {
      TxTable.widenColumn(spark, root, "d", DecimalType(12, 4))
    }
    // beyond INT64-backed precision the reader cannot upcast
    intercept[IllegalArgumentException] {
      TxTable.widenColumn(spark, root, "d", DecimalType(22, 2))
    }
    TxTable.widenColumn(spark, root, "k", DoubleType)
    assert(TxTable.read(spark, root).select("k").as[Double].head() == 1.0)
  }
}
