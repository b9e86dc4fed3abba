package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Bucket-partitioned tables (`PARTITIONED BY (bucket(N, col))`):
  * hash-bucket layout for HIGH-cardinality keys — the keys that could
  * never partition by value — feeding the same storage-partitioned
  * join machinery as identity layouts, via the catalog's bucket
  * function (write path and Spark's key-grouped planning bind the
  * identical murmur3-pmod).
  */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_bucket_${System.nanoTime()}"

  private lazy val cat: Unit = {
    spark.conf.set("spark.sql.catalog.bk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bk.warehouse", wh)
    spark.sql("CREATE NAMESPACE bk.t")
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case s: ShuffleExchangeLike => s
    case a: AdaptiveSparkPlanExec => return shuffles(a.executedPlan)
  }

  private def withSpj[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.graft.preserveDataGrouping" -> "true",
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

  test("bucketed CREATE/INSERT round-trips; layout writes _bucket partitions") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.f1 (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql(
      "INSERT INTO bk.t.f1 SELECT id AS k, id * 1.5 AS v FROM range(0, 100)")
    assert(spark.sql("SELECT count(*) FROM bk.t.f1").as[Long].head() == 100L)
    assert(spark.sql("SELECT sum(k) FROM bk.t.f1").as[Long].head() == 4950L)
    val snap = TxTable.currentSnapshot(spark, s"$wh/t/f1").get
    val parts = snap.entries.map(_.partition).toSet
    assert(parts.forall(_.startsWith("_bucket=")), s"got $parts")
    assert(parts.size == 4, s"100 sequential keys must hit all 4 buckets: $parts")
    // the manifest bucket ids agree with the engine's hash definition
    val expected = spark.range(0, 100)
      .select(pmod(hash(col("id")), lit(4)).cast("string")).distinct()
      .as[String].collect().toSet.map("_bucket=" + (_: String))
    assert(parts == expected)
  }

  test("co-bucketed join on the raw key plans with zero shuffles and exact rows") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.f2 (k BIGINT, w DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql(
      "INSERT INTO bk.t.f2 SELECT id AS k, id * 10.0 AS w FROM range(50, 150)")
    val joinSql =
      """SELECT a.k, a.v, b.w FROM bk.t.f1 a JOIN bk.t.f2 b ON a.k = b.k"""
    val spjRows = withSpj {
      val q = spark.sql(joinSql)
      assert(shuffles(q.queryExecution.executedPlan).isEmpty,
        s"expected a bucket storage-partitioned join, got:\n${q.queryExecution.executedPlan}")
      q.collect().toSeq
    }
    // overlap is k in [50, 100): 50 rows, exact values
    assert(spjRows.size == 50)
    assert(spjRows.sortBy(_.getLong(0)) ==
      (50L until 100L).map(k => Row(k, k * 1.5, k * 10.0)))
    // flag off (broadcast also disabled so the comparison plan is the
    // exchange join, not a broadcast): same rows, shuffles present
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q2 = spark.sql(joinSql)
      assert(shuffles(q2.queryExecution.executedPlan).nonEmpty)
      assert(q2.collect().toSeq.sortBy(_.getLong(0)) ==
        (50L until 100L).map(k => Row(k, k * 1.5, k * 10.0)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("row-level DML on bucket layout: bucket-group CoW, untouched buckets keep their files") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.dml (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(8, k))")
    spark.sql(
      "INSERT INTO bk.t.dml SELECT id AS k, id * 1.0 AS v FROM range(0, 200)")
    val root = s"$wh/t/dml"
    val before = TxTable.currentSnapshot(spark, root).get
    // key-equality DELETE rewrites ONLY the key's bucket group
    spark.sql("DELETE FROM bk.t.dml WHERE k = 55")
    val afterDel = TxTable.currentSnapshot(spark, root).get
    assert(spark.sql("SELECT count(*) FROM bk.t.dml").as[Long].head() == 199L)
    assert(spark.sql("SELECT count(*) FROM bk.t.dml WHERE k = 55")
      .as[Long].head() == 0L)
    val freshFiles = afterDel.entries.filterNot(before.entries.toSet)
    val changed = freshFiles.map(_.partition).toSet
    assert(changed.size == 1,
      s"a one-key DELETE must rewrite exactly one bucket group, got $changed")
    assert(freshFiles.size == 1,
      s"the rewritten group must land as ONE file (bucket-transform " +
        s"clustering), got ${freshFiles.map(_.relPath)}")
    // rewritten rows stay in their hash bucket: every entry's rows
    // must agree with the catalog's own bucket function
    afterDel.entries.foreach { e =>
      val id = e.partition.stripPrefix("_bucket=").toInt
      val off = spark.read.parquet(s"$root/${e.relPath}")
        .where(pmod(hash($"k"), lit(8)) =!= id).count()
      assert(off == 0L, s"${e.relPath} holds rows outside ${e.partition}")
    }
    // row-predicate UPDATE (no key conjunct): all buckets eligible,
    // values land correctly
    spark.sql("UPDATE bk.t.dml SET v = -1.0 WHERE k % 50 = 1")
    assert(spark.sql("SELECT count(*) FROM bk.t.dml WHERE v = -1.0")
      .as[Long].head() == 4L) // k = 1, 51, 101, 151
    // MERGE: update one key, insert a new one
    spark.sql("CREATE TABLE bk.t.dml_src (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO bk.t.dml_src VALUES (60, 600.0), (1000, 1.0)")
    spark.sql(
      """MERGE INTO bk.t.dml t USING bk.t.dml_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT v FROM bk.t.dml WHERE k = 60").as[Double].head()
      == 600.0)
    assert(spark.sql("SELECT v FROM bk.t.dml WHERE k = 1000").as[Double].head()
      == 1.0)
    assert(spark.sql("SELECT count(*) FROM bk.t.dml").as[Long].head() == 200L)
    // the table stays SPJ-joinable shuffle-free after all three ops
    withSpj {
      val q = spark.sql(
        "SELECT a.k FROM bk.t.dml a JOIN bk.t.dml b ON a.k = b.k")
      assert(shuffles(q.queryExecution.executedPlan).isEmpty,
        "bucket layout must survive row-level DML")
      assert(q.count() == 200L)
    }
    // TRUNCATE still rides the metadata path
    spark.sql("TRUNCATE TABLE bk.t.dml")
    assert(spark.sql("SELECT count(*) FROM bk.t.dml").as[Long].head() == 0L)
  }

  test("point lookup on a bucket table scans only the key's bucket group") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.pt (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(8, k))")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO bk.t.pt SELECT id AS k, id * 1.0 AS v " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val root = s"$wh/t/pt"
    val snap = TxTable.currentSnapshot(spark, root).get
    def listedOf(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // execute so the scan lists
      def deep(p: SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = {
        val here = p.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }
        here ++ p.collect {
          case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            deep(q.plan)
        }.flatten
      }
      val scans = deep(df.queryExecution.executedPlan)
      assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
      scans.head.scan
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
        .fileIndex.asInstanceOf[graft.sources.GraftPartitioningIndex]
        .delegate.lastListedCount
    }
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal => CLit}
    import graft.sources.{FileStats, Layout}
    val kAttr = spark.sql("SELECT * FROM bk.t.pt").queryExecution
      .analyzed.output.find(_.name == "k").get
    val ddl = org.apache.spark.sql.types.StructType.fromDDL(snap.schemaDdl)
    def statsSurvivors(key: Long): Seq[graft.sources.TxTable.Entry] =
      snap.entries.filterNot(e =>
        FileStats.provesEmpty(EqualTo(kAttr, CLit(key)), ddl, e.stats))
    def idOf(key: Long): Int = spark.range(1).select(
      pmod(hash(lit(key)), lit(8)).cast("int")).as[Int].head()
    // equality: listed = the key's bucket group ∩ stats survivors, and
    // STRICTLY fewer than stats alone would keep (group pruning earns
    // its keep where min/max on a hash-distributed key cannot)
    val expect1 = statsSurvivors(5L)
      .count(_.partition == s"_bucket=${idOf(5L)}")
    val q1 = spark.sql("SELECT v FROM bk.t.pt WHERE k = 5")
    assert(q1.collect().map(_.getDouble(0)).toSeq == Seq(5.0))
    assert(listedOf(q1) == expect1,
      s"k=5 must list bucket ${idOf(5L)}'s stats-surviving $expect1 files")
    assert(expect1 < statsSurvivors(5L).size,
      "group pruning must beat stats-only pruning on this layout")
    // IN-list: union of the members' bucket groups (∩ per-key stats)
    val inIds = Seq(5L, 105L, 205L).map(idOf).toSet
    val expectIn = Seq(5L, 105L, 205L).flatMap(k => statsSurvivors(k)
      .filter(_.partition == s"_bucket=${idOf(k)}")).distinct.size
    val q2 = spark.sql("SELECT sum(v) FROM bk.t.pt WHERE k IN (5, 105, 205)")
    assert(q2.as[Double].head() == 315.0)
    assert(listedOf(q2) <= snap.entries.count(e =>
      inIds.contains(e.partition.stripPrefix("_bucket=").toInt)),
      "IN-list must stay within the member buckets' groups")
    assert(listedOf(q2) >= expectIn,
      "IN-list pruning must keep every possibly-matching file")
    // a non-enumerable predicate scans everything (no wrong pruning)
    val q3 = spark.sql("SELECT count(*) FROM bk.t.pt WHERE k % 2 = 0")
    assert(q3.as[Long].head() == 150L)
  }

  test("allowedByFilters: enumerable shapes bound the bucket set, everything else declines") {
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, GreaterThan, In, InSet, Literal => CL, Or}
    import org.apache.spark.sql.types.LongType
    import graft.sources.BucketIds
    val n = 16
    val k = AttributeReference("k", LongType)()
    val other = AttributeReference("x", LongType)()
    def id(v: java.lang.Long): Int = spark.range(1).select(
      pmod(hash(lit(v).cast("bigint")), lit(n)).cast("int")).as[Int].head()
    def run(es: org.apache.spark.sql.catalyst.expressions.Expression*) =
      BucketIds.allowedByFilters(Seq("k"), n, es.toSeq)
    assert(run(EqualTo(k, CL(7L))) == Some(Set(id(7L))))
    assert(run(EqualTo(CL(7L), k)) == Some(Set(id(7L))))
    // k = NULL matches nothing; k <=> NULL pins null's bucket
    assert(run(EqualTo(k, CL(null, LongType))) == Some(Set.empty[Int]))
    assert(run(EqualNullSafe(k, CL(null, LongType))) == Some(Set(id(null))))
    assert(run(In(k, Seq(CL(1L), CL(2L), CL(null, LongType)))) ==
      Some(Set(id(1L), id(2L))))
    assert(run(InSet(k, Set[Any](1L, 2L))) == Some(Set(id(1L), id(2L))))
    // AND: an enumerable side bounds the conjunction; OR needs both
    assert(run(And(EqualTo(k, CL(7L)), GreaterThan(other, CL(0L)))) ==
      Some(Set(id(7L))))
    assert(run(Or(EqualTo(k, CL(1L)), EqualTo(k, CL(2L)))) ==
      Some(Set(id(1L), id(2L))))
    assert(run(Or(EqualTo(k, CL(1L)), GreaterThan(k, CL(0L)))).isEmpty)
    // separate conjuncts intersect: k=1 AND k IN (1,2) -> {id(1)}
    assert(run(EqualTo(k, CL(1L)), In(k, Seq(CL(1L), CL(2L)))) ==
      Some(Set(id(1L))))
    // non-enumerable or other-column-only filters impose no bound
    assert(run(GreaterThan(k, CL(5L))).isEmpty)
    assert(run(EqualTo(other, CL(5L))).isEmpty)
  }

  test("INSERT OVERWRITE re-buckets through the layout file") {
    cat
    spark.sql(
      "INSERT OVERWRITE bk.t.f2 SELECT id AS k, 1.0 AS w FROM range(0, 8)")
    val snap = TxTable.currentSnapshot(spark, s"$wh/t/f2").get
    assert(snap.entries.forall(_.partition.startsWith("_bucket=")),
      "overwrite must preserve the bucket layout")
    assert(spark.sql("SELECT count(*) FROM bk.t.f2").as[Long].head() == 8L)
    spark.sql("TRUNCATE TABLE bk.t.f2")
    assert(spark.sql("SELECT count(*) FROM bk.t.f2").as[Long].head() == 0L)
  }

  test("bucket append pre-places rows: one file per occupied bucket per INSERT") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.opt (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    // range() plans many input partitions; without pre-placement every
    // task would write a file per bucket it sees (tasks × 4 files)
    spark.sql("INSERT INTO bk.t.opt SELECT id AS k, id * 1.0 AS v " +
      "FROM range(0, 1000)")
    val snap = TxTable.currentSnapshot(spark, s"$wh/t/opt").get
    assert(snap.entries.size == 4,
      s"one file per bucket, got ${snap.entries.map(_.relPath)}")
    assert(snap.entries.map(_.partition).toSet.size == 4)
    assert(spark.sql("SELECT sum(k) FROM bk.t.opt").as[Long].head() ==
      (0L until 1000L).sum)
  }

  test("compact preserves bucket partition strings and the joinable layout") {
    cat
    spark.sql(
      "CREATE TABLE bk.t.c (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(2, k))")
    // several small commits -> many small files per bucket
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO bk.t.c SELECT id AS k, id * 1.0 AS v " +
        s"FROM range(${i * 10}, ${i * 10 + 10})")
    }
    val root = s"$wh/t/c"
    val before = TxTable.currentSnapshot(spark, root).get
    assert(before.entries.size > 2)
    TxTable.compact(spark, root)
    val after = TxTable.currentSnapshot(spark, root).get
    assert(after.entries.size == 2, s"one file per bucket: ${after.entries}")
    assert(after.entries.map(_.partition).toSet ==
      Set("_bucket=0", "_bucket=1"))
    assert(spark.sql("SELECT sum(k) FROM bk.t.c").as[Long].head() ==
      (0 until 30).map(_.toLong).sum)
    // still joinable shuffle-free after compaction
    withSpj {
      val q = spark.sql(
        "SELECT a.k FROM bk.t.c a JOIN bk.t.c b ON a.k = b.k")
      assert(shuffles(q.queryExecution.executedPlan).isEmpty)
      assert(q.count() == 30L)
    }
  }

  test("unsupported bucket column types refuse at CREATE") {
    cat
    val e = intercept[Exception] {
      spark.sql(
        "CREATE TABLE bk.t.bad (k DOUBLE, v DOUBLE) PARTITIONED BY (bucket(4, k))")
    }
    assert(e.getMessage.contains("unsupported bucket column type"))
  }

  test("composite bucket keys: placement parity, SPJ zero-shuffle, DML group pruning") {
    cat
    spark.sql(
      """CREATE TABLE bk.t.m1 (k1 BIGINT, k2 STRING, v DOUBLE)
        |PARTITIONED BY (bucket(4, k1, k2))""".stripMargin)
    spark.sql(
      """INSERT INTO bk.t.m1
        |SELECT id AS k1, concat('g', id % 3) AS k2, id * 1.5 AS v
        |FROM range(0, 120)""".stripMargin)
    val root = s"$wh/t/m1"
    val snap = TxTable.currentSnapshot(spark, root).get
    val parts = snap.entries.map(_.partition).toSet
    assert(parts.forall(_.startsWith("_bucket=")), s"got $parts")
    // placement parity: manifest bucket ids = pmod(hash(k1, k2), 4)
    // (the SAME multi-column murmur3 fold everywhere)
    val expected = spark.range(0, 120)
      .select(pmod(hash(col("id"), concat(lit("g"), col("id") % 3)), lit(4))
        .cast("string")).distinct()
      .as[String].collect().toSet.map("_bucket=" + (_: String))
    assert(parts == expected, s"parts=$parts expected=$expected")
    snap.entries.foreach { e =>
      val id = e.partition.stripPrefix("_bucket=").toInt
      val off = spark.read.parquet(s"$root/${e.relPath}")
        .where(pmod(hash($"k1", $"k2"), lit(4)) =!= id).count()
      assert(off == 0L, s"${e.relPath} holds rows outside ${e.partition}")
    }

    // co-bucketed two-column join: exact rows. NOTE the zero-shuffle
    // SPJ contract stays SINGLE-column: Spark 4.1's
    // KeyGroupedPartitioning accepts only single-argument transforms
    // (isSupportedTransform requires children.size == 1), so the
    // keyed-scan shape deliberately declines composite layouts
    // (KeyedLayout.groups) rather than bound parallelism for nothing.
    spark.sql(
      """CREATE TABLE bk.t.m2 (k1 BIGINT, k2 STRING, w DOUBLE)
        |PARTITIONED BY (bucket(4, k1, k2))""".stripMargin)
    spark.sql(
      """INSERT INTO bk.t.m2
        |SELECT id AS k1, concat('g', id % 3) AS k2, id * 10.0 AS w
        |FROM range(60, 180)""".stripMargin)
    withSpj {
      val q = spark.sql(
        """SELECT a.k1, a.v, b.w FROM bk.t.m1 a JOIN bk.t.m2 b
          |ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin)
      val rows = q.collect().toSeq
      assert(rows.size == 60)
      assert(rows.sortBy(_.getLong(0)) ==
        (60L until 120L).map(k => Row(k, k * 1.5, k * 10.0)))
    }

    // composite-key equality DELETE: static candidate enumeration
    // prunes the rewrite to ONE bucket group
    val before = TxTable.currentSnapshot(spark, root).get
    spark.sql("DELETE FROM bk.t.m1 WHERE k1 = 55 AND k2 = 'g1'")
    val afterDel = TxTable.currentSnapshot(spark, root).get
    assert(spark.sql("SELECT count(*) FROM bk.t.m1").as[Long].head() == 119L)
    val fresh = afterDel.entries.filterNot(before.entries.toSet)
    assert(fresh.map(_.partition).toSet.size == 1,
      s"composite-key DELETE must rewrite one bucket group, got " +
        s"${fresh.map(_.partition)}")
    val dropped = before.entries.map(_.relPath).toSet --
      afterDel.entries.map(_.relPath).toSet
    val droppedParts = before.entries
      .filter(e => dropped.contains(e.relPath)).map(_.partition).toSet
    assert(droppedParts.size == 1,
      s"only the matching bucket's files may be replaced: $droppedParts")

    // point lookup on the FULL key prunes the ordinary read to one
    // bucket group (manifest-level pruning via the composite hash)
    val idx = new graft.sources.GraftFileIndex(spark, root, afterDel)
    idx.listFiles(Nil, Nil)
    val listedAll = idx.lastListedCount
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo, Literal => CLit}
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val k1a = AttributeReference("k1", LongType)()
    val k2a = AttributeReference("k2", StringType)()
    idx.listFiles(Nil, Seq(
      EqualTo(k1a, CLit(77L)),
      EqualTo(k2a, CLit(UTF8String.fromString("g2"), StringType))))
    assert(idx.lastListedCount < listedAll,
      s"full-key point lookup must prune bucket groups " +
        s"(${idx.lastListedCount}/$listedAll listed)")
    val q = spark.sql(
      "SELECT v FROM bk.t.m1 WHERE k1 = 77 AND k2 = 'g2'")
    assert(q.as[Double].collect().toSeq == Seq(77 * 1.5))
    // a single-column predicate cannot bound the composite hash:
    // nothing prunes, nothing is lost
    idx.listFiles(Nil, Seq(EqualTo(k1a, CLit(77L))))
    assert(idx.lastListedCount == listedAll)
    // DML kept rows exact: the deleted (55, g1) sits outside the
    // [60, 120) overlap, so the join is unchanged — and a second
    // composite DELETE inside the overlap shrinks it by exactly one
    def joinCount() = spark.sql(
      """SELECT a.k1 FROM bk.t.m1 a JOIN bk.t.m2 b
        |ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin).count()
    assert(joinCount() == 60L)
    spark.sql("DELETE FROM bk.t.m1 WHERE k1 = 77 AND k2 = 'g2'")
    assert(joinCount() == 59L)
  }
}
