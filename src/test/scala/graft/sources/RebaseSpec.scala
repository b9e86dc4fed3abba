package graft.sources

import graft.SparkSpec

/** Disjoint-commit rebase for group-replacing commits
  * ([[TxTable.commitReplace]]): a commit pinned to an older snapshot
  * succeeds when every group it replaces is byte-identical between its
  * pin and the current version (the concurrent commits were disjoint),
  * and refuses when the same group — or the schema / CHECK set — moved
  * underneath it. In package graft.sources to reach the
  * package-private commit seam directly.
  */
class RebaseSpec extends SparkSpec {
  import spark.implicits._

  private val wh = s"target/tmp/graft_rebase_${System.nanoTime()}"

  test("disjoint group commits rebase; overlapping ones refuse") {
    spark.conf.set("spark.sql.catalog.rb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rb.warehouse", wh)
    spark.sql("CREATE NAMESPACE rb.t")
    spark.sql("CREATE TABLE rb.t.x (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO rb.t.x VALUES (1, 'a'), (2, 'a'), (3, 'b'), (4, 'c')")
    val root = s"$wh/t/x"
    val pinned = TxTable.currentSnapshot(spark, root).get

    // a concurrent commit touches ONLY p=a (copy-on-write UPDATE)...
    spark.sql("UPDATE rb.t.x SET k = 20 WHERE k = 2")
    val moved = TxTable.currentSnapshot(spark, root).get
    assert(moved.version == pinned.version + 1)

    // ...so a commit pinned BEFORE it that replaces only p=b rebases
    // instead of failing: drop b's files as-of the stale pin
    val v = TxTable.commitReplace(spark, root, pinned.version,
      Set("p=b"), Nil, "test-disjoint")
    assert(v == moved.version + 1, "rebase must land as a fresh version")
    assert(spark.sql("SELECT k FROM rb.t.x ORDER BY k").as[Long]
      .collect().toSeq == Seq(1L, 4L, 20L),
      "the rebased commit must keep the concurrent update AND drop p=b")

    // overlap: another writer replaces p=a, then a stale pin also
    // targeting p=a must refuse — its read of the group is outdated
    val pin2 = TxTable.currentSnapshot(spark, root).get
    spark.sql("DELETE FROM rb.t.x WHERE p = 'a'")
    val e = intercept[TxTable.ConcurrentCommitException](
      TxTable.commitReplace(spark, root, pin2.version,
        Set("p=a"), Nil, "test-overlap"))
    assert(e.getMessage.nonEmpty)

    // schema movement is a conflict even for disjoint groups
    val pin3 = TxTable.currentSnapshot(spark, root).get
    spark.sql("ALTER TABLE rb.t.x ADD COLUMN extra DOUBLE")
    intercept[TxTable.ConcurrentCommitException](
      TxTable.commitReplace(spark, root, pin3.version,
        Set("p=c"), Nil, "test-schema-move"))
  }

  test("concurrent partition-disjoint SQL DELETEs both land (thread race)") {
    spark.conf.set("spark.sql.catalog.rb2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rb2.warehouse", s"${wh}_race")
    spark.sql("CREATE NAMESPACE rb2.t")
    spark.sql("CREATE TABLE rb2.t.y (k BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql(
      """INSERT INTO rb2.t.y
        |SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END
        |FROM range(0, 100)""".stripMargin)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // row-predicate DELETEs scoped to DISJOINT partitions: whichever
      // commits second is pinned to the pre-race snapshot and must
      // rebase, not throw — both statements land, in either order
      val fs = Seq(
        Future(spark.sql("DELETE FROM rb2.t.y WHERE p = 'even' AND k < 50")),
        Future(spark.sql("DELETE FROM rb2.t.y WHERE p = 'odd' AND k >= 50")))
      Await.result(Future.sequence(fs), 120.seconds)
    } finally pool.shutdown()
    assert(spark.sql("SELECT count(*) FROM rb2.t.y").as[Long].head() == 50L)
    assert(spark.sql(
      "SELECT count(*) FROM rb2.t.y WHERE p = 'even' AND k < 50")
      .as[Long].head() == 0L)
    assert(spark.sql(
      "SELECT count(*) FROM rb2.t.y WHERE p = 'odd' AND k >= 50")
      .as[Long].head() == 0L)
  }
}
