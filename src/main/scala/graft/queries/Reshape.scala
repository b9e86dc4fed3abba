package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{ExactAgg, OrderedAgg}
import graft.operators.Profile

/** Reshaping + array surface (SURVEY §2.7, §2.8) and profiling (A9). */
object Reshape {

  def all: Seq[Q] = Seq(pivot, unpivot, explodeZip, profileCustomer,
    stringAgg, rollupTotals, cubeTotals, sampled, sampledHash,
    stratifiedSample, groupingSets, lagLeadRank)

  /** Explicit GROUPING SETS (beyond cube/rollup) with grouping_id —
    * two chosen marginals in one pass, and the bitmask that
    * disambiguates a grouped NULL from a data NULL.
    */
  val groupingSets: Q = Q(
    "q_grouping_sets",
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
      |    AS gid,
      |  COUNT(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    orders.createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  grouping_id(o_orderpriority, o_orderstatus) AS gid,
        |  COUNT(*) AS cnt
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin)
  }

  /** Analytic functions beyond frames (lag/lead deltas, rank with
    * ties vs dense_rank) over each customer's order history.
    */
  val lagLeadRank: Q = Q(
    "q_lag_lead",
    """SELECT o_custkey, o_orderkey,
      |  LAG(o_orderkey) OVER w IS NOT NULL AS has_prev,
      |  CAST(date_diff('day',
      |    LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
      |  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
      |    AS prio_dense
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wp = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderpriority"))
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).isNotNull.as("has_prev"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("days_since_prev"),
        rank().over(wp).as("prio_rank"),
        dense_rank().over(wp).as("prio_dense"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Deterministic KEY-HASH sampling (R4's reproducible form): keep
    * rows whose md5(key-string) lands under the rate threshold —
    * engine-independent, repartition-stable, and the property a
    * 100 TB pipeline actually wants (the same rows sampled on every
    * run and every cluster layout, unlike an RNG sampler). Oracle
    * replays the identical hash predicate.
    */
  val sampledHash: Q = Q(
    "q_sample_hash",
    """SELECT o_orderstatus, COUNT(*) AS cnt
      |FROM orders
      |WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6)) AS BIGINT) % 10 = 0
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 6), 16, 10)
          .cast("long") % 10 === 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus"))
  }

  /** Deterministic STRATIFIED sampling: exactly k rows per stratum,
    * chosen by hash rank — the balanced-corpus sampler of a training
    * pipeline (equal per-language/per-source quotas from a skewed
    * corpus). Hash-rank replaces per-stratum reservoirs: one window
    * over the stratum key, same rows on every run and layout, oracle
    * replays the identical md5 ordering. At 100 TB this is a single
    * shuffle on the stratum key; rank ≤ k prunes via WindowGroupLimit
    * before the sort materializes.
    */
  val stratifiedSample: Q = Q(
    "q_stratified_sample",
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 5
      |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Percentage sampling (SURVEY R4): seeded Bernoulli sample —
    * deterministic for a fixed seed and partitioning, but the sampler
    * RNG is engine-specific, so the check is rows-only (the spec
    * asserts the fraction lands in a tolerance band).
    */
  val sampled: Q = Q.noOracle("q_sample") { (s, dir) =>
    Tables.orders(s, dir)
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus"))
  }

  /** CUBE grouping sets — all four (priority × status) marginals in
    * one pass.
    */
  val cubeTotals: Q = Q(
    "q_cube",
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** `STRING_AGG(expr, sep ORDER BY pos)` (SURVEY A3) — the ordered
    * string concat driving the reference's DDL generator, over a
    * broadcast dimension join.
    */
  val stringAgg: Q = Q(
    "q_string_agg",
    """SELECT n_name, COUNT(*) AS n_cust,
      |  STRING_AGG(c_name, ',' ORDER BY c_custkey) AS names
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions.broadcast
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        OrderedAgg.stringAgg(col("c_name"), col("c_custkey"), ",").as("names"))
      .orderBy(col("n_name"))
  }

  /** ROLLUP grouping sets (SURVEY §2.4 "free if needed" row) with
    * NULLS FIRST ordering pinned in both engines (their defaults
    * differ).
    */
  val rollupTotals: Q = Q(
    "q_rollup",
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("cnt"),
        ExactAgg.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** Pivot rows→columns (SURVEY R1): order status across priorities.
    * Explicit pivot values keep the plan a single pass (no distinct
    * pre-scan) — mandatory at scale.
    */
  val pivot: Q = Q(
    "q_pivot",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)/100.0 AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(ExactAgg.dsum(col("o_totalprice")))
      .orderBy(col("o_orderpriority"))
  }

  /** Unpivot columns→rows (SURVEY R2) via `stack`, aggregating the
    * measures exactly. One scan, no shuffle before the 4-row result.
    */
  val unpivot: Q = Q(
    "q_unpivot",
    """SELECT 'l_discount' AS measure, CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0 AS total FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice' AS measure, CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity' AS measure, CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS total FROM lineitem
      |UNION ALL
      |SELECT 'l_tax' AS measure, CAST(SUM(CAST(round(l_tax*100) AS BIGINT)) AS DOUBLE)/100.0 AS total FROM lineitem
      |ORDER BY measure""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        ExactAgg.cents(col("l_discount")).as("l_discount"),
        ExactAgg.cents(col("l_extendedprice")).as("l_extendedprice"),
        ExactAgg.cents(col("l_quantity")).as("l_quantity"),
        ExactAgg.cents(col("l_tax")).as("l_tax"))
      .selectExpr(
        """stack(4,
          |  'l_discount', l_discount,
          |  'l_extendedprice', l_extendedprice,
          |  'l_quantity', l_quantity,
          |  'l_tax', l_tax) as (measure, cents)""".stripMargin)
      .groupBy(col("measure"))
      .agg((sum(col("cents")).cast("double") / 100.0).as("total"))
      .orderBy(col("measure"))
  }

  /** Array round-trip (SURVEY R3, A4, §2.8): collect order lines into a
    * positionally-linked struct array (`arrayZip` shape), explode it
    * back (`ARRAY JOIN`), and re-aggregate — plus a lambda `filter`
    * over the array. Result must equal the direct relational aggregate
    * (the oracle), proving the array path is lossless.
    */
  val explodeZip: Q = Q(
    "q_explode_zip",
    """SELECT l_orderkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_price,
      |  CAST(COUNT(CASE WHEN l_extendedprice > 1000 THEN 1 END) AS BIGINT) AS n_big
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    val zipped = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(OrderedAgg.sortedZip(
        col("l_linenumber"),
        "price" -> col("l_extendedprice"),
        "qty" -> col("l_quantity")).as("items"))
    zipped
      .withColumn("n_big",
        size(filter(col("items"), it => it.getField("price") > 1000)).cast("long"))
      .select(col("l_orderkey"), col("n_big"), explode(col("items")).as("it"))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        ExactAgg.dsum(col("it.price")).as("total_price"),
        first(col("n_big")).as("n_big"))
      .select(col("l_orderkey"), col("n_items"), col("total_price"), col("n_big"))
      .orderBy(col("l_orderkey"))
  }

  /** Profiling aggregates (SURVEY A9): one pass over `customer`. */
  val profileCustomer: Q = Q(
    "q_profile_customer",
    """SELECT 'c_acctbal' AS col_name, COUNT(*) AS n_rows, COUNT(*)-COUNT(c_acctbal) AS n_null, COUNT(DISTINCT c_acctbal) AS n_distinct FROM customer
      |UNION ALL
      |SELECT 'c_custkey', COUNT(*), COUNT(*)-COUNT(c_custkey), COUNT(DISTINCT c_custkey) FROM customer
      |UNION ALL
      |SELECT 'c_mktsegment', COUNT(*), COUNT(*)-COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment) FROM customer
      |UNION ALL
      |SELECT 'c_name', COUNT(*), COUNT(*)-COUNT(c_name), COUNT(DISTINCT c_name) FROM customer
      |UNION ALL
      |SELECT 'c_nationkey', COUNT(*), COUNT(*)-COUNT(c_nationkey), COUNT(DISTINCT c_nationkey) FROM customer
      |ORDER BY col_name""".stripMargin) { (s, dir) =>
    Profile(
      Tables.customer(s, dir),
      Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"))
      .orderBy(col("col_name"))
  }
}
