package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{ExactAgg, OrderedAgg}
import graft.operators.Datamart

/** Core relational query set (SURVEY §2.1–§2.5 built-ins). Each entry
  * pairs the Spark implementation with its DuckDB oracle.
  */
object Relational {

  def all: Seq[Q] = Seq(
    pricingSummary, customerMart, wideMart, limitBy,
    lookupCascade, semiAnti, fullOuterReconcile, splitBands, windowRunning,
    shippingPriority, correlatedBalance, skewJoin, bloomJoin)

  /** TPC-H-Q3-shaped flagship: segment-filtered customer dimension,
    * date-bounded orders and lineitem, three-way join, exact-cents
    * revenue per order, deterministic top-10 (TakeOrderedAndProject —
    * no global sort materializes).
    */
  val shippingPriority: Q = Q(
    "q_shipping_priority",
    """SELECT l_orderkey AS okey,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
      |  CAST(o_orderdate AS TIMESTAMP) AS odate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-03-15'
      |  AND l_shipdate > TIMESTAMP '1997-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, okey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val cut = lit("1997-03-15").cast("timestamp")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(ExactAgg.dsumOneMinus(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .select(col("l_orderkey").as("okey"), col("revenue"),
        col("o_orderdate").as("odate"))
      .orderBy(col("revenue").desc, col("okey"))
      .limit(10)
  }

  /** Correlated scalar subquery (decorrelated by Catalyst into a
    * join — SURVEY §4's RewriteCorrelatedScalarSubquery row,
    * exercised): customers above their own segment's exact average
    * balance.
    */
  private val correlatedSql =
    """SELECT c_custkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(round(c2.c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0
      |         / COUNT(*)
      |  FROM customer c2 WHERE c2.c_mktsegment = c.c_mktsegment)
      |ORDER BY c_custkey""".stripMargin

  val correlatedBalance: Q = Q("q_correlated", correlatedSql) { (s, dir) =>
    // BOTH engines run the IDENTICAL SQL text (only the table binding
    // differs) — the same-text intent is enforced, not duplicated
    Tables.customer(s, dir).createOrReplaceTempView("customer_corr")
    s.sql(correlatedSql.replace("customer ", "customer_corr "))
  }

  /** The full wide datamart ("одна широкая таблица", SURVEY §1.1):
    * customer spine + TWO pre-aggregated detail tables — an ordered
    * ARRAY OF STRUCTS of orders (the Nested-structure shape) and the
    * line-item counts resolved through the order spine. Both details
    * shrink to one row per key before any join touches the spine.
    *
    * The struct array is canonicalized to an `okey:cents` string in the
    * final projection ONLY (the aggregate still builds the real
    * array-of-structs): integer-cents text is bit-identical across
    * engines, where raw double formatting is not, and the driver's
    * pandas hash harness cannot sort array cells.
    */
  val wideMart: Q = Q(
    "q_mart_wide",
    """WITH oa AS (
      |  SELECT o_custkey, COUNT(*) AS order_cnt,
      |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_spent,
      |    array_to_string(LIST(
      |      CAST(o_orderkey AS VARCHAR) || ':' ||
      |      CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR)
      |      ORDER BY o_orderkey), ';') AS orders_arr
      |  FROM orders GROUP BY o_custkey),
      |li AS (
      |  SELECT o_custkey, COUNT(*) AS n_items
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey)
      |SELECT c.c_custkey, c.c_name,
      |  COALESCE(oa.order_cnt, 0) AS order_cnt,
      |  COALESCE(oa.total_spent, 0.0) AS total_spent,
      |  COALESCE(li.n_items, 0) AS n_items,
      |  oa.orders_arr AS orders_arr
      |FROM customer c
      |LEFT JOIN oa ON c.c_custkey = oa.o_custkey
      |LEFT JOIN li ON c.c_custkey = li.o_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val oa = orders.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("order_cnt"),
      ExactAgg.dsum(col("o_totalprice")).as("total_spent"),
      OrderedAgg.sortedZip(col("o_orderkey"),
        "okey" -> col("o_orderkey"),
        "total" -> col("o_totalprice")).as("orders_arr"))
    val liT = Tables.lineitem(s, dir)
    val oKeys = orders.select(col("o_orderkey"), col("o_custkey"))
    val li = liT
      .join(oKeys, liT("l_orderkey") === oKeys("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_items"))
    val c = Tables.customer(s, dir)
    // rename detail keys: both aggregates derive from `orders`, so the
    // raw o_custkey lineage would self-join-ambiguate
    val oaR = oa.withColumnRenamed("o_custkey", "oa_key")
    val liR = li.withColumnRenamed("o_custkey", "li_key")
    c.join(oaR, c("c_custkey") === col("oa_key"), "left")
      .join(liR, c("c_custkey") === col("li_key"), "left")
      .select(
        col("c_custkey"), col("c_name"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        array_join(
          transform(col("orders_arr"), t =>
            concat_ws(":",
              t.getField("okey").cast("string"),
              round(t.getField("total") * 100).cast("long").cast("string"))),
          ";").as("orders_arr"))
      .orderBy(col("c_custkey"))
  }

  /** Pricing-summary hash aggregate (SURVEY A1): filter → groupBy →
    * {sum, avg, count} with exact decimal arithmetic. The filter and
    * the two grouping columns are pushed into the parquet scan.
    */
  val pricingSummary: Q = Q(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge,
      |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    import ExactAgg._
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumOneMinus(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        dsumOneMinusOnePlus(col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Flagship datamart (SURVEY §3.1, J5+A2+A5): pre-aggregated detail
    * LEFT JOINed onto the dimension spine, with an order-deterministic
    * grouped array. The price array is canonicalized to a cents string
    * at the output edge (the mart itself still carries the real array).
    */
  val customerMart: Q = Q(
    "q_datamart_customer",
    """SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
      |  c.c_mktsegment AS c_mktsegment,
      |  COALESCE(o.order_cnt, 0) AS order_cnt,
      |  COALESCE(o.total_spent, 0.0) AS total_spent,
      |  o.order_prices AS order_prices
      |FROM customer c LEFT JOIN (
      |  SELECT o_custkey,
      |    COUNT(*) AS order_cnt,
      |    CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_spent,
      |    array_to_string(LIST(
      |      CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR)
      |      ORDER BY o_orderkey), ',') AS order_prices
      |  FROM orders GROUP BY o_custkey) o
      |ON c.c_custkey = o.o_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    Datamart.customerOrderMart(Tables.customer(s, dir), Tables.orders(s, dir))
      .withColumn("order_prices",
        array_join(
          transform(col("order_prices"),
            x => round(x * 100).cast("long").cast("string")),
          ","))
      .orderBy(col("c_custkey"))
  }

  /** `LIMIT 3 BY key` (SURVEY W1/A7): top-3 most recent orders per
    * customer via a ranking window — one hash shuffle, per-partition
    * sort, no global sort.
    */
  val limitBy: Q = Q(
    "q_limit_by",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    Datamart.limitBy(
      Tables.orders(s, dir),
      Seq("o_custkey"),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc),
      3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Lookup cascade (SURVEY J2/J6): fact stream probes three broadcast
    * reference tables in sequence — the SSIS Full-Cache-Lookup chain
    * for fact loading, executed as chained BroadcastHashJoins with zero
    * shuffle on the probe side.
    */
  val lookupCascade: Q = Q(
    "q_lookup_cascade",
    """SELECT n.n_name AS n_name, p.p_brand AS p_brand,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name, p.p_brand
      |ORDER BY n_name, p_brand""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    val su = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(
        ExactAgg.dsumOneMinus(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("p_brand"))
  }

  /** Semi/anti joins (SURVEY §2.3 "Not present" row + J2 no-match
    * stream): customers with vs without orders, per segment. EXISTS →
    * left_semi, NOT EXISTS → left_anti.
    */
  val semiAnti: Q = Q(
    "q_semi_anti",
    """SELECT c_mktsegment, 'with_orders' AS bucket, COUNT(*) AS cnt
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'no_orders' AS bucket, COUNT(*) AS cnt
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment, bucket""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val oKeys = Tables.orders(s, dir).select(col("o_custkey"))
    def side(joinType: String, tag: String) =
      c.join(oKeys, c("c_custkey") === oKeys("o_custkey"), joinType)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("bucket", lit(tag))
    side("left_semi", "with_orders")
      .unionByName(side("left_anti", "no_orders"))
      .select(col("c_mktsegment"), col("bucket"), col("cnt"))
      .orderBy(col("c_mktsegment"), col("bucket"))
  }

  /** Full-outer reconciliation (SURVEY J4/J9 shape): per-key aggregate
    * vs a filtered dimension snapshot, unmatched rows surviving on both
    * sides — the merge-join / CDC-reconcile skeleton.
    */
  val fullOuterReconcile: Q = Q(
    "q_full_outer",
    """SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
      |  COALESCE(o.order_cnt, 0) AS order_cnt,
      |  c.c_acctbal AS c_acctbal,
      |  CASE WHEN o.o_custkey IS NULL THEN 'dim_only'
      |       WHEN c.c_custkey IS NULL THEN 'fact_only'
      |       ELSE 'both' END AS presence
      |FROM (SELECT o_custkey, COUNT(*) AS order_cnt
      |      FROM orders GROUP BY o_custkey) o
      |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer
      |                 WHERE c_custkey % 2 = 0) c
      |ON o.o_custkey = c.c_custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("order_cnt"))
    val c = Tables.customer(s, dir)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
    o.join(c, o("o_custkey") === c("c_custkey"), "full")
      .select(
        coalesce(o("o_custkey"), c("c_custkey")).as("custkey"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        col("c_acctbal"),
        when(o("o_custkey").isNull, "dim_only")
          .when(c("c_custkey").isNull, "fact_only")
          .otherwise("both").as("presence"))
      .orderBy(col("custkey"))
  }

  /** Conditional Split + Derived Column (SURVEY P1/P2): first-match
    * band routing computed in one codegen pass via the Split operator.
    */
  val splitBands: Q = Q(
    "q_split_bands",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
      |            WHEN o_totalprice < 150000 THEN 'medium'
      |            ELSE 'large' END AS band,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
      |FROM orders GROUP BY band ORDER BY band""".stripMargin) { (s, dir) =>
    val routed = graft.operators.Split.tag(
      Tables.orders(s, dir),
      Seq(
        "small" -> (col("o_totalprice") < 50000),
        "medium" -> (col("o_totalprice") < 150000)),
      default = "large",
      tagCol = "band")
    routed.groupBy(col("band"))
      .agg(
        count(lit(1)).as("cnt"),
        ExactAgg.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("band"))
  }

  /** Skew-salted join in anger (SURVEY §7.2 "salting for skew"):
    * orders carries exactly 5 distinct `o_orderpriority` values
    * (~N/5 rows each) — a worst-case hot-key join where at most 5 of
    * the shuffle partitions would do all the work. [[graft.operators
    * .Skew.saltedJoin]] spreads each hot key over `factor` composite
    * (key, salt) keys; salting never changes join results, so the
    * oracle is the plain join. The partition-spread property itself is
    * asserted in PropertySpec with broadcast disabled.
    */
  val skewJoin: Q = Q(
    "q_skew_join",
    """SELECT o_orderpriority AS priority, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT) * w.weight) AS DOUBLE)/100.0
      |    AS weighted_total
      |FROM orders JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4),
      |    ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
      |  AS w(priority, weight)
      |  ON o_orderpriority = w.priority
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val weights = Seq(
      ("1-URGENT", 5L), ("2-HIGH", 4L), ("3-MEDIUM", 3L),
      ("4-NOT SPECIFIED", 2L), ("5-LOW", 1L)).toDF("priority", "weight")
    graft.operators.Skew.saltedJoin(
        Tables.orders(s, dir), weights,
        key = "o_orderpriority", otherKey = "priority",
        distributor = "o_orderkey", factor = 8)
      .groupBy(col("priority"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(ExactAgg.cents(col("o_totalprice")) * col("weight"))
          .cast("double") / 100.0).as("weighted_total"))
      .orderBy(col("priority"))
  }

  /** Bloom-reduced fact/dim join ([[graft.operators.BloomJoin]]): the
    * urgent-orders dimension is too big for a row-broadcast posture at
    * scale, but its KEY SET fits a few MB of bloom bits — so the
    * lineitem side is pre-filtered by a codegen'd `might_contain`
    * probe below its exchange and only ~matching rows shuffle. The
    * reduction is correctness-neutral (false positives die in the real
    * join, false negatives can't exist), so the oracle is the plain
    * join; the plan property (probe filter below the exchange, no
    * extra shuffle) is pinned in PlanSpec.
    */
  val bloomJoin: Q = Q(
    "q_bloom_join",
    """SELECT l_returnflag, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
      |    AS gross
      |FROM lineitem, orders
      |WHERE l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    graft.operators.BloomJoin.join(
        fact, dim, col("l_orderkey"), col("o_orderkey"), fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(ExactAgg.cents(col("l_extendedprice"))).cast("double") / 100.0)
          .as("gross"))
      .orderBy(col("l_returnflag"))
  }

  /** Analytic frame (SURVEY §2.5): exact running spend per customer —
    * the cumulative-window shape, shuffled once on the partition key.
    */
  val windowRunning: Q = Q(
    "q_window_running",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
      |    AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        (sum(ExactAgg.cents(col("o_totalprice"))).over(w).cast("double") / 100.0)
          .as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
}
