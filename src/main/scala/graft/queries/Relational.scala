package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExactAgg
import graft.operators.Datamart

/** Core relational query set (SURVEY §2.1–§2.5 built-ins). Each entry
  * pairs the Spark implementation with its DuckDB oracle.
  */
object Relational {

  def all: Seq[Q] = Seq(pricingSummary, customerMart, limitBy)

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
    * grouped array.
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
      |    LIST(o_totalprice ORDER BY o_orderkey) AS order_prices
      |  FROM orders GROUP BY o_custkey) o
      |ON c.c_custkey = o.o_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    Datamart.customerOrderMart(Tables.customer(s, dir), Tables.orders(s, dir))
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
}
