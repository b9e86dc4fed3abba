package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{ExactAgg, OrderedAgg}

/** The datamart ("витрина") builders — the reference's flagship query
  * shape (Datamarts/Правильное построение витрины с множественными
  * агрегациями.md:11-46): aggregate each detail table down to one row
  * per key FIRST, then LEFT JOIN the small aggregates onto the
  * dimension spine. Aggregation-below-join is encoded structurally so
  * the join moves pre-shrunk data — the property the reference calls
  * "JOIN по уменьшенным данным" and the one that matters most at
  * 100 TB (the shuffle carries one row per key, not one per detail).
  */
object Datamart {

  /** Wide customer mart: spine `customer`, detail `orders` pre-aggregated
    * to (count, exact total, ordered price array) per customer.
    * Left-join null policy per the reference (`…витрины….md:138`):
    * missing detail ⇒ count 0, total 0.0, null array.
    */
  def customerOrderMart(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("order_cnt"),
      ExactAgg.dsum(col("o_totalprice")).as("total_spent"),
      OrderedAgg.sortedList(col("o_totalprice"), col("o_orderkey"))
        .as("order_prices"))
    customer
      .join(perCust, customer("c_custkey") === perCust("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("order_cnt"), lit(0L)).as("order_cnt"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
        col("order_prices"))
  }

  /** `ORDER BY ord DESC LIMIT n BY key` (`…витрины….md:102-117`) — the
    * per-key top-N pre-filter. Implemented as a ranking window, which
    * Spark executes with a single hash-partition shuffle on `key` and
    * a per-partition sort — no global sort, scales linearly.
    * Tie-break columns should be appended to `ord` by the caller for
    * full determinism.
    */
  def limitBy(df: DataFrame, keys: Seq[String], ord: Seq[org.apache.spark.sql.Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
