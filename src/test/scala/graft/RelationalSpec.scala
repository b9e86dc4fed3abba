package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{ExactAgg, OrderedAgg}
import graft.operators.Datamart

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("ExactAgg.dsum is exact and order-independent") {
    val df = Seq(0.1, 0.2, 0.3, 100.01, 99.99).toDF("x")
    val total = df.agg(ExactAgg.dsum($"x").as("s")).head.getDouble(0)
    assert(total == 200.6)
    val shuffled = df.repartition(7).agg(ExactAgg.dsum($"x")).head.getDouble(0)
    assert(shuffled == total)
  }

  test("OrderedAgg.sortedList is deterministic under repartitioning") {
    val df = Seq((1, 30, "c"), (1, 10, "a"), (1, 20, "b"), (2, 5, "z")).toDF("k", "o", "v")
    def run(parts: Int) =
      df.repartition(parts)
        .groupBy($"k")
        .agg(OrderedAgg.sortedList($"v", $"o").as("vs"))
        .orderBy($"k").collect().map(_.getSeq[String](1).toList).toList
    assert(run(1) == List(List("a", "b", "c"), List("z")))
    assert(run(8) == run(1))
  }

  test("OrderedAgg.stringAgg matches STRING_AGG ORDER BY semantics") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (1, 3, "c")).toDF("k", "pos", "s")
    val got = df.groupBy($"k")
      .agg(OrderedAgg.stringAgg($"s", $"pos", ", ").as("agg"))
      .head.getString(1)
    assert(got == "a, b, c")
  }

  test("OrderedAgg.sortedZip keeps positional linkage") {
    val df = Seq((1, 2, "b", 20.0), (1, 1, "a", 10.0)).toDF("k", "o", "name", "price")
    val row = df.groupBy($"k")
      .agg(OrderedAgg.sortedZip($"o", "name" -> $"name", "price" -> $"price").as("z"))
      .head
    val z = row.getSeq[Row](1)
    assert(z.map(r => (r.getAs[String]("name"), r.getAs[Double]("price"))) ==
      Seq(("a", 10.0), ("b", 20.0)))
  }

  test("Datamart.limitBy keeps at most n rows per key, top-ordered") {
    val df = (1 to 10).map(i => (i % 2, i)).toDF("k", "v")
    val got = Datamart.limitBy(df, Seq("k"), Seq(col("v").desc), 3)
      .orderBy($"k", $"v".desc)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toList
    assert(got == List((0, 10), (0, 8), (0, 6), (1, 9), (1, 7), (1, 5)))
  }

  test("customerOrderMart: left-join null policy and row counts") {
    val mart = Datamart.customerOrderMart(
      Tables.customer(spark, sf), Tables.orders(spark, sf))
    val nCust = Tables.customer(spark, sf).count()
    assert(mart.count() == nCust)
    // customers without orders surface with count 0 / total 0.0
    val noOrders = mart.filter($"order_cnt" === 0)
    assert(noOrders.filter($"total_spent" =!= 0.0).count() == 0)
  }

  test("smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
