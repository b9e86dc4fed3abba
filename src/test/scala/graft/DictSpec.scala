package graft

import org.apache.spark.sql.functions._
import graft.operators.Dict

/** Dictionary lookup (J6): literal-map dictGet, the bounded size
  * guard, and the size-adaptive broadcast-join reroute.
  */
class DictSpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq((1L, 10), (2L, 20), (3L, 99)).toDF("k", "x")
  private val dict = Seq((10, "ten"), (20, "twenty")).toDF("dk", "dv")

  test("asMap + dictGet: in-projection lookup with default") {
    val m = Dict.asMap(dict, "dk", "dv")
    val got = facts
      .withColumn("name", Dict.dictGet(m, col("x"), lit("UNKNOWN")))
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(got == Seq((1L, 10, "ten"), (2L, 20, "twenty"), (3L, 99, "UNKNOWN")))
  }

  test("asMap fails fast on an oversized dictionary — bounded collect, no driver OOM") {
    // 2× the literal-map cap; the guard must trip after collecting at
    // most MaxLiteralRows + 1 rows, never the full frame
    val big = spark.range(0, 2L * Dict.MaxLiteralRows)
      .select(col("id").as("dk"), col("id").cast("string").as("dv"))
    val e = intercept[IllegalArgumentException] {
      Dict.asMap(big, "dk", "dv")
    }
    assert(e.getMessage.contains("too large"))
  }

  test("get routes by size: literal map small, broadcast join large — same answers") {
    val small = Dict.get(facts, dict, "dk", "dv", col("x"), "name", lit("UNKNOWN"))
      .orderBy("k").as[(Long, Int, String)].collect().toSeq
    assert(small == Seq((1L, 10, "ten"), (2L, 20, "twenty"), (3L, 99, "UNKNOWN")))

    val big = spark.range(0, Dict.MaxLiteralRows + 10L)
      .select(col("id").cast("int").as("dk"),
        concat(lit("v"), col("id")).as("dv"))
    val viaJoin = Dict.get(facts, big, "dk", "dv", col("x"), "name", lit("UNKNOWN"))
      .orderBy("k")
    assert(viaJoin.as[(Long, Int, String)].collect().toSeq ==
      Seq((1L, 10, "v10"), (2L, 20, "v20"), (3L, 99, "v99")))
    // over-limit dictionaries must plan as a broadcast join, not a literal
    assert(viaJoin.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"expected broadcast join fallback:\n${viaJoin.queryExecution.executedPlan}")
  }
}
