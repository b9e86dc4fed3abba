package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec

/** Null posture of the custom codegen kernels: identical to the
  * composable aggregate(zip_with(...)) fold — NULL on length mismatch
  * or null elements, never a silent prefix result.
  */
class KernelSpec extends SparkSpec {

  test("dot and l2sq return NULL on malformed vectors") {
    val df = spark.range(1).selectExpr(
      "array(1.0F, 2.0F) AS a",
      "array(3.0F, 4.0F) AS b",
      "array(1.0F) AS short",
      "array(1.0F, CAST(NULL AS FLOAT)) AS holed")
    val r = df.select(
      Vec.dot(col("a"), col("b")).as("ok_dot"),
      Vec.l2sq(col("a"), col("b")).as("ok_l2"),
      Vec.dot(col("a"), col("short")).as("mismatch_dot"),
      Vec.l2sq(col("a"), col("short")).as("mismatch_l2"),
      Vec.dot(col("a"), col("holed")).as("holed_dot"),
      Vec.l2sq(col("a"), col("holed")).as("holed_l2")).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
    assert(r.isNullAt(2) && r.isNullAt(3), "length mismatch must be NULL")
    assert(r.isNullAt(4) && r.isNullAt(5), "null element must be NULL")
  }

  test("bucketed cosine pairs on an empty corpus is empty, not a crash") {
    val empty = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
    assert(graft.operators.Knn
      .cosinePairsBucketed(empty, "vec_id", "embedding", 0.4).count() == 0)
  }
}
