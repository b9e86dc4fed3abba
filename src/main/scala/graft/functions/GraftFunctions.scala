package graft.functions

import org.apache.spark.sql.SparkSession
import graft.plans.{DotProduct, L2Sq, MinHashSig}

/** SQL registration for graft's custom expressions (SURVEY §2.11
  * extension surface): after `register`, plain `spark.sql` users can
  * call them — the engine's operators stay reachable from both the
  * Column DSL and SQL text.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_l2sq",
      exprs => L2Sq(exprs(0), exprs(1)),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSig.expr(exprs(0), exprs(1)),
      "scala_udf")
  }
}
