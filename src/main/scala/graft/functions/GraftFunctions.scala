package graft.functions

import org.apache.spark.sql.SparkSession
import graft.plans.DotProduct

/** SQL registration for graft's custom expressions (SURVEY §2.11
  * extension surface): after `register`, plain `spark.sql` users can
  * call them — the engine's operators stay reachable from both the
  * Column DSL and SQL text.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf")
  }
}
