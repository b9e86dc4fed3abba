package graft.functions

import org.apache.spark.sql.SparkSession
import graft.plans.{DotProduct, L2Sq, MinHashSig, SimHashSig}

/** SQL registration for graft's custom expressions (SURVEY §2.11
  * extension surface): after `register`, plain `spark.sql` users can
  * call them — the engine's operators stay reachable from both the
  * Column DSL and SQL text.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity2(name: String)(
        build: (org.apache.spark.sql.catalyst.expressions.Expression,
                org.apache.spark.sql.catalyst.expressions.Expression) =>
          org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      reg.createOrReplaceTempFunction(name, exprs => {
        // extra args must not be silently dropped, missing args must
        // not surface as a bare IndexOutOfBounds
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"$name expects exactly 2 arguments, got ${exprs.length}")
        build(exprs(0), exprs(1))
      }, "scala_udf")
    arity2("graft_dot")(DotProduct(_, _))
    arity2("graft_l2sq")(L2Sq(_, _))
    arity2("graft_minhash")(MinHashSig.expr(_, _))
    reg.createOrReplaceTempFunction("graft_simhash", exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"graft_simhash expects exactly 1 argument, got ${exprs.length}")
      SimHashSig(exprs(0))
    }, "scala_udf")
  }
}
