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

    // config arguments (bucket boundaries, bin counts, sketch sizes)
    // must be literals — they shape the expression itself
    def constOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        name: String, what: String): Any = {
      if (!e.foldable) throw new IllegalArgumentException(
        s"$name: $what must be a literal")
      e.eval(null)
    }
    reg.createOrReplaceTempFunction("graft_bucket", exprs => {
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"graft_bucket expects (value, boundaries array), got ${exprs.length} args")
      val arr = constOf(exprs(1), "graft_bucket", "the boundary array")
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
      graft.plans.BucketIndex(exprs(0), arr)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_freq_items", exprs => {
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"graft_freq_items expects (item, maxMapSize), got ${exprs.length} args")
      FreqItemsAgg(exprs(0),
        constOf(exprs(1), "graft_freq_items", "maxMapSize")
          .asInstanceOf[Number].intValue())
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_hist", exprs => {
      if (exprs.length != 4) throw new IllegalArgumentException(
        s"graft_hist expects (value, lo, hi, bins), got ${exprs.length} args")
      def d(i: Int, w: String) =
        constOf(exprs(i), "graft_hist", w).asInstanceOf[Number].doubleValue()
      graft.operators.HistAgg(exprs(0), d(1, "lo"), d(2, "hi"),
        constOf(exprs(3), "graft_hist", "bins").asInstanceOf[Number].intValue())
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_hist_union", exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"graft_hist_union expects 1 argument, got ${exprs.length}")
      graft.operators.HistUnionAgg(exprs(0))
    }, "scala_udf")
  }
}
