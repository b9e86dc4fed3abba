package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over `Array[Float]` embedding columns —
  * expression-only (codegen'd, no UDF), for the similarity-search /
  * near-dup operators of the training-data pipeline.
  *
  * Determinism contract: all arithmetic is double, accumulated by a
  * SEQUENTIAL left fold (`aggregate`), matching the oracle engine's
  * `list_reduce` fold over the same double-cast values — IEEE ops on
  * identical operands in identical order ⇒ bit-identical results,
  * so similarity thresholds and top-k ranks agree exactly.
  */
object Vec {

  /** Elementwise product fold: Σ a_i * b_i in double. Backed by the
    * codegen'd [[graft.plans.DotProduct]] kernel (no per-row array
    * allocation); arithmetically identical to the composable
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` form.
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in exact-deterministic double math. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (double). Backed by the codegen'd
    * [[graft.plans.L2Sq]] kernel; arithmetically identical to the
    * composable `aggregate(zip_with(...))` sequential fold.
    */
  def l2sq(a: Column, b: Column): Column = graft.plans.L2Sq(a, b)
}
