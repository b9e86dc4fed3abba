package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic aggregation helpers.
  *
  * The engine's correctness gate hash-compares query output against a
  * second SQL engine (DuckDB) running on the same parquet. Floating
  * `sum(double)` is order-dependent — a distributed partial/final
  * aggregate sums in a different order than a single-threaded engine
  * and the low bits diverge. Money-like columns in the test corpus
  * carry ≤2 decimal digits, so we aggregate exact scaled INTEGERS
  * ("cents"): `round(x*100)` as long, summed as long, converted back
  * at the end. Integer addition is associative ⇒ the distributed sum
  * is order-independent and bit-identical to any single-node engine.
  *
  * Why not DECIMAL: a (12,2)×(12,2) product sums into Decimal(38,4),
  * which exceeds Spark's 18-digit long-backed fast path and degrades
  * to per-row java.math.BigDecimal (~4× slower end-to-end on the
  * sf0.1 bench). Long-cents arithmetic stays inside whole-stage
  * codegen's primitive path.
  *
  * Overflow posture at scale: a row-level term is ≤ ~1e11 (price
  * cents × two percent factors), so the long accumulator holds ~1e7×
  * more rows per partial sum than sf0.1 — safe through roughly
  * sf1000 / 100 TB; past that, swap the final `sum` for
  * `sum(col.cast(DecimalType(38,0)))` (the partials stay integers).
  *
  * This mirrors the reference's own staging discipline of making the
  * lossy step explicit and deterministic (Integration/Scripts/Скрипт
  * для миграции из PostgreSQL в ClickHouse.md:64-96).
  */
object ExactAgg {

  /** `x` (≤2 decimal digits, stored as double) as exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact percent units: `x` (≤2 decimals, e.g. 0.05 discount) → 5. */
  def pct(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent SUM over a ≤2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(cents(c)).cast("double") / 100.0

  /** Order-independent SUM(a * (1 - b)) — revenue-style product of a
    * money column and a ≤2-decimal fraction. Exact in scaled-integer
    * space: cents × (100 - pct) summed as long, ÷ 10^4.
    */
  def dsumOneMinus(a: Column, b: Column): Column =
    sum(cents(a) * (lit(100L) - pct(b))).cast("double") / 10000.0

  /** Order-independent SUM(a * (1 - b) * (1 + c)) (charge-style). */
  def dsumOneMinusOnePlus(a: Column, b: Column, c: Column): Column =
    sum(cents(a) * (lit(100L) - pct(b)) * (lit(100L) + pct(c)))
      .cast("double") / 1000000.0

  /** Deterministic AVG: exact integer sum, double division at the end.
    * Matches `CAST(SUM(...cents...) AS DOUBLE)/100.0/COUNT(x)`.
    */
  def davg(c: Column): Column = dsum(c) / count(c)
}
