package graft.sources

import scala.util.Try

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{NamedReference, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Answer whole aggregate queries from manifest statistics — zero data
  * files opened.
  *
  * The manifest already stores per-file `rows`, and per-column
  * `(min, max, nullCount)` ([[FileStats]]) for skipping; the same
  * numbers answer `COUNT(*)`, `COUNT(col)`, `MIN(col)`, `MAX(col)` —
  * ungrouped or grouped by the table's partition column — EXACTLY, as
  * long as every stored bound is provably exact. At 100 TB this turns
  * `SELECT count(*) FROM t` (and the per-partition profiling queries a
  * pipeline runs constantly) from a full scan into a metadata read:
  * the scan never lists, opens, or reads a single parquet file.
  *
  * Exactness rules (refuse ⇒ the caller falls back to a real scan —
  * wrong answers are never an option):
  *  - every manifest entry must carry stats (`rows >= 0`); legacy
  *    2-field lines refuse the whole query.
  *  - `COUNT(col)` needs the column's null count in every file.
  *  - `MIN`/`MAX` need an exact bound in every file that has non-null
  *    values. Numeric / date / timestamp / boolean bounds are stored
  *    in full precision (decimal expansion — [[FileStats.chunkStats]]),
  *    so they are exact; DECIMAL beyond precision 18 (FLBA-encoded in
  *    parquet) never gets stats and refuses naturally. String MAX is
  *    exact whenever present (long maxima are dropped, never
  *    truncated); string MIN refuses when the stored bound could be a
  *    truncation prefix (length ≥ [[FileStats.MaxStringLen]] - 1).
  *  - float/double bounds inherit parquet's semantics: writers omit
  *    chunk stats when NaN is present (the column is then absent here
  *    and refuses), and ±0.0 bounds may be widened to (-0.0, +0.0) —
  *    numerically equal to the true extremum.
  *  - an all-null file (nulls == rows, sentinel bounds) contributes
  *    nothing to MIN/MAX rather than refusing.
  *
  * Group-by is supported exactly for the identity partition column:
  * manifest entries group by their partition directory, the group key
  * decodes through the same path the DELETE fast-path uses
  * ([[PartitionPredicates.partitionValue]]), and each group folds only
  * its own files' stats. Any other grouping refuses.
  */
private[graft] object StatsAgg {
  import FileStats.{ColStats, Dom, Stats}

  /** One pushed aggregate compiled to a fold over a group's file
    * stats. `eval` assumes [[answer]]'s global validation passed (a
    * group's files are a subset of the validated set).
    */
  private final case class Fn(
      dataType: DataType, nullable: Boolean, eval: Seq[Stats] => Any)

  /** Try to answer `agg` exactly from `snap`'s manifest stats.
    * Returns the LocalScan payload `(schema, rows)`, or None when any
    * exactness rule fails — the caller then scans data as usual.
    */
  def answer(
      snap: TxTable.Snapshot, schema: StructType,
      partitionCol: Option[String], agg: Aggregation)
    : Option[(StructType, Array[InternalRow])] =
    Try(compute(snap, schema, partitionCol, agg)).toOption.flatten

  private def compute(
      snap: TxTable.Snapshot, schema: StructType,
      partitionCol: Option[String], agg: Aggregation)
    : Option[(StructType, Array[InternalRow])] = {

    // merge-on-read snapshots refuse: file stats ignore position
    // deletes, so COUNT/MIN/MAX could answer over deleted rows
    if (snap.dvs.nonEmpty) return None

    val decoded: Seq[(TxTable.Entry, Stats)] =
      snap.entries.map(e => e -> FileStats.decode(e.stats))
    if (decoded.exists(_._2.rows < 0)) return None

    def fieldOf(e: V2Expression): Option[StructField] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
      case _ => None
    }

    // group-by: nothing, or exactly the identity partition column
    val groupField: Option[StructField] = agg.groupByExpressions.toSeq match {
      case Nil => None
      case Seq(e) =>
        val f = fieldOf(e)
        if (f.exists(g => partitionCol.exists(_.equalsIgnoreCase(g.name)))) f
        else return None
      case _ => return None
    }

    // the grouped fold trusts every entry's partition string to be
    // `<partitionCol>=<value>`; files appended through the programmatic
    // API with partitionCol=None carry an EMPTY partition string and
    // would silently land in the NULL group — refuse instead (the same
    // guard KeyedLayout applies before reporting a partitioning)
    groupField.foreach { gf =>
      val prefix = gf.name + "="
      if (!snap.entries.forall(_.partition.startsWith(prefix))) return None
    }

    def exactType(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType | DateType | TimestampType |
           TimestampNTZType | StringType => true
      case d: DecimalType => d.precision <= 18 // INT32/INT64-backed in parquet
      case _ => false
    }

    def dom(s: String, dt: DataType): Dom = dt match {
      case StringType => Dom.Str(s)
      case _ => Dom.Num(BigDecimal(s))
    }

    def toCatalyst(d: Dom, dt: DataType): Any = (d, dt) match {
      case (Dom.Str(v), StringType) => UTF8String.fromString(v)
      case (Dom.Num(v), ByteType) => v.toByteExact
      case (Dom.Num(v), ShortType) => v.toShortExact
      case (Dom.Num(v), IntegerType) => v.toIntExact
      case (Dom.Num(v), LongType) => v.toLongExact
      case (Dom.Num(v), FloatType) => v.toFloat
      case (Dom.Num(v), DoubleType) => v.toDouble
      case (Dom.Num(v), BooleanType) => v != 0
      case (Dom.Num(v), DateType) => v.toIntExact
      case (Dom.Num(v), TimestampType) => v.toLongExact
      case (Dom.Num(v), TimestampNTZType) => v.toLongExact
      case (Dom.Num(v), t: DecimalType) => Decimal(v.setScale(t.scale))
      case _ => throw new IllegalStateException(s"no conversion $d -> $dt")
    }

    def statsOf(st: Stats, name: String): ColStats = st.cols(name)

    def countFn(f: StructField): Option[Fn] = {
      if (!decoded.forall(_._2.cols.get(f.name).exists(_.nulls >= 0)))
        return None
      Some(Fn(LongType, nullable = false,
        group => group.map(st => st.rows - statsOf(st, f.name).nulls).sum))
    }

    def minMaxFn(f: StructField, isMin: Boolean): Option[Fn] = {
      if (!exactType(f.dataType)) return None
      val ok = decoded.forall { case (_, st) =>
        st.cols.get(f.name) match {
          case None => false // no stats for the column in this file
          case Some(cs) =>
            (if (isMin) cs.min else cs.max) match {
              // bound absent is fine ONLY for a provably all-null file
              case None => cs.nulls >= 0 && cs.nulls == st.rows
              case Some(v) => f.dataType match {
                // a stored string MIN this long may be a truncation
                // prefix (a valid lower bound, not the exact minimum)
                case StringType if isMin =>
                  v.length < FileStats.MaxStringLen - 1
                case _ => true
              }
            }
        }
      }
      if (!ok) return None
      Some(Fn(f.dataType, nullable = true, { group =>
        var best: Dom = null
        group.foreach { st =>
          val cs = statsOf(st, f.name)
          (if (isMin) cs.min else cs.max).foreach { s =>
            val d = dom(s, f.dataType)
            if (best == null ||
              (if (isMin) Dom.lt(d, best) else Dom.lt(best, d))) best = d
          }
        }
        if (best == null) null else toCatalyst(best, f.dataType)
      }))
    }

    def compile(fn: AggregateFunc): Option[Fn] = fn match {
      case _: CountStar =>
        Some(Fn(LongType, nullable = false, _.map(_.rows).sum))
      case c: Count if !c.isDistinct => fieldOf(c.column).flatMap(countFn)
      case m: Min => fieldOf(m.column).flatMap(minMaxFn(_, isMin = true))
      case m: Max => fieldOf(m.column).flatMap(minMaxFn(_, isMin = false))
      case _ => None // SUM/AVG/distinct: not derivable from bounds
    }

    val fns = agg.aggregateExpressions.toSeq.map { f =>
      compile(f).getOrElse(return None)
    }
    if (fns.isEmpty) return None

    val outSchema = StructType(
      groupField.map(_.copy(nullable = true)).toSeq ++
        fns.zipWithIndex.map { case (f, i) =>
          StructField(s"agg_$i", f.dataType, f.nullable)
        })

    val rows: Array[InternalRow] = groupField match {
      case None =>
        Array(new GenericInternalRow(
          fns.map(_.eval(decoded.map(_._2))).toArray))
      case Some(gf) =>
        val conv = CatalystTypeConverters.createToCatalystConverter(gf.dataType)
        decoded.groupBy(_._1.partition).toSeq.map { case (part, es) =>
          val key = conv(PartitionPredicates.partitionValue(part, gf.dataType))
          new GenericInternalRow(
            (key +: fns.map(_.eval(es.map(_._2)))).toArray)
        }.toArray
    }
    Some((outSchema, rows))
  }
}
