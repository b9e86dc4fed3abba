package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** The graft table's DSv2 ScanBuilder: Spark's own ParquetScanBuilder
  * plus two manifest-powered scan shapes.
  *
  * Every pushdown surface (column pruning, catalyst filter split,
  * parquet filter conversion) forwards verbatim to the parquet
  * builder, so the data path is bit-for-bit the stock scan. The two
  * additions:
  *
  *  1. [[SupportsPushDownAggregates]]: when the query is an UNFILTERED
  *     aggregate the manifest can answer exactly
  *     (`graft.sources.StatsAgg`), `build()` returns a [[LocalScan]]
  *     of the precomputed rows — planned as a LocalTableScan, no file
  *     ever opened. Any filter (Spark leaves file-source data filters
  *     in the plan as post-scan filters, so an intervening Filter node
  *     already blocks aggregate pushdown — `seenFilters` is belt and
  *     braces), any inexact bound, or any unsupported function
  *     refuses, and the scan falls back to parquet.
  *  2. Storage-partitioned scan ([[GraftKeyedScan]]): when BOTH
  *     `spark.sql.sources.v2.bucketing.enabled` (Spark's recognition
  *     flag — default true in Spark 4) and graft's own opt-in
  *     `spark.graft.preserveDataGrouping=true` are set, a partitioned
  *     table's scan re-plans as one split per partition value
  *     (`graft.sources.KeyedLayout`) and reports
  *     KeyGroupedPartitioning — a join of two tables partitioned on
  *     the same key then needs no Exchange. The second flag exists
  *     because the shape bounds scan parallelism at the partition
  *     count; a default table scan must keep split-level parallelism
  *     (the same two-flag design as Iceberg's preserve-data-grouping).
  *
  * Lives in the `org.apache.spark.sql` namespace because file-source
  * filter pushdown flows through the `private[sql]`
  * [[SupportsPushDownCatalystFilters]] seam — same bridge pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]].
  */
final class GraftAggScanBuilder(
    delegate: ParquetScanBuilder,
    statsAnswer: Aggregation => Option[(StructType, Array[InternalRow])],
    keyedLayout: Seq[Expression] =>
      Option[Seq[(InternalRow, Array[PartitionedFile])]],
    keyed: Option[(Seq[String], org.apache.spark.sql.connector.expressions.Expression)])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates {

  /** Aggregate-pushdown-only form (no keyed-scan support). */
  def this(
      delegate: ParquetScanBuilder,
      statsAnswer: Aggregation => Option[(StructType, Array[InternalRow])]) =
    this(delegate, statsAnswer, _ => None, None)

  // keyed = (layout source columns, reported V2 transform): the
  // columns gate on read-schema survival; the transform is what the
  // keyed scan reports (identity(col) or bucket(n, col...))

  private var seenFilters: Seq[Expression] = Nil
  private var answer: Option[(StructType, Array[InternalRow])] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // `_file`/`_pos` are the table's row-lineage METADATA columns —
    // served for real only by the merge-on-read DML scan
    // (graft.sources.GraftDeltaScan). The stock parquet path would
    // silently read them as nulls (no such physical column), so an
    // ordinary SELECT that references them refuses loudly instead.
    // A table whose own schema claims the names keeps them (the
    // metadata columns are conflict-hidden then).
    val phantom = requiredSchema.fieldNames.filter(n =>
      (n == "_file" || n == "_pos") &&
        !delegate.schema.fieldNames.contains(n))
    if (phantom.nonEmpty) throw new UnsupportedOperationException(
      s"column(s) ${phantom.mkString(", ")} are row-lineage metadata " +
        "for merge-on-read DML (spark.graft.dml.mode=mor) and are not " +
        "served on ordinary reads")
    delegate.pruneColumns(requiredSchema)
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    seenFilters = seenFilters ++ filters
    delegate.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    seenFilters.isEmpty && statsAnswer(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (seenFilters.nonEmpty) return false
    answer = statsAnswer(agg)
    answer.isDefined
  }

  override def build(): Scan = answer match {
    case Some((schema, rows)) => GraftStatsLocalScan(schema, rows)
    case None =>
      val scan = delegate.build()
      // storage-partitioned shape only under the user's opt-in flag
      // (it trades split parallelism for co-partitioned plans) and
      // only when the key column survives into the read schema —
      // Spark cannot bind the reported partitioning otherwise
      val conf = delegate.sparkSession.sessionState.conf
      val bucketing = conf.getConf(SQLConf.V2_BUCKETING_ENABLED) &&
        delegate.sparkSession.conf
          .get("spark.graft.preserveDataGrouping", "false") == "true"
      keyed match {
        case Some((srcCols, transform)) if bucketing &&
          srcCols.forall(c =>
            scan.readSchema().fieldNames.exists(_.equalsIgnoreCase(c))) =>
          keyedLayout(seenFilters) match {
            case Some(groups) => new GraftKeyedScan(scan, transform, groups)
            case None => scan
          }
        case _ => scan
      }
  }
}

/** Aggregate results precomputed from manifest stats, as a scan.
  * Spark plans a [[LocalScan]] as a driver-local LocalTableScan — the
  * correct shape for metadata-sized results (one row per partition at
  * most), regardless of table size.
  */
final case class GraftStatsLocalScan(
    override val readSchema: StructType, data: Array[InternalRow])
  extends LocalScan {
  override def rows(): Array[InternalRow] = data
  override def description(): String =
    s"GraftStatsLocalScan(${data.length} manifest-stats rows)"
}
