package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/** A parquet scan re-planned as one input split per partition value,
  * reporting [[KeyGroupedPartitioning]] — the scan shape behind
  * storage-partitioned joins.
  *
  * With `spark.sql.sources.v2.bucketing.enabled`, Spark groups these
  * splits by [[HasPartitionKey]] and a join (or aggregate) keyed on
  * the partition column plans with NO Exchange on this side: at
  * 100 TB, a fact⋈fact join of two tables partitioned on the same key
  * goes from the cluster-wide shuffle that dominates the job to a
  * zipped per-partition local join. Reading is delegated verbatim to
  * the wrapped ParquetScan's reader factory — each split is a stock
  * [[FilePartition]] (vectorization, codegen, pushed parquet filters
  * all intact); only the GROUPING of files into splits changes.
  *
  * The tradeoff is parallelism bounded by the partition count (the
  * inherent storage-partitioned-join contract), which is why the scan
  * builder only takes this shape under the v2-bucketing flag — the
  * user's declaration that co-partitioned plans matter more than
  * split-level parallelism.
  *
  * Splits are planned per FILE (each tagged with its group's key),
  * not pre-merged per key group: Spark's own key-grouped planning
  * (`DataSourceV2ScanExecBase.groupPartitions`) merges same-key
  * splits into one task under the default fully-clustered mode — the
  * identical one-task-per-group plan a pre-merged split would give —
  * but under `spark.sql.sources.v2.bucketing.partiallyClustered
  * Distribution.enabled` it deliberately KEEPS them apart on the
  * larger join side and replicates the matching groups of the smaller
  * side instead. That conf is the skewed-bucket straggler escape
  * hatch: a hot bucket whose files would otherwise serialize through
  * one task (AQE cannot split a key-grouped partition) processes as
  * one task per file. Pre-merging here would silently cap that at one
  * task per key no matter what the user asked for.
  */
final class GraftKeyedScan(
    delegate: Scan, keyExpr: V2Expression,
    groups: Seq[(InternalRow, Array[PartitionedFile])])
  extends Scan with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = delegate.readSchema()

  /** Forward the delegate's size estimate (or sum the planned files
    * when the delegate reports none): partially-clustered SPJ uses
    * per-side size to pick which side's groups to replicate — without
    * stats both sides default to "unknown" and the planner cannot
    * place the replication on the small side.
    */
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      private val bytes = groups.iterator.flatMap(_._2).map(_.length).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def description(): String =
    s"GraftKeyedScan(key=${keyExpr.describe()}, ${groups.size} key groups) " +
      delegate.description()

  override def supportedCustomMetrics(): Array[CustomMetric] =
    delegate.supportedCustomMetrics()

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    delegate.reportDriverMetrics()

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(keyExpr), groups.size)

  override def toBatch: Batch = new Batch {
    private val inner = delegate.toBatch
    override def planInputPartitions(): Array[InputPartition] = {
      var i = -1
      groups.flatMap { case (key, files) =>
        files.map { f =>
          i += 1
          new KeyedFilePartition(i, Array(f), key)
        }
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      inner.createReaderFactory()
  }
}

/** A stock [[FilePartition]] (the parquet reader factory's expected
  * split type) that also carries its partition-key value for Spark's
  * key-grouped planning.
  */
final class KeyedFilePartition(
    idx: Int, fs: Array[PartitionedFile], key: InternalRow)
  extends FilePartition(idx, fs) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}
