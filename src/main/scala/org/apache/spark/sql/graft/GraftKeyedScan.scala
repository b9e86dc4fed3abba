package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
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
  */
final class GraftKeyedScan(
    delegate: Scan, keyExpr: V2Expression,
    groups: Seq[(InternalRow, Array[PartitionedFile])])
  extends Scan with SupportsReportPartitioning {

  override def readSchema(): StructType = delegate.readSchema()

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
    override def planInputPartitions(): Array[InputPartition] =
      groups.zipWithIndex.map { case ((key, files), i) =>
        new KeyedFilePartition(i, files, key)
      }.toArray
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
