package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * conversion lives in `classic.ExpressionUtils`, which is
  * private[sql]. This bridge re-exports the two conversions for
  * graft's custom Catalyst expressions — the standard pattern for
  * out-of-tree extensions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-plan a streaming micro-batch DataFrame as a BATCH frame over
    * the same InternalRow RDD — exactly what `ForeachBatchSink` does
    * before handing the user their batch frame (LogicalRDD.fromDataset
    * with isStreaming=false). A DSv1 `Sink.addBatch` receives the
    * frame still flagged streaming, where `.write` is refused; this
    * unflags it with zero row conversion so graft's sink can reuse the
    * batch writers.
    */
  def asBatch(df: DataFrame): DataFrame = replan(df, streaming = false)

  /** The inverse flip, for a DSv1 streaming `Source.getBatch`: the
    * frames it returns must carry isStreaming=true (MicroBatchExecution
    * asserts it), but they are built with the BATCH reader over the
    * version-diff's files. Same zero-conversion re-plan, opposite flag.
    */
  def asStreaming(df: DataFrame): DataFrame = replan(df, streaming = true)

  private def replan(df: DataFrame, streaming: Boolean): DataFrame = {
    val c = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      c.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        c.queryExecution.toRdd, c, isStreaming = streaming))
  }

  /** Hive-style partition-directory escaping — the SAME function the
    * parquet writer uses for `partCol=value` directory names, so
    * partition-scoped maintenance (Cdc.applyPartitioned) addresses the
    * directories Spark actually wrote, special characters included.
    */
  def escapePartitionValue(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  /** Inverse of [[escapePartitionValue]] — partition-predicate
    * evaluation over manifest entries decodes directory segments back
    * to raw values with the same table Spark's scanners use.
    */
  def unescapePartitionValue(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)

  /** `RowLevelOperationTable` is private[sql]; the merge-on-read
    * refresh rule needs to see THROUGH the wrapper Spark's row-level
    * rewrites interpose (its runtime group filter unwraps `.table`
    * and scans that raw) and to rebuild it around a re-pinned table.
    */
  def rowLevelOperationInner(
      t: org.apache.spark.sql.connector.catalog.Table)
    : Option[org.apache.spark.sql.connector.catalog.Table] = t match {
    case rt: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      Some(rt.table)
    case _ => None
  }

  /** The wrapped operation itself — [[graft.sources
    * .MorDmlRuntimeFiltering]] checks it is the merge-on-read delta
    * operation before injecting runtime file pruning.
    */
  def rowLevelOperationOf(
      t: org.apache.spark.sql.connector.catalog.Table)
    : Option[org.apache.spark.sql.connector.write.RowLevelOperation] =
    t match {
      case rt: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
        Some(rt.operation)
      case _ => None
    }

  def withRowLevelOperationInner(
      t: org.apache.spark.sql.connector.catalog.Table,
      inner: org.apache.spark.sql.connector.catalog.Table)
    : org.apache.spark.sql.connector.catalog.Table = t match {
    case rt: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      rt.copy(table = inner.asInstanceOf[
        org.apache.spark.sql.connector.catalog.Table
          with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations])
    case other => other
  }
}
