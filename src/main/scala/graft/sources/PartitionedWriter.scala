package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink-side layout control (SURVEY S12/S14; reference: OLE DB Fast
  * Load batching …/Pro…/004.md:15-23, parallel partition loading
  * …/Глава 14…md:96-103; sort keys from the MergeTree `ORDER BY`
  * migration idiom …Перелив….md:27-46).
  *
  * The ClickHouse sort key becomes physical parquet layout: rows
  * hash-repartitioned by the partition columns (one writer task per
  * output partition — the reference's parallel destinations) and
  * sorted WITHIN partitions by the sort key, giving min/max row-group
  * statistics that let later scans skip pages — the MergeTree
  * data-skipping analog. At 100 TB this layout decision is the
  * difference between reading a partition and reading everything.
  */
object PartitionedWriter {

  /** Hive-partitioned, sort-keyed parquet write. */
  def writeSorted(
      df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String]): Unit = {
    val prepared =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
          .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else
        df.sortWithinPartitions(sortCols.map(col): _*)
    val writer = prepared.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(path)
  }

  /** Bucketed managed table for shuffle-free co-located joins on the
    * bucket key (both sides bucketed the same way ⇒ SortMergeJoin
    * without an Exchange).
    */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
