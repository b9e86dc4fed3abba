package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GenericInternalRow}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.types.StructType

/** Plan a snapshot's files as ONE input split per partition value —
  * the layout contract behind storage-partitioned joins: every split
  * holds exactly the rows of one partition-key value, so a join of two
  * graft tables partitioned on the same key needs NO shuffle (Spark
  * matches split keys at planning time instead of exchanging 100 TB).
  *
  * File skipping is preserved: `dataFilters` prune entries through the
  * same [[FileStats.provesEmpty]] evaluation the planner's file index
  * uses, and a partition whose files all prune vanishes from the plan
  * (Spark's partition-value alignment handles a key missing on one
  * side). Returns None when the table layout can't guarantee the
  * grouping — unpartitioned tables or a legacy entry without a
  * `col=value` partition string — in which case the caller keeps the
  * stock scan.
  */
private[graft] object KeyedLayout {

  def groups(
      spark: SparkSession, root: String, snap: TxTable.Snapshot,
      layoutSpec: String, dataFilters: Seq[Expression])
    : Option[Seq[(InternalRow, Array[PartitionedFile])]] = {

    // merge-on-read snapshots refuse the keyed (raw-file) scan: its
    // groups would include deleted rows (the extension rule serves
    // such tables through the merged plan instead)
    if (snap.dvs.nonEmpty) return None
    // renamed columns refuse too: the keyed scan reads raw files,
    // which carry historical names for pre-rename data
    if (snap.aliases.nonEmpty) return None

    // COMPOSITE bucket keys refuse the keyed scan: Spark's
    // KeyGroupedPartitioning.supportsExpressions accepts only
    // single-argument transforms (verified against 4.1 —
    // isSupportedTransform requires children.size == 1), so reporting
    // bucket(n, c1, c2) yields UnknownPartitioning: the split-per-group
    // plan would bound parallelism with NO zero-shuffle payoff.
    // Composite layouts keep placement parity, manifest group pruning,
    // and clustered DML; the storage-partitioned JOIN path is
    // single-column until Spark's planner accepts multi-arg transforms.
    Layout.parse(layoutSpec) match {
      case b: Layout.Bucket if b.cols.length > 1 => return None
      case _ => ()
    }

    val schema = snap.schema
    val kind = Layout.parse(layoutSpec)
    // partition value type: the column's for identity, the bucket id
    // (int) for buckets — in both cases what the reported transform
    // produces, which is what Spark's key grouping compares
    if (!kind.cols.forall(c =>
      schema.fields.exists(_.name.equalsIgnoreCase(c))))
      return None
    val partType = kind.partType(schema)
    if (snap.entries.exists(!_.partition.contains("="))) return None

    // bucket layouts: bound the live group set from enumerable key
    // filters first (same manifest-level pruning as the ordinary
    // read path — min/max stats cannot skip on a hash-distributed
    // key, the group bound can)
    val afterBuckets = kind match {
      case Layout.Bucket(n, cs) if dataFilters.nonEmpty =>
        BucketIds.allowedByFilters(cs, n, dataFilters) match {
          case Some(allowed) =>
            val prefix = s"${Layout.BucketPartName}="
            snap.entries.filter { e =>
              !e.partition.startsWith(prefix) ||
                scala.util.Try(e.partition.stripPrefix(prefix).toInt)
                  .toOption.forall(allowed.contains)
            }
          case None => snap.entries
        }
      case _ => snap.entries
    }
    val survivors =
      if (dataFilters.isEmpty) afterBuckets
      else {
        val cond = dataFilters.reduce(And)
        afterBuckets.filterNot(e => FileStats.provesEmpty(cond, schema, e.stats))
      }

    val qualifiedRoot = {
      val p = new Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
    }
    val fs = qualifiedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conv = CatalystTypeConverters.createToCatalystConverter(partType)

    Some(survivors.groupBy(_.partition).toSeq.map { case (part, es) =>
      val key = new GenericInternalRow(Array[Any](
        conv(PartitionPredicates.partitionValue(part, partType))))
      val files = es.map { e =>
        val p = new Path(qualifiedRoot, e.relPath)
        val len = if (e.size >= 0) e.size else fs.getFileStatus(p).getLen
        PartitionedFile(InternalRow.empty, SparkPath.fromPath(p), 0, len,
          Array.empty[String], 0L, len)
      }.toArray
      key -> files
    })
  }
}
