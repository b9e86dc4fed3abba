package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** [[org.apache.spark.sql.execution.datasources.FileIndex]] over one
  * pinned [[TxTable.Snapshot]] — the piece that turns TxTable from a
  * library API into a planner-integrated table format (the Delta/
  * Iceberg seam: a transaction log answering Spark's "which files?"
  * question at PLANNING time; reference workload …/SSIS/Practice
  * markdown's range-partitioned incremental loads are exactly the
  * shape this serves).
  *
  * What plugging in here buys over [[TxTable.readWhere]]'s call-time
  * pruning:
  *   - the OPTIMIZER's pushed `dataFilters` drive file skipping — any
  *     predicate Catalyst can push (from SQL text, from a view, from a
  *     join's constant-folded residue) prunes, not just the `Column`
  *     the caller happened to pass;
  *   - pruning composes with everything downstream of a scan
  *     (vectorized parquet reader, whole-stage codegen, AQE) because
  *     the scan IS Spark's native `FileSourceScanExec`;
  *   - no directory listing ever happens: the manifest carries path,
  *     size and stats per file, so planning costs zero filesystem
  *     round-trips (at 100 TB, listing is the object-store bottleneck
  *     this format exists to avoid).
  *
  * The snapshot is pinned at construction: a concurrent commit after
  * the DataFrame is built cannot change which files the query reads —
  * same read-your-snapshot isolation as every TxTable read path.
  *
  * `partitionSchema` is empty by design: TxTable keeps every column
  * (including the layout partition column) INSIDE the data files, so
  * partition pruning is subsumed by stats pruning (the partition
  * column's per-file min == max) and Spark never needs directory-name
  * parsing. All filters arrive as `dataFilters`.
  */
final class GraftFileIndex(
    spark: SparkSession, val root: String, val snapshot: TxTable.Snapshot)
    extends FileIndex {

  private val schema = snapshot.schema

  // layout spec (catalog tables persist it next to the manifest):
  // bucket layouts get manifest-level GROUP pruning for key-equality
  // predicates — min/max stats are useless on a hash-distributed key,
  // but `k = 5` can only live in bucket pmod(murmur3(5), N), so a
  // point lookup on a 100 TB table scans 1/N of it before stats even
  // apply
  private val layout: Option[Layout.Kind] =
    GraftCatalog.layoutOf(spark, root, snapshot).map(Layout.parse)

  private val qualifiedRoot: Path = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p)
  }

  /** Entries the most recent [[listFiles]] kept (test hook — specs
    * assert skipping without instrumenting the scan).
    */
  @volatile private[graft] var lastListedCount: Int = -1

  override def rootPaths: Seq[Path] = Seq(qualifiedRoot)

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // a raw scan of a merge-on-read snapshot would RESURRECT deleted
    // rows — only the merged plan may read it. With the extension rule
    // registered this is unreachable (the relation is rewritten before
    // scan planning); without it, fail loudly rather than lie.
    require(snapshot.dvs.isEmpty,
      s"table $root@v${snapshot.version} carries " +
        s"${snapshot.dvs.size} position-delete file(s) — register " +
        "spark.sql.extensions=graft.GraftExtensions so reads merge " +
        "them, or CALL rewrite_deletes to materialize first")
    // a renamed column's old files carry the OLD physical name — a raw
    // scan would silently null the column for them
    require(snapshot.aliases.isEmpty,
      s"table $root@v${snapshot.version} has renamed column(s) " +
        s"(${snapshot.aliases.keys.mkString(", ")}) whose old files " +
        "keep the historical name — register spark.sql.extensions=" +
        "graft.GraftExtensions so reads coalesce them, or CALL " +
        "rewrite_table to localize first")
    // dataFilters come from the optimizer: resolved AttributeReferences
    // with folded literals — exactly the shape FileStats.provesEmpty
    // evaluates. Files it cannot decide about are kept; Spark re-applies
    // the full predicate row-by-row on survivors (pruning only ever
    // REMOVES work, never decides correctness).
    val afterBuckets = layout match {
      case Some(Layout.Bucket(n, cs)) if dataFilters.nonEmpty =>
        BucketIds.allowedByFilters(cs, n, dataFilters) match {
          case Some(allowed) =>
            val prefix = s"${Layout.BucketPartName}="
            snapshot.entries.filter { e =>
              !e.partition.startsWith(prefix) ||
                scala.util.Try(e.partition.stripPrefix(prefix).toInt)
                  .toOption.forall(allowed.contains)
            }
          case None => snapshot.entries
        }
      // identity layouts: a conjunct referencing ONLY the partition
      // column evaluates identically for every row of a group — bind
      // the column to the entry's partition value and drop
      // provably-false groups. Subsumes nothing stats do (min == max
      // entries prune there too) but works where interpretation
      // cannot: stats-less legacy entries, and arbitrary expressions
      // (LIKE, substr, modulo) over the partition column.
      case Some(Layout.Identity(c)) if dataFilters.nonEmpty =>
        import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, GenericInternalRow}
        val dt = schema.fields.find(_.name.equalsIgnoreCase(c))
          .map(_.dataType)
        val perCol = dataFilters.filter(f =>
          f.references.nonEmpty &&
            f.references.forall(_.name.equalsIgnoreCase(c)) &&
            f.deterministic)
        if (dt.isEmpty || perCol.isEmpty) snapshot.entries
        else {
          val bound = perCol.map(_.transform {
            case a: AttributeReference if a.name.equalsIgnoreCase(c) =>
              BoundReference(0, dt.get, nullable = true)
          })
          val prefix = s"$c="
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(dt.get)
          snapshot.entries.filter { e =>
            !e.partition.startsWith(prefix) || scala.util.Try {
              val row = new GenericInternalRow(Array[Any](
                conv(PartitionPredicates.partitionValue(e.partition, dt.get))))
              // false = provably no matching rows; null/true/error keep
              bound.forall(b => b.eval(row) != false)
            }.getOrElse(true)
          }
        }
      case _ => snapshot.entries
    }
    val survivors =
      if (dataFilters.isEmpty) afterBuckets
      else {
        val cond = dataFilters.reduce(And)
        afterBuckets.filterNot(e =>
          FileStats.provesEmpty(cond, schema, e.stats))
      }
    lastListedCount = survivors.size
    val fs = qualifiedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = survivors.map { e =>
      val p = new Path(qualifiedRoot, e.relPath)
      // manifest-carried size ⇒ zero filesystem calls; -1 (pre-size
      // manifest) degrades to one getFileStatus, never to failure
      val len = if (e.size >= 0) e.size else fs.getFileStatus(p).getLen
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

  override def inputFiles: Array[String] =
    snapshot.entries.map(e => new Path(qualifiedRoot, e.relPath).toString).toArray

  override def refresh(): Unit = ()

  /** Planner input (e.g. broadcast-join decisions). Unknown sizes
    * count as 0 — consistent with "stats only remove work": a table of
    * unknown size looks small, and Spark's own runtime guards (driver
    * maxResultSize on broadcast build) backstop the misestimate.
    */
  override def sizeInBytes: Long =
    snapshot.entries.map(e => math.max(e.size, 0L)).sum
}
