package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Minimal TRANSACTIONAL parquet table — the Delta/Iceberg-shaped seam
  * the CDC module needs, built from first principles on plain
  * parquet + an atomically-renamed manifest (the commit protocol of
  * the published Delta Lake paper, reduced to its core):
  *
  *   root/
  *     _manifest/v<N>.manifest   ← the ONLY commit point
  *     data/<uuid>/...parquet    ← immutable, write-once data files
  *
  * A manifest is a text file: line 1 `#schema=<DDL>`, then one
  * `relativePath<TAB>partitionValue` entry per live data file. A
  * commit writes its data files first (invisible — no manifest
  * references them), then writes `v<N+1>.manifest.tmp` and RENAMES it
  * to `v<N+1>.manifest`. Readers resolve the highest committed
  * manifest once and read exactly its file list, so they see the
  * previous snapshot or the new one — never a torn mix; a crash at
  * any point before the rename leaves the table bit-identical
  * (orphaned data files are invisible and reclaimed by [[vacuum]]).
  * Version numbers give free time travel ([[readVersion]]) and an
  * optimistic-concurrency guard (a second writer racing to the same
  * version loses the rename and must retry on the new snapshot).
  *
  * This is the transactional upgrade of `Cdc.applyPartitioned`'s
  * dynamic partition overwrite: [[overwritePartitions]] swaps the
  * touched partitions' file sets in ONE commit — untouched partitions
  * keep their exact files (not rewritten, not even re-listed from
  * storage), and a reader never observes some partitions new and
  * others old.
  *
  * At 100 TB: the manifest carries file-level metadata only (path +
  * partition value — the object-store-listing bottleneck this design
  * exists to avoid); data files never move after write; partition
  * pruning happens manifest-side before Spark ever lists a file.
  */
object TxTable {

  final case class Entry(relPath: String, partition: String)

  final case class Snapshot(version: Long, schemaDdl: String, entries: Seq[Entry])

  final class ConcurrentCommitException(v: Long)
    extends RuntimeException(
      s"manifest v$v already committed by a concurrent writer; " +
        "re-read the table and retry the transaction")

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifest")

  private val ManifestRe = "v(\\d+)\\.manifest".r

  /** All committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(manifestDir(root))) return Seq.empty
    f.listStatus(manifestDir(root)).toSeq
      .map(_.getPath.getName)
      .collect { case ManifestRe(n) => n.toLong }
      .sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Parse one committed manifest. */
  def snapshot(spark: SparkSession, root: String, version: Long): Snapshot = {
    val f = fs(spark, root)
    val p = new Path(manifestDir(root), s"v$version.manifest")
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val ddl = lines.head.stripPrefix("#schema=")
    val entries = lines.tail.map { l =>
      val Array(rel, part) = l.split("\t", 2)
      Entry(rel, part)
    }
    Snapshot(version, ddl, entries)
  }

  /** Read the CURRENT snapshot (empty-but-typed DataFrame for a table
    * with a schema and no live files; error for an uninitialized root).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed manifest under $root")))

  /** Time travel: read an exact committed version's file set. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val s = snapshot(spark, root, version)
    val schema = StructType.fromDDL(s.schemaDdl)
    if (s.entries.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema)
        .parquet(s.entries.map(e => s"$root/${e.relPath}"): _*)
  }

  /** Write `df`'s rows as immutable data files (NOT yet visible — no
    * manifest references them) and return their entries. Partitioned
    * by `partitionCol` when given, so [[overwritePartitions]] can swap
    * file sets partition-by-partition.
    */
  private def writeData(
      df: DataFrame, root: String, partitionCol: Option[String]): Seq[Entry] = {
    val spark = df.sparkSession
    val uuid = java.util.UUID.randomUUID().toString
    val rel = s"data/$uuid"
    val dir = s"$root/$rel"
    // partition DIRECTORIES come from a duplicated column: Spark's
    // partitionBy strips the partition column from the data files, but
    // manifest-listed reads skip directory discovery — the real column
    // must stay inside the parquet. The duplicate exists only as the
    // directory name.
    partitionCol match {
      case Some(c) =>
        df.withColumn("__gtx_part", df(c))
          .write.partitionBy("__gtx_part").parquet(dir)
      case None => df.write.parquet(dir)
    }
    val f = fs(spark, root)
    val it = f.listFiles(new Path(dir), true)
    val out = scala.collection.mutable.Buffer.empty[Entry]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet")) {
        val full = st.getPath.toUri.getPath
        val relPath = full.substring(full.indexOf(rel))
        val part = partitionCol.map { c =>
          relPath.split("/").find(_.startsWith("__gtx_part="))
            .map(seg => c + seg.stripPrefix("__gtx_part"))
            .getOrElse("")
        }.getOrElse("")
        out += Entry(relPath, part)
      }
    }
    out.toSeq
  }

  /** The single commit point: write `v<next>.manifest.tmp`, rename to
    * `v<next>.manifest`. Rename is the atomicity primitive (POSIX /
    * HDFS); losing the race to the version number aborts the commit
    * (the data files stay orphaned and vacuumable, the table is
    * untouched).
    */
  private def commit(
      spark: SparkSession, root: String, next: Long,
      schemaDdl: String, entries: Seq[Entry]): Long = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val finalP = new Path(manifestDir(root), s"v$next.manifest")
    if (f.exists(finalP)) throw new ConcurrentCommitException(next)
    val tmp = new Path(manifestDir(root), s"v$next.manifest.tmp")
    val os = f.create(tmp, true)
    try os.write(
      (s"#schema=$schemaDdl\n" +
        entries.map(e => s"${e.relPath}\t${e.partition}").mkString("\n") +
        (if (entries.isEmpty) "" else "\n"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (!f.rename(tmp, finalP)) {
      f.delete(tmp, false)
      throw new ConcurrentCommitException(next)
    }
    next
  }

  /** Initialize (or reinitialize) a table root with `df` as version 0. */
  def create(
      df: DataFrame, root: String,
      partitionCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.delete(new Path(root), true)
    val entries = writeData(df, root, partitionCol)
    commit(spark, root, 0L, df.schema.toDDL, entries)
  }

  /** Append-only commit: new files become visible atomically alongside
    * every existing file.
    */
  def append(
      df: DataFrame, root: String,
      partitionCol: Option[String] = None): Long = {
    val spark = df.sparkSession
    val cur = snapshot(spark, root,
      currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed manifest under $root")))
    val entries = writeData(df, root, partitionCol)
    commit(spark, root, cur.version + 1, cur.schemaDdl, cur.entries ++ entries)
  }

  /** ATOMIC dynamic partition overwrite — the CDC apply target shape:
    * every partition present in `df` has its file set replaced by
    * `df`'s rows; untouched partitions keep their exact files. One
    * rename makes the whole multi-partition swap visible.
    */
  def overwritePartitions(
      df: DataFrame, root: String, partitionCol: String): Long = {
    val spark = df.sparkSession
    val cur = snapshot(spark, root,
      currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed manifest under $root")))
    val fresh = writeData(df, root, Some(partitionCol))
    val touched = fresh.map(_.partition).toSet
    val kept = cur.entries.filterNot(e => touched.contains(e.partition))
    commit(spark, root, cur.version + 1, cur.schemaDdl, kept ++ fresh)
  }

  /** Drop data files referenced by NO manifest ≥ `keepFromVersion`
    * (crash orphans and compacted-away history). Never touches files
    * the retained snapshots can still read.
    */
  def vacuum(spark: SparkSession, root: String, keepFromVersion: Long): Unit = {
    val f = fs(spark, root)
    val live = versions(spark, root).filter(_ >= keepFromVersion)
      .flatMap(v => snapshot(spark, root, v).entries.map(_.relPath)).toSet
    val dataDir = new Path(root, "data")
    if (!f.exists(dataDir)) return
    val it = f.listFiles(dataDir, true)
    val doomed = scala.collection.mutable.Buffer.empty[Path]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val full = st.getPath.toUri.getPath
        val rel = full.substring(full.indexOf("data/"))
        if (!live.contains(rel)) doomed += st.getPath
      }
    }
    doomed.foreach(p => f.delete(p, false))
  }
}
