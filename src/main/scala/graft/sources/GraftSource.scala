package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister,
  RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * standard Spark data-source surface over [[TxTable]], registered via
  * META-INF/services so the short name resolves like any built-in
  * format. This is the integration layer end users touch; the
  * transactional semantics live entirely in [[TxTable]], the planning
  * integration in [[GraftFileIndex]].
  *
  * Read side: resolves ONE snapshot (current, or `versionAsOf` for
  * time travel) and hands Spark a `HadoopFsRelation` whose file
  * listing is the manifest — so a SQL `WHERE` on a clustered column
  * skips data files at planning time and the scan itself is Spark's
  * vectorized parquet reader inside whole-stage codegen. Reads are
  * snapshot-isolated: concurrent commits after `load()` don't move
  * the query.
  *
  * Write side (`option("partitionCol", c)` for layout partitioning):
  *   - Append       → [[TxTable.append]] (creates the table on first
  *                    write — the idempotent-bootstrap shape ETL jobs
  *                    want), one atomic manifest commit;
  *   - Overwrite    → same-schema content replacement via
  *                    [[TxTable.rewriteAll]]: history stays time-
  *                    travelable, unlike a destructive re-create.
  *                    Schema-changing overwrite is refused loudly —
  *                    use evolve ([[TxTable.addColumns]]/
  *                    [[TxTable.dropColumns]]) or re-create on purpose;
  *   - ErrorIfExists/ Ignore → standard Spark semantics.
  *
  * Reference workload: …/Integration/SSIS/Practice markdown's
  * "write to the staging table, swap atomically" pattern — here the
  * swap is the manifest commit, and the reader API is plain
  * `spark.read`.
  */
final class GraftSource
    extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def cdfMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  private def cdfKeys(parameters: Map[String, String]): Seq[String] =
    parameters.getOrElse("keys", throw new IllegalArgumentException(
      "readChangeFeed needs option(\"keys\",\"k1,k2\") — the columns " +
        "that identify a row across versions"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val snap = TxTable.currentSnapshot(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed graft table under $root — the streaming source " +
          "needs an existing table to pin its schema"))
    val table = snap.schema
    val out =
      if (cdfMode(parameters))
        StructType(table.fields :+
          org.apache.spark.sql.types.StructField(
            ChangeFeed.OpCol, org.apache.spark.sql.types.StringType,
            nullable = false))
      else table
    (shortName(), out)
  }

  /** `spark.readStream.format("graft")` — tail a graft table's commit
    * history as a micro-batch stream. Manifest versions ARE the
    * offsets: a batch is the set of data files version (start, end]
    * ADDED, so replays of the same version range read identical
    * immutable files — the deterministic-replay half of end-to-end
    * exactly-once (the sink's txn watermark is the other half).
    * Default behavior emits the full current snapshot as the first
    * batch, then appends; `option("startingVersion", v)` skips the
    * snapshot and tails changes committed after version v
    * (`"latest"` = after the version current at stream start). The
    * source tails APPEND-ONLY history: a version that removed files
    * (overwrite/compact/z-order) fails loudly unless
    * `option("ignoreChanges","true")` accepts added-files-only
    * semantics (rewritten rows may re-emit — same contract Delta
    * documents for its source).
    *
    * With `option("readChangeFeed","true")` + `option("keys","k1,k2")`
    * the stream emits row-level DELTAS instead of appended files: each
    * micro-batch is [[ChangeFeed.between]] over the version range, so
    * the output carries the table's columns plus `_op` ∈ {insert,
    * update, delete}. Where the append tail must refuse rewrites, the
    * change feed is exactly the right answer to them: an overwrite
    * emits its net row changes, and a compaction (same rows, new
    * files) nets to ZERO rows. The first batch emits the starting
    * snapshot as inserts unless `startingVersion` skips it.
    * `option("maxVersionsPerTrigger", n)` bounds catch-up batches.
    */
  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    val base = parameters.get("startingVersion") match {
      case Some("latest") => TxTable.currentVersion(spark, root).get
      case Some(v) => v.toLong
      case None => -1L // full snapshot first
    }
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxVersions.foreach(n => require(n > 0,
      s"maxVersionsPerTrigger must be positive, got $n"))
    new GraftStreamSource(spark, root, pinned, base,
      parameters.get("ignoreChanges").exists(_.toBoolean),
      changeFeedKeys =
        if (cdfMode(parameters)) Some(cdfKeys(parameters)) else None,
      maxVersionsPerTrigger = maxVersions)
  }

  /** `df.writeStream.format("graft")` — exactly-once streaming append.
    * Every micro-batch goes through [[TxTable.txnAppend]]: the batch's
    * data files and the advanced (txnId → batchId) watermark land in
    * ONE atomic manifest commit, so the at-least-once replay window of
    * any checkpointed sink (crash after manifest commit, before
    * checkpoint commit) dedups to a no-op on restart. The transaction
    * identity defaults to the query's checkpoint location — stable
    * across restarts by construction — and `option("txnAppId", …)`
    * overrides it when two queries share a checkpoint layout. Append
    * output mode only: aggregation modes belong in `foreachBatch`
    * over the state-MV helpers (Streams.sketchMvStream).
    */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft streaming sink supports Append output mode only, got " +
        s"$outputMode — use foreachBatch for stateful MV maintenance")
    val root = rootOf(parameters)
    val txnId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft streaming sink needs a stable transaction identity for " +
          "exactly-once: set option(\"checkpointLocation\", …) or " +
          "option(\"txnAppId\", …)"))
    new GraftSink(root, parameters.get("partitionCol"), txnId,
      parameters.get("autoCompactFiles").map(_.toInt))
  }

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft format requires a path: spark.read.format(\"graft\").load(root)"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    require(
      !(parameters.contains("versionAsOf") &&
        parameters.contains("timestampAsOf")),
      "set versionAsOf OR timestampAsOf, not both")
    val snap = parameters.get("versionAsOf") match {
      case Some(v) => TxTable.snapshot(spark, root, v.toLong)
      case None => parameters.get("timestampAsOf") match {
        case Some(t) => TxTable.snapshot(spark, root,
          TxTable.versionAt(spark, root, parseTsMillis(t)))
        case None => TxTable.currentSnapshot(spark, root).getOrElse(
          throw new IllegalStateException(
            s"no committed graft table under $root"))
      }
    }
    relationFor(spark, root, snap)
  }

  /** `timestampAsOf` accepts epoch millis or a local-zone
    * `yyyy-MM-dd HH:mm:ss[.fff]` (ISO 'T' separator tolerated).
    */
  private def parseTsMillis(s: String): Long =
    scala.util.Try(s.toLong).getOrElse(
      java.sql.Timestamp.valueOf(s.replace('T', ' ')).getTime)

  private def relationFor(
      spark: SparkSession, root: String, snap: TxTable.Snapshot): BaseRelation =
    HadoopFsRelation(
      location = new GraftFileIndex(spark, root, snap),
      partitionSchema = StructType(Nil),
      dataSchema = snap.schema,
      bucketSpec = None,
      fileFormat = new GraftSource.ReadOnlyParquet(),
      options = Map.empty)(spark)

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val partitionCol = parameters.get("partitionCol")
    val exists = TxTable.currentSnapshot(spark, root).isDefined
    mode match {
      case SaveMode.Append =>
        if (exists) TxTable.append(data, root, partitionCol)
        else TxTable.create(data, root, partitionCol)
      case SaveMode.Overwrite =>
        if (exists) TxTable.rewriteAll(spark, root, _ => data)
        else TxTable.create(data, root, partitionCol)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists under $root (mode=ErrorIfExists)")
        else TxTable.create(data, root, partitionCol)
      case SaveMode.Ignore =>
        if (!exists) TxTable.create(data, root, partitionCol)
    }
    createRelation(sqlContext, parameters - "versionAsOf")
  }
}

/** The micro-batch end of `writeStream.format("graft")` — see
  * [[GraftSource.createSink]]. First batch against a fresh root
  * bootstraps an EMPTY v0 table (schema only, no data files), so a
  * crash between bootstrap and the first data commit replays safely:
  * the bootstrap is skipped when a manifest exists, and the data
  * commit dedups through the txn watermark. Bootstrapping WITH the
  * first batch's rows instead would leave a replay window where the
  * same rows land twice (create carries no watermark).
  */
final class GraftSink(
    root: String, partitionCol: Option[String], txnId: String,
    autoCompactFiles: Option[Int] = None) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // the frame arrives flagged streaming (DSv1 sink contract);
    // re-plan it as batch over the same InternalRows, as
    // ForeachBatchSink does for its users
    val batch = org.apache.spark.sql.GraftColumnBridge.asBatch(data)
    if (TxTable.currentSnapshot(spark, root).isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
      TxTable.create(empty, root, partitionCol)
    }
    TxTable.txnAppend(batch, root, partitionCol, txnId, batchId)
    // Micro-batch appends are THE many-small-files generator; with
    // option("autoCompactFiles", n) the sink bin-packs once the live
    // file count reaches n — AFTER the watermark commit, so a crash
    // mid-compaction costs nothing (rows identical, replay dedups).
    // A lost race against a concurrent writer skips; the next batch
    // retries. (Downstream append-only tails see a non-append commit;
    // pair auto-compaction with readChangeFeed consumers, which net
    // compactions to zero rows.)
    autoCompactFiles.foreach { n =>
      val live = TxTable.currentSnapshot(spark, root)
        .map(_.entries.size).getOrElse(0)
      if (live >= n)
        try TxTable.compact(spark, root)
        catch { case _: TxTable.ConcurrentCommitException => () }
    }
    GraftSink.afterBatchHook(batchId)
  }

  override def toString: String = s"GraftSink[$root]"
}

/** The version-tailing end of `readStream.format("graft")` — see
  * [[GraftSource.createSource]]. Offsets are manifest versions;
  * `baseVersion` is the EXCLUSIVE lower bound of the tail (-1 = emit
  * the full snapshot first). Manifests are immutable once committed,
  * so `getBatch` over a version range is deterministic across
  * restarts — Spark's checkpointed offset log replays it bit-equal.
  */
final class GraftStreamSource(
    spark: SparkSession, root: String, pinned: StructType,
    baseVersion: Long, ignoreChanges: Boolean,
    changeFeedKeys: Option[Seq[String]] = None,
    maxVersionsPerTrigger: Option[Long] = None) extends Source {

  override def schema: StructType = pinned

  /** Highest version already handed out via [[getBatch]] — the lower
    * bound the rate limiter advances from. Spark replays the last
    * uncommitted range through getBatch on restart, which re-seeds
    * this; until then the limiter counts from the tail base, which
    * only makes the first batch smaller, never wrong.
    *
    * `maxVersionsPerTrigger` interplay with triggers: under a
    * ProcessingTime trigger the backlog drains in bounded batches
    * (one capped range per micro-batch). Trigger.AvailableNow latches
    * the FIRST getOffset result as the run's end (the V1-source
    * wrapper fetches it once), so each AvailableNow RUN drains at
    * most that many versions and terminates — never wrong (offsets
    * commit only what was processed; the next run continues), just
    * bounded per run.
    */
  @volatile private var dealt: Long = baseVersion

  override def getOffset: Option[Offset] = {
    val cur = TxTable.currentVersion(spark, root).getOrElse(return None)
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(cur, math.max(dealt, baseVersion) + n)
      case None => cur
    }
    Some(capped).filter(_ > baseVersion).map(LongOffset(_))
  }

  // a restart hands back SerializedOffset(json), not LongOffset —
  // the json of both is the bare version number
  private def versionOf(o: Offset): Long = o.json.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    dealt = math.max(dealt, versionOf(end))
    val df = changeFeedKeys match {
      case Some(keys) => changeBatch(start, end, keys)
      case None => appendBatch(start, end)
    }
    // Source.getBatch frames must carry isStreaming=true
    org.apache.spark.sql.GraftColumnBridge.asStreaming(df)
  }

  private def appendBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endSnap = TxTable.snapshot(spark, root, versionOf(end))
    val startV = start.map(versionOf).getOrElse(baseVersion)
    val added =
      if (startV < 0) endSnap.entries
      else {
        val beforeSnap = TxTable.snapshot(spark, root, startV)
        val before = beforeSnap.entries.map(_.relPath).toSet
        val removed = before -- endSnap.entries.map(_.relPath).toSet
        // a merge-on-read DELETE removes ROWS without removing files —
        // the same non-append shape as an overwrite, caught the same
        // way (the change feed is the right consumer for both). A
        // metadata-only RENAME is caught identically: the pinned
        // schema could not read post-rename files faithfully.
        val dvChanged = beforeSnap.dvs != endSnap.dvs ||
          beforeSnap.aliases != endSnap.aliases
        if ((removed.nonEmpty || dvChanged) && !ignoreChanges)
          throw new IllegalStateException(
            s"graft streaming source: non-append change between " +
              s"v$startV and v${endSnap.version} under $root " +
              s"(${removed.size} file(s) removed by overwrite/compact" +
              (if (dvChanged) "; position-delete set changed by " +
                "merge-on-read DELETE" else "") + ") — " +
              "tail an append-only table, accept added-files-only " +
              "semantics with option(\"ignoreChanges\",\"true\"), or " +
              "stream row-level deltas with option(\"readChangeFeed\"," +
              "\"true\")")
        endSnap.entries.filterNot(e => before.contains(e.relPath))
      }
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
    else
      spark.read.schema(pinned)
        .parquet(added.map(e => TxTable.entryPath(root, e.relPath)): _*)
  }

  /** Row-level delta mode: [[ChangeFeed.between]] over the version
    * range — rewrites emit their net changes, compactions net to zero
    * rows. A first batch with no starting version emits the snapshot
    * as inserts (the Delta CDF bootstrap convention).
    */
  private def changeBatch(
      start: Option[Offset], end: Offset, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val endV = versionOf(end)
    val startV = start.map(versionOf).getOrElse(baseVersion)
    if (startV < 0) {
      val endSnap = TxTable.snapshot(spark, root, endV)
      // merged: the bootstrap snapshot must not emit rows a
      // merge-on-read DELETE already removed, and renamed columns
      // must coalesce across their historical names
      val full = MergeOnRead.mergedRead(spark, root, endSnap, endSnap.entries)
      full.withColumn(ChangeFeed.OpCol, lit("insert"))
    } else ChangeFeed.between(spark, root, startV, endV, keys)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$root]"
}

object GraftSink {
  /** Test seam: runs after the manifest commit, before Spark's
    * checkpoint commit — throwing here simulates a crash in the
    * at-least-once replay window (StreamSpec).
    */
  @volatile private[graft] var afterBatchHook: Long => Unit = _ => ()
}

object GraftSource {
  /** The scan format for graft relations — parquet reads, NO writes.
    * Spark plans `INSERT INTO` over any `HadoopFsRelation` as a direct
    * file write into the relation's root path, which would bypass the
    * manifest entirely: the inserted rows stay invisible to every read
    * (manifest-driven listing) while their files orphan in the table
    * root — silent data loss from the user's view. `prepareWrite` is
    * the first thing the write path calls, so throwing here refuses
    * the statement loudly before a single file or staging dir exists.
    */
  private final class ReadOnlyParquet extends ParquetFileFormat {
    override def prepareWrite(
        sparkSession: SparkSession,
        job: org.apache.hadoop.mapreduce.Job,
        options: Map[String, String],
        dataSchema: StructType): org.apache.spark.sql.execution.datasources.OutputWriterFactory =
      throw new UnsupportedOperationException(
        "INSERT INTO a graft table view is not supported — it would " +
          "bypass the transactional manifest. Write through " +
          "df.write.format(\"graft\").mode(\"append\"|\"overwrite\") instead.")
  }
}
