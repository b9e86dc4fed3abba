package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** OUTBOUND change data capture over [[TxTable]] history — the
  * read-side complement of `Cdc.applyTx` (which ingests a change
  * feed): derive the row-level insert/update/delete delta BETWEEN two
  * committed versions, without the table ever having logged changes.
  * (Reference workload: …/Integration/SSIS/Practice/004 CDC.md
  * consumes exactly this shape from the source database's CDC tables;
  * here the table format itself can produce it for downstream
  * consumers.)
  *
  * The manifest diff IS the optimization: data files are immutable,
  * so a file present in both versions contributes NO changes and is
  * never read. Only files REMOVED since `fromVersion` (old images)
  * and files ADDED (new images) are scanned, then reconciled with one
  * null-safe full-outer join on the keys. At 100 TB a CDC batch that
  * rewrote 5 partitions diffs 5 partitions' files — the delta costs
  * O(changed data), not O(table).
  *
  * Contract (the `Cdc.applyTx` maintenance pattern): one row per key,
  * and the partition value is a function of the key — so a key's row
  * can never sit in an unchanged file in one version and a changed
  * file in the other, which would misclassify its op. Tables
  * maintained by applyTx/overwritePartitions with a key-derived
  * partition satisfy both by construction. Additive schema evolution
  * between the versions is fine: both sides read with the NEWER
  * version's schema (old files null-fill appended columns).
  *
  * Output: the key columns, the data columns (post-image for
  * insert/update, pre-image for delete), and `_op` ∈
  * {insert, update, delete}. Rows rewritten with identical values
  * (partition co-residents of a real change) are filtered out by a
  * null-safe comparison of every data column.
  */
object ChangeFeed {

  val OpCol = "_op"

  def between(
      spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long, keys: Seq[String]): DataFrame = {
    require(fromVersion < toVersion,
      s"changeFeed: fromVersion $fromVersion must precede toVersion $toVersion")
    require(keys.nonEmpty, "changeFeed: no key columns given")
    val from = TxTable.snapshot(spark, root, fromVersion)
    val to = TxTable.snapshot(spark, root, toVersion)
    val schema = to.schema
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"changeFeed: key column $k not in table schema"))

    val fromPaths = from.entries.map(_.relPath).toSet
    val toPaths = to.entries.map(_.relPath).toSet
    // both sides read under the NEWER schema; the OLD side's files may
    // predate renames the newer side's alias map no longer carries
    // (a rewrite between the versions localizes and clears it), so the
    // old side reads under the UNION of both alias maps
    val toNames = schema.fieldNames.toSet
    val oldAliases = (from.aliases.filter(kv => toNames(kv._1)).toSeq ++
      to.aliases.toSeq).groupBy(_._1)
      .map { case (k, vs) => k -> vs.flatMap(_._2).distinct }
    val oldView = to.copy(aliases = oldAliases)
    // each side's files read with its OWN snapshot's position deletes
    // applied: a row a merge-on-read DELETE had already removed at
    // `fromVersion` is not an old image, and one removed at
    // `toVersion` is not a new image.
    // immutable files ⇒ the manifest diff carries all FILE-level
    // change; the DV diff below carries the row-level remainder
    var oldSide = MergeOnRead.mergedRead(spark, root,
      oldView.copy(dvs = from.dvs),
      from.entries.filterNot(e => toPaths(e.relPath)))
    var newSide = MergeOnRead.mergedRead(spark, root, to,
      to.entries.filterNot(e => fromPaths(e.relPath)))

    // files present in BOTH versions change rows only through the
    // position-delete delta: positions deleted in `to` but not `from`
    // are old images (deletes); positions deleted in `from` but not
    // `to` are new images (resurrections — RESTORE across a DV
    // version). Only the files the delta actually names are read —
    // O(changed data), like the file diff.
    if (from.dvs != to.dvs) {
      val dvF = MergeOnRead.dvFrame(spark, root, from.dvs)
      val dvT = MergeOnRead.dvFrame(spark, root, to.dvs)
      val addedDel = dvT.except(dvF)
      val removedDel = dvF.except(dvT)
      val touchedKeys = addedDel.union(removedDel)
        .select("file_key").distinct().collect().map(_.getString(0)).toSet
      val touched = from.entries.filter(e => toPaths(e.relPath) &&
        touchedKeys.contains(
          MergeOnRead.fileKey(TxTable.entryPath(root, e.relPath))))
      if (touched.nonEmpty) {
        oldSide = oldSide.union(
          MergeOnRead.mergedRowsAt(spark, root, oldView, touched, addedDel))
        newSide = newSide.union(
          MergeOnRead.mergedRowsAt(spark, root, oldView, touched, removedDel))
      }
    }
    val oldRows = oldSide.withColumn("__cf_old", lit(true)).as("o")
    val newRows = newSide.withColumn("__cf_new", lit(true)).as("n")

    val dataCols = schema.fieldNames.toSeq.filterNot(keys.contains)
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val hasOld = col("o.__cf_old").isNotNull
    val hasNew = col("n.__cf_new").isNotNull
    val differs = dataCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .foldLeft(lit(false))(_ || _)

    oldRows.join(newRows, joinCond, "full_outer")
      .withColumn(OpCol,
        when(hasNew && !hasOld, lit("insert"))
          .when(hasOld && !hasNew, lit("delete"))
          .otherwise(lit("update")))
      // a rewritten-but-identical row is not a change
      .where(!hasOld || !hasNew || differs)
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
          dataCols.map(c =>
            when(col(OpCol) === "delete", col(s"o.$c"))
              .otherwise(col(s"n.$c")).as(c)) :+
          col(OpCol): _*)
  }
}
