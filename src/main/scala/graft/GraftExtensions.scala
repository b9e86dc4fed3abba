package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the graft table format — register with
  * `spark.sql.extensions=graft.GraftExtensions`. Two rules:
  * [[graft.sources.ApplyDeletionVectors]] (resolution) makes
  * SQL/DataFrame reads of merge-on-read (position-delete-bearing)
  * snapshots merge their delete sets — sessions without it fail
  * loudly on such tables instead of silently resurrecting deleted
  * rows; [[graft.sources.MorDmlRuntimeFiltering]] (pre-CBO) gives
  * merge-on-read SQL DML (`WriteDelta`) runtime file pruning on the
  * layout key, so a trickle MERGE reads ∝ touched groups.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session =>
      new graft.sources.ApplyDeletionVectors(session))
    ext.injectPreCBORule(session =>
      new graft.sources.MorDmlRuntimeFiltering(session))
  }
}
