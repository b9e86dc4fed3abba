package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the graft table format — register with
  * `spark.sql.extensions=graft.GraftExtensions`. Currently one rule:
  * [[graft.sources.ApplyDeletionVectors]], which makes SQL/DataFrame
  * reads of merge-on-read (position-delete-bearing) snapshots merge
  * their delete sets. Sessions without it fail loudly on such tables
  * instead of silently resurrecting deleted rows.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(session =>
      new graft.sources.ApplyDeletionVectors(session))
}
