package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Cdc

/** CDC protocol exercised end-to-end on the `events` table treated as
  * a change log: lsn = event_id (monotone), op derived from
  * event_type (error→delete, signup→insert, else update), key =
  * user_id, payload = value.
  */
object CdcQueries {

  def all: Seq[Q] = Seq(cdcApply)

  private[queries] def changeFeed(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id"),
      col("value").as("amount"),
      col("event_id").as("lsn"),
      when(col("event_type") === "error", Cdc.Op.Delete)
        .when(col("event_type") === "signup", Cdc.Op.Insert)
        .otherwise(Cdc.Op.Update).as("op"))

  /** Two-phase incremental apply (C1–C5): snapshot from the first half
    * of the log, then the `(mid, max]` range applied incrementally.
    * Sequential range application must equal one latest-per-key pass
    * over the whole log — which is exactly the oracle's window query.
    */
  val cdcApply: Q = Q(
    "q_cdc_apply",
    """SELECT user_id, amount, last_lsn FROM (
      |  SELECT user_id, value AS amount, event_id AS last_lsn,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
      |    CASE event_type WHEN 'error' THEN 1 WHEN 'signup' THEN 2 ELSE 4 END AS op
      |  FROM events) t
      |WHERE rn = 1 AND op <> 1
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val feed = changeFeed(s, dir)
    val maxLsn = feed.agg(max(col("lsn"))).head.getLong(0)
    val mid = maxLsn / 2
    val keys = Seq("user_id")
    val data = Seq("amount")
    val snapshot = Cdc.apply(
      Cdc.emptyTarget(feed, keys, data),
      Cdc.range(feed, "lsn", Long.MinValue, mid), keys, data)
    Cdc.apply(snapshot, Cdc.range(feed, "lsn", mid, maxLsn), keys, data)
      .orderBy(col("user_id"))
  }
}
