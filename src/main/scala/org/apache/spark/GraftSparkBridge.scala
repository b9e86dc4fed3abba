package org.apache.spark

/** `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty` are
  * private[spark]; graft's metric harvest
  * ([[graft.tools.RunMetrics]]) needs a synchronous flush because
  * `QueryExecutionListener`s dispatch on the async listener bus — a
  * caller reading observed metrics right after an action would race
  * the delivery. The standard out-of-tree bridge pattern (same as
  * `org.apache.spark.sql.GraftColumnBridge`).
  */
object GraftSparkBridge {
  /** Block until every queued listener event has been delivered (or
    * the timeout passes — harvest then sees whatever arrived; metrics
    * are diagnostics, never results).
    */
  def flushListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
