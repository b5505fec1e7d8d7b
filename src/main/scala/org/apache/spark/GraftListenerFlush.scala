package org.apache.spark

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; the bench's
  * per-query shuffle-byte attribution needs a deterministic flush
  * between queries (listener events post asynchronously — without the
  * barrier a query's last stages would be credited to the NEXT query).
  * Same one-file bridge pattern as
  * [[org.apache.spark.sql.GraftColumn]]: no Spark internals are
  * copied, only a visibility hop onto a stable test-facing API. */
object GraftListenerFlush {
  /** Block until every queued listener event has been delivered (or
    * the timeout elapses — the bench treats a timeout as best-effort
    * attribution, never an error). */
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () }
}
