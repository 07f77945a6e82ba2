package org.apache.spark

/** Bridge into `SparkContext.listenerBus` (private[spark]). Used by
  * `graft.core.Frames` to drain in-flight listener events before arming the
  * one-shot cache-release listener: QueryExecutionListener callbacks are
  * delivered asynchronously, so an action that completed JUST BEFORE
  * registration could otherwise deliver its `onSuccess` to the new listener
  * and release the caches before the query they were persisted for runs.
  */
object GraftSparkShim {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
