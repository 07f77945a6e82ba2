package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deterministic release of operator-internal persisted frames.
  *
  * Operators like the prefix-filtered similarity joins persist a shared
  * intermediate (the shingle / token-count frame) that several stages of ONE
  * returned query consume. The persist must outlive the operator call (the
  * result is lazy), but without a release path every invocation leaks a
  * cached RDD for the session lifetime — dead copies accumulate, evict live
  * working sets, and visibly slow later queries in the same session.
  *
  * [[releaseAfterNextAction]] unpersists the frames as soon as the NEXT
  * action on the session completes. For the intended call pattern (build
  * query → run one action over it) that is exactly the action that consumed
  * them. If an unrelated action fires first, the frames are released early —
  * which is CORRECT (persist is a hint; consumers recompute), just slower.
  * This trade keeps operators fully lazy so plans stay inspectable
  * (`explain`, plan-shape specs) while bounding cache lifetime to one query.
  *
  * Callers that run eager actions INSIDE an operator (e.g. the skew-guard
  * df probe) must register AFTER those actions, or the probe itself would
  * trigger the release.
  *
  * Registration is race-safe against those probes: listener events are
  * delivered asynchronously, so a probe that completed just before
  * registration could still deliver its `onSuccess` to the new listener —
  * releasing the frames before the real query runs (correct but slow: the
  * consumer silently recomputes) and, with no later action, leaking the
  * listener for the session lifetime. [[releaseAfterNextAction]] therefore
  * drains the listener bus BEFORE registering, so only actions that start
  * after registration can fire the release.
  */
object Frames {
  def releaseAfterNextAction(spark: SparkSession, frames: DataFrame*): Unit = {
    org.apache.spark.GraftSparkShim.drainListenerBus(spark.sparkContext)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        release()
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        release()
      private def release(): Unit = {
        frames.foreach(_.unpersist(blocking = false))
        spark.listenerManager.unregister(this)
      }
    }
    spark.listenerManager.register(listener)
  }
}
