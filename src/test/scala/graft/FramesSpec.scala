package graft

import org.apache.spark.storage.StorageLevel

/** The deterministic cache-release listener is load-bearing (every
  * prefix/guard/containment operator leans on it) — pin its contract
  * directly: frames stay cached through the consuming action and are
  * unpersisted right after it.
  */
class FramesSpec extends SparkSuite {

  private def eventually[A](assertion: => A, timeoutMs: Long = 20000): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Either[Throwable, A] = Left(new AssertionError("not attempted"))
    while (System.currentTimeMillis() < deadline) {
      try return assertion
      catch { case t: org.scalatest.exceptions.TestFailedException =>
        last = Left(t); Thread.sleep(100) }
    }
    last.fold(throw _, identity)
  }

  test("releaseAfterNextAction unpersists exactly after the next completed action") {
    val df = spark.range(1000).toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    df.count()                                           // materialize the cache
    assert(df.storageLevel !== StorageLevel.NONE)
    graft.core.Frames.releaseAfterNextAction(spark, df)
    // no action since registration -> still cached (listener is one-shot,
    // armed but not fired)
    Thread.sleep(300)
    assert(df.storageLevel !== StorageLevel.NONE)
    spark.range(10).count()                              // ANY next action fires it
    eventually { assert(df.storageLevel === StorageLevel.NONE) }
  }

  test("an action completed just before registration cannot fire the release") {
    val df = spark.range(800).toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    // An eager "probe" action that completes immediately before
    // registration — its async listener event must NOT be delivered to the
    // new listener (Frames drains the bus before registering).
    spark.range(100).count()
    graft.core.Frames.releaseAfterNextAction(spark, df)
    Thread.sleep(500) // window for a stale event to (wrongly) deliver
    assert(df.storageLevel !== StorageLevel.NONE)
    spark.range(10).count() // first post-registration action fires it
    eventually { assert(df.storageLevel === StorageLevel.NONE) }
  }

  test("release is one-shot: later persists of the same plan are untouched") {
    val df = spark.range(500).toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    graft.core.Frames.releaseAfterNextAction(spark, df)
    spark.range(10).count()
    eventually { assert(df.storageLevel === StorageLevel.NONE) }
    // re-persist: the already-fired (unregistered) listener must not touch it
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    spark.range(10).count()
    Thread.sleep(500)
    assert(df.storageLevel !== StorageLevel.NONE)
    df.unpersist()
  }
}
