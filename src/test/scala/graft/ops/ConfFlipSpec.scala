package graft.ops

import java.util.concurrent.CountDownLatch
import graft.SparkSpec

/** Pins the cross-helper conf-pin exclusion [[ConfFlip]] exists for: a
  * thread inside one pinned window (e.g. a stream start holding the
  * shuffle-partition pin) must never observe another helper's transient
  * conf value (e.g. a batch checkpoint's AQE-off window) — previously
  * each helper had its own private monitor, so the two windows could
  * overlap and capture each other's transient state.
  */
class ConfFlipSpec extends SparkSpec {

  test("two pinned windows are mutually exclusive, whatever keys they pin") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val baseline = spark.conf.get(aqeKey)
    val insideFirst = new CountDownLatch(1)
    val observed = new java.util.concurrent.atomic.AtomicReference[String]
    val t1 = new Thread(() =>
      ConfFlip.withConf(spark, aqeKey, "false") {
        insideFirst.countDown()
        Thread.sleep(150) // hold the window open while t2 tries to pin
      })
    val t2 = new Thread(() => {
      insideFirst.await()
      // a DIFFERENT key's pin: with per-helper monitors this would run
      // concurrently and see t1's transient aqe=false; with the shared
      // lock it blocks until t1's window restores the baseline
      ConfFlip.withConf(spark, "spark.sql.shuffle.partitions", "7") {
        observed.set(spark.conf.get(aqeKey))
      }
    })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(observed.get() == baseline,
      "a pinned window observed another pin's transient conf value")
    assert(spark.conf.get(aqeKey) == baseline)
  }

  test("checkpointWithLayout pins capture only — the job runs with the lock free") {
    import java.util.concurrent.TimeUnit
    import org.apache.spark.sql.functions.{col, udf}
    // a task-gated build: the udf signals when the checkpoint JOB is
    // running, then blocks until released — while it blocks, the conf
    // pin must be acquirable (the round-11 narrowing: a lazy checkpoint
    // freezes the DAG at call time, so only capture needs the lock; the
    // old full-body pin would hold the lock for this whole job and the
    // assertion below would time out)
    ConfFlipGate.reset()
    val slow = udf((x: Long) => {
      ConfFlipGate.started.countDown()
      ConfFlipGate.release.await(20, TimeUnit.SECONDS)
      x
    })
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      CacheControl.checkpointWithLayout(spark)(
        spark.range(0, 2, 1, 1).select(slow(col("id")).as("v")))
    }
    assert(ConfFlipGate.started.await(30, TimeUnit.SECONDS),
      "checkpoint job never started")
    val pinAcquired = new CountDownLatch(1)
    val t = new Thread(() =>
      ConfFlip.withConf(spark, "graft.test.confflip.narrow", "1") {
        pinAcquired.countDown()
      })
    t.start()
    val acquired = pinAcquired.await(5, TimeUnit.SECONDS)
    ConfFlipGate.release.countDown() // always unblock the job
    t.join()
    val df = Await.result(fut, scala.concurrent.duration.Duration(60, "s"))
    assert(acquired,
      "conf pin blocked behind a RUNNING checkpoint job — the lock must cover capture only")
    assert(df.count() == 2)
    CacheControl.release(df)
  }

  test("restore runs on the throwing path and unset keys restore to unset") {
    val key = "graft.test.confflip.ephemeral"
    assert(spark.conf.getOption(key).isEmpty)
    intercept[RuntimeException] {
      ConfFlip.withConf(spark, key, "x") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(key).isEmpty, "unset key must restore to unset")
  }
}

/** Task-side gate for the capture-only-pin test: executor threads run in
  * this JVM (local mode), so static latches coordinate driver and task.
  */
object ConfFlipGate {
  @volatile var started: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    started = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
}
