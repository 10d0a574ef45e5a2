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

  test("restore runs on the throwing path and unset keys restore to unset") {
    val key = "graft.test.confflip.ephemeral"
    assert(spark.conf.getOption(key).isEmpty)
    intercept[RuntimeException] {
      ConfFlip.withConf(spark, key, "x") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(key).isEmpty, "unset key must restore to unset")
  }
}
