package graft.ops

import org.apache.spark.sql.SparkSession

/** The ONE lock for transient session-conf pins.
  *
  * Two helpers flip session-global SQL conf for a bounded window:
  * [[CacheControl.checkpointWithLayout]] (AQE off while a layout-bearing
  * plan is captured) and
  * [[graft.streaming.StreamOps.withStatePartitions]] (shuffle-partition
  * count pinned while a stateful stream starts and clones the conf).
  * Each used to serialize on its own private monitor, which closed the
  * flip-vs-flip restore race but left a CROSS-helper exposure: a batch
  * checkpoint flipping AQE while a stream start holds the partition pin
  * (or vice versa) plans under the other helper's transient value — and
  * a stream start that captures a transient shuffle-partition count
  * freezes the wrong state layout into its checkpoint PERMANENTLY.
  *
  * Routing every pin through this single guarded utility makes any two
  * conf-pinned windows mutually exclusive, whichever helpers they come
  * from.
  *
  * COST OF THE LOCK (deliberate trade, ADVICE r10): the lock is held for
  * the full `body` — for `checkpointWithLayout` that is an entire Spark
  * checkpoint JOB, not microseconds, so an unrelated stream `start()`
  * can block for the duration of a large AQE-off plan capture (under the
  * pre-r10 per-helper monitors the two never blocked each other — and
  * could therefore corrupt each other's captured conf). Correctness is
  * the point: a stream start that plans under a transient AQE-off /
  * wrong-partition-count value freezes the wrong state layout into its
  * checkpoint PERMANENTLY, while a delayed start merely waits. Narrowing
  * the window (capture the plan under the lock, run the job outside it)
  * is possible if stream-start latency ever matters; nothing in this
  * repo starts streams concurrently with large captures, so the simple
  * full-body lock stands.
  *
  * Unwrapped planning on OTHER threads is still exposed by construction
  * — session conf is process-global state — so the session-wide rule
  * stands: anything that plans against a session concurrently with
  * these helpers must either take the same pin or tolerate planning
  * under a transient value (documented at both call sites).
  */
object ConfFlip {

  private[this] val lock = new Object

  /** Run `body` with `key` set to `value` on `spark`'s session conf,
    * restoring the previous value (or unsetting, if the key was unset)
    * on every exit path. All pins serialize on one global lock so no
    * pinned window can observe — or capture as its restore target —
    * another pin's transient value.
    */
  def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A =
    lock.synchronized {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
}
