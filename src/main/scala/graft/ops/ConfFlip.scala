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
  * COST OF THE LOCK: the lock is held for the full `body`. Both callers
  * keep that window SHORT by construction:
  * [[CacheControl.checkpointWithLayout]] pins only the plan CAPTURE
  * (lazy checkpoint — the DAG and recorded layout freeze at call time;
  * the materialization job runs with the lock released — the narrowing
  * ADVICE r10 asked about, landed round 11), and `withStatePartitions`
  * pins only `start()`'s conf clone, which is inherently brief. A
  * delayed caller therefore waits for plan capture — planning plus any
  * broadcast materialization `execute()` pulls in on join-heavy plans
  * (ADVICE r11) — never for the checkpoint job itself. Correctness remains the point: a stream start that
  * plans under a transient AQE-off / wrong-partition-count value
  * freezes the wrong state layout into its checkpoint PERMANENTLY,
  * while a delayed start merely waits.
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
