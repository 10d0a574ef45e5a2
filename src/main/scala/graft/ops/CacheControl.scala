package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic release for the eager-operator cache policy
  * (docs/SCALE.md §"Cache release policy").
  *
  * `Dataset.unpersist()` only removes CacheManager entries (`.cache()`)
  * — the blocks behind an eager `localCheckpoint()` are an RDD-level
  * persist that `unpersist()` does not touch, and are otherwise
  * reclaimed only when ContextCleaner garbage-collects the unreachable
  * RDD, which is nondeterministic. A long-running session (streaming
  * gate, job server) that wants its block-manager footprint bounded NOW
  * calls [[release]]: it drops both the cached plan (if any) and every
  * checkpoint RDD in the frame's plan. After release the frame must not
  * be used again — its data is gone and its lineage was truncated.
  */
object CacheControl {

  /** Eager `localCheckpoint()` that PRESERVES the plan's output
    * partitioning and ordering in the resulting LogicalRDD.
    *
    * Under AQE (the production default) the adaptive root reports
    * `UnknownPartitioning` at capture time, so a plain checkpoint
    * silently discards the layout an iterative operator paid an
    * exchange + sort to establish — every downstream consumer then
    * re-shuffles the pinned frame (observed: PageRank's per-iteration
    * contribution join re-exchanging the edge list the layout was
    * built FOR, in exactly the config the bench and the driver run).
    * Disabling AQE for just this one materialization makes the capture
    * exact; the consumers themselves still plan adaptively.
    *
    * `build` is a thunk: the frame must be PLANNED inside the window
    * (Spark plans lazily at first action, so any frame not yet
    * materialized qualifies — a frame that was already executed keeps
    * its cached adaptive plan and gains nothing). Everything planned
    * inside the window is non-adaptive — including, for the iterative
    * loops that pin EVERY round (connected components, BFS hops), the
    * round's own join+agg. That trade is deliberate: with both sides
    * pre-partitioned on the join key there is no shuffle stage for
    * AQE's skew split or coalescing to act on anyway, and the
    * non-adaptive round is the classic iterative shape. The conf flip
    * is also visible to UNRELATED planner threads in the session for
    * the window's duration; such a query is still correct, merely
    * planned without adaptation.
    *
    * Invocations serialize on THE shared conf-pin lock ([[ConfFlip]]):
    * the save/flip/restore of the session-global conf is otherwise racy
    * — two overlapping calls could capture each other's "false" as the
    * value to restore and leave AQE permanently disabled for the
    * session — and the lock is shared with every other conf-pinning
    * helper (notably [[graft.streaming.StreamOps.withStatePartitions]])
    * so a checkpoint here can never plan under, or be captured into, a
    * stream start's transient shuffle-partition pin.
    *
    * The pin covers CAPTURE only, not the materialization job (the
    * narrowing ADVICE r10 flagged as the option): a LAZY localCheckpoint
    * freezes the physical plan, its RDD DAG, and the recorded
    * outputPartitioning/outputOrdering at CALL time, and the checkpoint
    * job itself runs with the lock released. Capture is planning PLUS
    * any broadcast materialization the plan pulls in — `execute()` on a
    * join with a broadcast side blocks on the broadcast build (a collect
    * job inside doExecute), so on join-heavy plans the pinned window can
    * include those builds, not just milliseconds of planning (ADVICE
    * r11). Still strictly narrower than the old full-body lock: a stream
    * `start()` serializing on the same pin waits for capture, never for
    * the (typically much larger) checkpoint materialization job, and
    * concurrent conf changes cannot affect the already-frozen DAG
    * (pinned by ConfFlipSpec).
    */
  def checkpointWithLayout(spark: SparkSession)(build: => DataFrame): DataFrame = {
    val captured = ConfFlip.withConf(spark, "spark.sql.adaptive.enabled", "false") {
      build.localCheckpoint(eager = false)
    }
    captured.count(): Unit // materialize OUTSIDE the pin; DAG is frozen
    captured
  }

  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = true)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true): Unit
      case _ => ()
    }
  }
}
