package graft.ops

import org.apache.spark.sql.DataFrame

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
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = true)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true): Unit
      case _ => ()
    }
  }
}
