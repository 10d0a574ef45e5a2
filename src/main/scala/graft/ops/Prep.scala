package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition a pipeline
  * actually ships — quality gate → cross-doc line dedup → exact dedup on
  * the cleaned text → benchmark-contamination quarantine → shard
  * assignment for the survivors. Each doc gets one disposition:
  * a failed quality rule, 'exact_dup', 'contaminated', or 'kept' with its
  * export shard.
  *
  * Stage order is the cost ladder: the quality gate is a pure scan-side
  * column filter and runs first so every later (shuffling) stage sees only
  * passing docs; line dedup and fingerprint dedup shuffle 16-byte hashes;
  * contamination probes a broadcast benchmark-gram set. Nothing here is
  * all-pairs, and each doc's text crosses the wire at most once (the line
  * shuffle) — the shapes that survive a 100 TB corpus.
  */
object Prep {

  def prepPipeline(docs: DataFrame, bench: DataFrame, idCol: String, textCol: String,
                   minTokens: Int, maxDup2Frac: Double,
                   minMeanTokenLen: Double, maxMeanTokenLen: Double,
                   minStopwordRatio: Double,
                   tokensPerLine: Int, contamN: Int, minShared: Long,
                   nShards: Int): DataFrame = {
    // EAGER quality frame: filtering `keep` on the LAZY qualityFilter
    // output lets predicate pushdown re-inline the quality expression
    // trees (tokenizer + O(n²) bigram lambdas) into a pre-projection
    // Filter — measured 12-14 s vs ~1 s at sf0.1 for evaluating the
    // projection ONCE. The checkpoint is the pushdown barrier: every
    // consumer below reads materialized booleans/strings.
    val qual = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minTokens, maxDup2Frac, minMeanTokenLen, maxMeanTokenLen, minStopwordRatio)
      .localCheckpoint()
    val passing = docs.join(qual.filter(col("keep")).select(col(idCol)), Seq(idCol))

    // line-dedup the passing docs; the CLEANED text is what dedup sees, so
    // two docs differing only in shared boilerplate collapse to one
    val cleaned = Dedup.dedupLines(passing, idCol, textCol, tokensPerLine)
    // clean_text is tokens joined by single spaces, so the token
    // fingerprint reduces to md5(clean_text) — the oracle mirrors that
    val fps = cleaned.select(col(idCol), md5(col("clean_text")).as("fp"))
    val keep = fps.groupBy("fp").agg(min(col(idCol)).as("keep_id"))
    val dedup = fps.join(keep, Seq("fp")).select(col(idCol), col("keep_id"))

    val contam = Contamination
      .contaminatedDocs(passing, bench, idCol, textCol, contamN, minShared)
      .select(col(idCol), lit(true).as("__contam"))

    val status = when(col("reason") =!= "ok", col("reason"))
      .when(col(idCol) =!= col("keep_id"), "exact_dup")
      .when(col("__contam").isNotNull, "contaminated")
      .otherwise("kept")
    val out = qual.select(col(idCol), col("reason"))
      .join(dedup, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
      .select(col(idCol), status.as("status"),
        when(status === "kept", Sampling.shardColumn(col(idCol), nShards))
          .otherwise(lit(null).cast("int")).as("shard"))
      .localCheckpoint() // one disposition row per doc — compact
    CacheControl.release(qual)
    out
  }
}
