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

  /** The CAPSTONE corpus-curation dataflow (quality gate → cross-doc line
    * dedup → verbatim span removal keep-first → near-dup clustering with
    * quality-aware survivor selection → benchmark decontamination → split
    * assignment + sequence packing), one disposition row per input doc.
    * Shared verbatim by the oracle-gated `pipeline_end_to_end` query and
    * by [[graft.jobs.CorpusPipelineJob]] (which feeds `phase` with the
    * job tracker so every stage lands in the status row's phase trail —
    * the reference's Loading jobs stamped 'mapping'/'finalize' the same
    * way, `lib/etl/loading.rb:135,161,204`).
    *
    * EAGER + release: stage checkpoints (each operator's materialized
    * result) are released once the compact disposition frame
    * materializes — one persistent entry per call (cache policy).
    */
  def corpusPipeline(corpus: DataFrame, bench: DataFrame,
                     idCol: String, textCol: String,
                     phase: String => Unit = _ => ()): DataFrame = {
    phase("quality_gate")
    // EAGER: filtering the lazy quality frame would push the O(n²)
    // quality expression trees into a pre-projection Filter (see
    // prepPipeline); the checkpoint evaluates them once.
    val quality = TextAnalysis.qualityFilter(corpus, idCol, textCol,
      minTokens = 30, maxDup2Frac = 0.08, minMeanTokenLen = 3.8,
      maxMeanTokenLen = 5.2, minStopwordRatio = 0.02)
      .select(col(idCol), col("reason"))
      .localCheckpoint()
    val qualOk = corpus.join(
      quality.filter(col("reason") === "ok").select(idCol), Seq(idCol))
    phase("line_dedup")
    val lined = Dedup.dedupLines(qualOk, idCol, textCol, tokensPerLine = 8)
    val linedOk = lined.filter(col("n_kept") > 0)
      .select(col(idCol), col("clean_text"))
    phase("span_removal")
    val spanned = Dedup.removeDuplicateSpans(linedOk, idCol, "clean_text",
      n = 3, keepFirst = true)
    val spannedOk = spanned.filter(col("n_kept") > 0)
      .select(col(idCol), col("n_kept").as("n_tokens"), col("clean_text"))
    phase("near_dup_cluster")
    val pairs = Dedup.jaccardPairs(spannedOk, idCol, "clean_text",
      minJaccard = 0.5).select("id1", "id2")
    val best = Dedup.clusterKeepBest(spannedOk, idCol, pairs, col("n_tokens"))
    val keptBest = spannedOk.join(
      best.filter(col("kept")).select(col("id").as(idCol)), Seq(idCol))
    phase("decontaminate")
    val surv = Contamination.decontaminate(
      keptBest.withColumnRenamed("clean_text", textCol), bench,
      idCol, textCol, n = 3, minShared = 2L)
    phase("split_pack")
    val packed = Sampling.packChunks(
      surv.select(col(idCol), col("n_tokens")), idCol, "n_tokens",
      nShards = 8, chunkTokens = 256L)
      .withColumn("split",
        Sampling.splitColumn(col(idCol), Sampling.DefaultSplits))
    val out = quality
      .join(lined.select(col(idCol), col("n_kept").as("__lk")),
        Seq(idCol), "left")
      .join(spanned.select(col(idCol), col("n_kept").as("__sk")),
        Seq(idCol), "left")
      .join(best.select(col("id").as(idCol), col("kept").as("__kb")),
        Seq(idCol), "left")
      .join(packed, Seq(idCol), "left")
      .withColumn("status",
        when(col("reason") =!= "ok", col("reason"))
          .when(col("__lk") === 0, lit("boilerplate"))
          .when(col("__sk") === 0, lit("span_empty"))
          .when(!col("__kb"), lit("near_dup"))
          .when(col("shard").isNull, lit("contaminated"))
          .otherwise(lit("kept")))
      .select(col(idCol), col("status"), col("split"), col("shard"),
        col("n_tokens"), col("start_tok"), col("chunk_first"),
        col("chunk_last"))
      .orderBy(idCol).localCheckpoint()
    Seq(quality, lined, spanned, pairs, best, surv, packed)
      .foreach(CacheControl.release)
    out
  }

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
