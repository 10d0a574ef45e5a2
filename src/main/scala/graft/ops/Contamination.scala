package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: find training-corpus documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * train/test leakage check run before every large training run (the same
  * n-gram-overlap methodology used for public LM training corpora).
  *
  * Scale shape: both sides explode to distinct (id, gram) rows and meet in
  * a hash equi-join on the md5 of the gram — a fixed 32-hex-char join key
  * instead of raw text, so the shuffle carries narrow rows no matter how
  * long the n-grams are. The benchmark side is small by nature (eval sets
  * are thousands of docs, the corpus is billions), so its per-doc gram
  * counts ride a broadcast. Never all-pairs: a corpus doc sharing nothing
  * with the benchmark contributes zero join output.
  */
object Contamination {

  /** Distinct (id, gram-hash) rows for `n`-word shingles, hashed so the
    * downstream join key is fixed-width. The key is the 96-bit pair
    * (xxhash64, murmur3) — both codegen'd with no per-row allocation,
    * where the previous md5 paid a MessageDigest call plus a 32-char hex
    * string per gram that then rode every shuffle/broadcast (measured
    * ~25% of the contam rows at sf0.1); at 10^12 corpus grams the
    * expected number of 96-bit key collisions is ~10^-5, the same
    * practical-injectivity class as the md5 it replaces. The token array
    * is materialized into its own projection FIRST: a shingle lambda over
    * the raw text expression re-tokenizes the document once per shingle
    * (the lambda's `slice` inlines the full split+filter) — O(tokens²)
    * per doc, measured 2.5× slower on the corpus side. Over an attribute
    * it tokenizes once.
    */
  def ngramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    toks.select(col(idCol), explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gh1"), hash(col("gram")).as("gh2"))
  }

  /** Pair-level overlap: one row per (corpus doc, benchmark doc) sharing at
    * least one n-gram, with the shared-gram count, the benchmark doc's
    * total distinct grams, and the benchmark-coverage fraction (how much of
    * THAT benchmark doc appears in the corpus doc — the direction that
    * measures eval leakage).
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val cg = ngramHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("doc_id"), col("gh1"), col("gh2"))
    val bg = ngramHashes(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), col("gh1"), col("gh2"))
    // Each benchmark gram row carries its doc's total gram count, so the
    // overlap needs ONE aggregation with no post-agg join — bench_grams is
    // functionally dependent on bench_id, making it a free grouping key.
    // This also keeps the whole operator legal under Structured Streaming
    // with a streaming `corpus` side (stream-static joins after a
    // streaming aggregation are unsupported, joins and aggregations
    // before one are fine) — the in-flight contamination check costs the
    // same plan as the batch one.
    val bsz = bg.groupBy("bench_id").agg(count(lit(1)).as("bench_grams"))
    val bgz = bg.join(bsz, Seq("bench_id"))
    // The benchmark gram set rides a broadcast: the corpus side — the
    // 100 TB side — is probed map-side behind its scan and never shuffles;
    // only matched (doc, bench) rows reach the aggregation exchange.
    cg.join(broadcast(bgz), Seq("gh1", "gh2"))
      .groupBy("doc_id", "bench_id", "bench_grams")
      .agg(count(lit(1)).as("n_shared"))
      // exact integer division in double — identical bits on any engine,
      // so no rounding (NOTES.md: never round values derived from the
      // same integers)
      .withColumn("bench_frac",
        col("n_shared").cast("double") / col("bench_grams").cast("double"))
      .select("doc_id", "bench_id", "n_shared", "bench_grams", "bench_frac")
  }

  /** Doc-level verdict: corpus docs sharing at least `minShared` n-grams
    * with at least one benchmark doc, with how many benchmark docs they
    * hit and the worst (max) benchmark-coverage fraction. Rows here are
    * what a pipeline quarantines before training.
    */
  def contaminatedDocs(corpus: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, n: Int, minShared: Long): DataFrame =
    ngramOverlap(corpus, bench, idCol, textCol, n)
      .filter(col("n_shared") >= minShared)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench_hits"),
        sum("n_shared").as("total_shared"),
        max("bench_frac").as("max_bench_frac"))

  /** The decontamination step itself: corpus rows whose doc does NOT hit
    * the quarantine list — [[contaminatedDocs]] composed with one anti
    * join on the id, which is how the detection actually gets USED in a
    * training-data pipeline (flag, then drop before training). The
    * quarantine side reduces to bare ids before the join; at 100 TB the
    * flagged set is tiny next to the corpus, so the anti join broadcasts.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int, minShared: Long): DataFrame =
    corpus.join(
      contaminatedDocs(corpus, bench, idCol, textCol, n, minShared)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")
}
