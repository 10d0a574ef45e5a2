package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived sf1 fixture for the bench's data-heavy lane (VERDICT r10 #3):
  * a 10× replicate-and-perturb of the sf0.1 tables, written once to a
  * cache directory and reused across invocations. At sf0.1 ~140 of 193
  * bench queries run under 0.7 s, where fixed per-stage overhead
  * dominates and ±20% session drift swamps any plan signal; the sf1 lane
  * re-times the data-dominated cohort at ~6M lineitem rows, where a plan
  * regression is visible above the noise floor.
  *
  * Replication rules (same discipline as [[ScaleBench]]'s derived
  * corpora — testdata is read-only, derived copies live under /tmp):
  *  - Every table's keys offset per copy so FK joins stay consistent
  *    WITHIN a copy and never collide across copies: order keys +c·10⁸,
  *    customer/supplier/part keys +c·10⁶, doc/vec ids +c·10⁷, event ids
  *    +c·10⁸, user ids +c·10⁶. nation/region are fixed dims — copied 1×.
  *  - `documents.text`: copy c > 0 suffixes EVERY token with "q<c>", so
  *    copy vocabularies are disjoint — each copy reproduces the base
  *    corpus's internal near-dup structure exactly while cross-copy
  *    near-dup pairs are impossible. Naive replication would add m²
  *    cross-copy pairs per base doc and the dedup cohort would measure
  *    genuine output blowup, not operator cost.
  *  - `embeddings.embedding`: copy c > 0 perturbs one rotated element
  *    (the [[ScaleBench]] rule) so vectors stay distinct across copies
  *    (no degenerate all-tied top-k) while each copy's neighborhood
  *    structure is preserved. Threshold probe sets (`vec_id < 8`) keep
  *    their base-corpus size — copy offsets are far above the
  *    thresholds, so they land only in copy 0. Doc-id RESIDUE filters
  *    (the `% 97` benchmark slices in the contamination / pipeline
  *    queries) do NOT stay base-sized: every residue class mod 97 is
  *    populated in the base id range, so each copy contributes ~1/97 of
  *    its docs whatever the offset's residue — the benchmark side grows
  *    ~10× alongside the corpus. That is a property of the lane, not a
  *    bug: the same query code must run unmodified at both SFs, and a
  *    both-sides-grow point is still a valid round-over-round
  *    comparison (the FIXED-bench scaling claim is measured separately
  *    by ScaleBench's `contam_*` rows, whose bench side is pinned to
  *    the base corpus).
  */
object Sf1Corpus {

  val Copies = 10

  /** Marker content ties the cache to its source dir + generation rules;
    * bumping the version invalidates stale caches after a rule change.
    */
  private def markerContent(srcDir: String) = s"v2 src=$srcDir copies=$Copies"

  /** Build the sf1 fixture under `outDir` unless a matching cache exists.
    * Synthesis runs in the CALLER's session (size it for the write — the
    * bench uses its wide sf1 session) and costs ~1 min once.
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val marker = java.nio.file.Paths.get(outDir, "_GRAFT_SF1_OK")
    val want = markerContent(srcDir)
    val have =
      try new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
      catch { case _: Throwable => "" }
    if (have == want) return
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(outDir), true): Unit

    def base(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    val copies = explode(sequence(lit(0), lit(Copies - 1))).as("copy")
    def write(t: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    // key-offset replication that PRESERVES the source column order
    // (some queries select positionally-shaped schemas)
    def replicatedDf(b: DataFrame, offsets: Map[String, Long],
                     extra: Map[String, org.apache.spark.sql.Column]): DataFrame =
      b.select((b.columns.map(col) :+ copies): _*)
        .select(b.columns.map { c =>
          extra.get(c)
            .orElse(offsets.get(c).map(off => col(c) + col("copy") * off))
            .getOrElse(col(c)).as(c)
        }: _*)
    def replicated(t: String, offsets: Map[String, Long],
                   extra: Map[String, org.apache.spark.sql.Column] = Map.empty): Unit =
      write(t, replicatedDf(base(t), offsets, extra))

    write("region", base("region"))
    write("nation", base("nation"))
    replicated("customer", Map("c_custkey" -> 1000000L))
    replicated("supplier", Map("s_suppkey" -> 1000000L))
    replicated("part", Map("p_partkey" -> 1000000L))
    replicated("orders", Map("o_orderkey" -> 100000000L, "o_custkey" -> 1000000L))
    replicated("lineitem", Map("l_orderkey" -> 100000000L,
      "l_partkey" -> 1000000L, "l_suppkey" -> 1000000L))
    // events goes through Tables.events, NOT a raw read: the source ts
    // column physically varies across driver drops (TIMESTAMP(NANOS)
    // needs spark.sql.legacy.parquet.nanosAsLong; TIMESTAMP_NTZ needs a
    // cast) and Tables.events is the single shared normalization. A raw
    // read here would crash the fixture build on a nanos drop — the
    // exact failure Tables.events exists to absorb (self-review catch).
    write("events", replicatedDf(Tables.events(spark, srcDir),
      Map("event_id" -> 100000000L, "user_id" -> 1000000L), Map.empty))
    replicated("documents", Map("doc_id" -> 10000000L),
      extra = Map("text" ->
        when(col("copy") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("q"), col("copy"))), " "))))
    replicated("embeddings", Map("vec_id" -> 10000000L),
      extra = Map("embedding" ->
        when(col("copy") === 0, col("embedding")).otherwise(
          transform(col("embedding"),
            (x, i) => x + ((col("copy") % 7) + 1).cast("float") *
              when(i === col("copy") % 8, lit(0.01f)).otherwise(lit(0f))))))

    java.nio.file.Files.write(marker, want.getBytes("UTF-8")): Unit
  }

  /** The sf1 graded cohort: the data-dominated batch queries (multi-second
    * at sf0.1, cost that grows with rows — dedup/graph/ANN/contamination/
    * capstone plus the heavy TPC-H forms). Streaming queries are excluded
    * by design: their cost is fixed micro-batch overhead, measured in the
    * main lane's dedicated streaming split. Names must exist in
    * `SparkEntry.queries`.
    */
  val Cohort: Seq[String] = Seq(
    // TPC-H heavy forms
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_topk_revenue",
    "q5_nation_revenue", "q9_product_profit", "q16_parts_supplier_counts",
    "q17_small_qty", "q18_large_orders", "q20_excess_stock_suppliers",
    "q21_sole_late_supplier",
    // core relational / ETL ops over lineitem-scale inputs
    "check_lineitem", "cdc_table_diff", "j1_anti_join_bloom",
    "u1_update_join", "w2_window_funcs", "profile_corr",
    // dedup family
    "dedup_exact", "dedup_lines", "dedup_jaccard", "dedup_minhash_lsh",
    "dedup_pipeline", "dedup_cluster_keep_best", "dedup_span_keep_first",
    "dedup_winnow_pairs", "dedup_simhash_pairs", "dedup_shingle_jaccard",
    "dedup_lsh_index_probe",
    // contamination
    "contam_pairs", "contam_docs", "contam_decontaminate",
    // text analysis
    "text_tfidf",
    // ANN
    "ann_recall", "ann_ivf_batch_topk", "ann_pq_topk",
    // graph (the _indexed row pays iterations only — its gap to
    // graph_pagerank measures what the standing index amortizes; the
    // _delta row adds the query-time fresh-edge union's overhead on
    // top of the indexed iterations)
    "graph_pagerank", "graph_pagerank_indexed", "graph_pagerank_delta",
    "graph_bfs_levels", "graph_bfs_indexed", "graph_triangles",
    // event analytics (batch forms)
    "ev_sessionize", "ev_session_overlap", "ev_asof_purchase",
    // multimodal
    "mm_phash_pairs",
    // capstone pipelines
    "pipeline_end_to_end", "prep_pipeline")
}
