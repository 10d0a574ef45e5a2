package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** North-star extension queries (SURVEY.md §7.3 + builder prompt): dedup,
  * similarity search, text analysis, event analytics, multimodal plumbing.
  * Oracle SQL is GENERATED from the same Scala constants the Spark plans
  * use (stopword lists, hash seeds, hyperplane weights), so parity holds by
  * construction.
  */
object ExtendedQueries {

  // DuckDB-side token list expression == TextAnalysis.tokens semantics.
  private val toksSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""
  private val subsSql =
    """list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'), x -> x <> '')"""

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** The symmetric customer↔supplier co-purchase edge list both graph
    * queries run on, built as ONE linear pipeline: join the order→customer
    * map into the lineitem scan and emit both directions with a single
    * explode, letting edgeLayout's one repartition+distinct dedup — no
    * pairs-level distinct shuffle and no union branch double-executing the
    * join (same edge SET either way, so the fixed-point hashes are
    * unchanged). No broadcast hint: at sf0.1 the orders projection sits
    * under the static broadcast threshold anyway, and at larger scale
    * factors a forced broadcast of a full fact-table projection is
    * exactly the OOM the planner's size check exists to prevent.
    */
  private def orderSupplierEdges(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + 1000000L).as("b"))
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** DuckDB double dot product with the same left-to-right fold as
    * Similarity.dot. */
  private def dotSql(a: String, b: String, dims: Int): String =
    s"list_sum(list_transform(range(1, ${dims + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def cosSql(a: String, b: String, dims: Int): String =
    s"${dotSql(a, b, dims)} / (sqrt(${dotSql(a, a, dims)}) * sqrt(${dotSql(b, b, dims)}))"

  /** Negated squared L2 distance over the same left-fold dots as
    * Similarity.L2Score: -((a·a + b·b) - 2·a·b), identical op order. */
  private def l2Sql(a: String, b: String, dims: Int): String =
    s"-((${dotSql(a, a, dims)} + ${dotSql(b, b, dims)}) - 2.0 * ${dotSql(a, b, dims)})"

  /** DuckDB dot against inlined literal ±1 hyperplane weights. */
  private def planeDotSql(v: String, weights: Seq[Double], dims: Int): String = {
    val lits = weights.map(w => if (w > 0) "1.0" else "-1.0").mkString(", ")
    s"list_sum(list_transform(range(1, ${dims + 1}), i -> CAST($v[i] AS DOUBLE) * ([$lits])[i]))"
  }

  /** Events with ns→µs truncation, matching Tables.events (Spark cannot
    * read TIMESTAMP(NANOS) parquet; both engines truncate to µs). */
  private val evSql =
    "(SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events) ev"

  // DuckDB-side language-ID score columns / argmax CASE == TextAnalysis
  // .languageId semantics (argmax over marker hits, first-language ties,
  // 'und' at zero); expects a `toks` column in scope.
  private val langScoresSql = TextAnalysis.LanguageMarkers.map { case (lang, ws) =>
    s"len(list_filter(toks, t -> t IN (${sqlList(ws)}))) AS s_$lang"
  }.mkString(",\n  ")
  private val langCaseSql = {
    val best = TextAnalysis.LanguageMarkers.map(m => s"s_${m._1}").mkString("greatest(", ", ", ")")
    TextAnalysis.LanguageMarkers.map { case (lang, _) =>
      s"WHEN s_$lang = $best AND s_$lang > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
  }

  /** DuckDB bucket-in-[0,4096) == Sampling.hashBucket: value of the first
    * 3 hex digits of md5(id); expects an `hh` md5-hex column in scope.
    */
  private val hashBucketSql = {
    def hx(i: Int) =
      s"(ascii(substr(hh, $i, 1)) - CASE WHEN substr(hh, $i, 1) >= 'a' THEN 87 ELSE 48 END)"
    s"(${hx(1)} * 256 + ${hx(2)} * 16 + ${hx(3)})"
  }

  /** DuckDB mirror of Similarity.quantizeInt8: symmetric per-vector int8
    * with floor(x+0.5) rounding (identical on both engines).
    */
  private def qzSql(v: String) =
    s"""list_transform(range(1, ${Dims + 1}),
       |      i -> CAST(floor(CAST($v[i] AS DOUBLE) /
       |             list_max(list_transform(range(1, ${Dims + 1}), j -> abs(CAST($v[j] AS DOUBLE))))
       |             * 127.0 + 0.5) AS INTEGER))""".stripMargin

  /** DuckDB mirror of Similarity.intDot (exact integer dot product). */
  private def idotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${Dims + 1}), i -> CAST($a[i] AS BIGINT) * CAST($b[i] AS BIGINT)))"

  private def bucketSql(v: String, planes: Int, dims: Int): String =
    (0 until planes).map { p =>
      s"CASE WHEN ${planeDotSql(v, Similarity.planeWeights(p, dims), dims)} >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")

  /** Stratified-sampling fractions shared by the Spark plan and the
    * generated oracle CASE.
    */
  private val StrataFractions = Seq("en" -> 0.1, "zh" -> 0.5)
  private val StrataDefault   = 0.25
  private val strataCaseSql =
    StrataFractions.map { case (k, f) => s"WHEN lang = '$k' THEN ${Sampling.threshold(f)}" }
      .mkString("CASE ", " ", s" ELSE ${Sampling.threshold(StrataDefault)} END")

  /** DuckDB list_reduce mirror of TextAnalysis.polyHash over a token-list
    * expression: fold (h·B + first-32-bits-of-md5(tok)) mod M left to
    * right, seeded with 0.
    */
  private def polyHashSql(listExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform($listExpr, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))),
       |    (h, v) -> (h * ${TextAnalysis.RollBase} + v) % ${TextAnalysis.RollMod})""".stripMargin

  /** Shared simhash-pairs CTE chain (docs filtered by `pred` → banded
    * candidate pairs with exact hamming in a final `pairs` CTE), reused by
    * `dedup_simhash_pairs` and the `dedup_clusters` connected-components
    * oracle so both derive from identical SQL.
    */
  private def simhashPairsCtes(pred: String): String = {
    val sums = (1 to 16).map(j =>
      s"sum(CASE WHEN substr(h, $j, 1) IN (${sqlList(Dedup.HighHexDigits)}) THEN 1 ELSE -1 END) AS s$j"
    ).mkString(", ")
    val bitsExpr = (1 to 16).map(j => s"CASE WHEN s$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    val bands = (0 until 4).map(b =>
      s"SELECT id, $b AS band, substr(simhash, ${b * 4 + 1}, 4) AS bh, simhash FROM sh"
    ).mkString(" UNION ALL ")
    val hamming = (1 to 16).map(j =>
      s"CASE WHEN substr(sh1, $j, 1) <> substr(sh2, $j, 1) THEN 1 ELSE 0 END"
    ).mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id AS id, md5(tok) AS h
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE $pred) d,
       |       UNNEST(d.toks) AS t(tok)),
       |s AS (SELECT id, $sums FROM toks GROUP BY id),
       |sh AS (SELECT id, $bitsExpr AS simhash FROM s),
       |bands AS ($bands),
       |cand AS (
       |  SELECT DISTINCT a.id AS id1, b.id AS id2, a.simhash AS sh1, b.simhash AS sh2
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
       |pairs AS (SELECT id1, id2, CAST($hamming AS BIGINT) AS hamming FROM cand)""".stripMargin
  }

  /** DuckDB CASE mirroring Sampling.splitColumn over a `bucket` column —
    * generated from the same cumulative thresholds the Spark plan uses.
    */
  private val splitCaseSql = {
    val names = Sampling.DefaultSplits.map(_._1)
    val cum = Sampling.DefaultSplits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(Sampling.threshold)
    names.zip(cum).init.map { case (n, hi) => s"WHEN bucket < $hi THEN '$n'" }
      .mkString("CASE ", " ", s" ELSE '${names.last}' END")
  }

  private val Dims = 64

  /** Regression floors for `ann_recall`: just below the measured recall@5
    * of each approximate path on the fixture (the paths are seeded and
    * deterministic, so the recall fraction itself is exact and
    * hash-matched; the floor is the human-readable "don't regress below
    * this" line both engines restate).
    */
  private val AnnRecallFloors: Map[String, Double] =
    Map(
      // measured 0.975 at sf0.01: int8 only loses rank inversions within
      // quantization error
      "int8" -> 0.9,
      // measured 0.90: single-list IVF probe over 16 deterministic lists
      "ivf" -> 0.85,
      // measured 0.10: single-bucket hyperplane LSH on the near-uniform
      // synthetic embeddings — P(neighbor shares all 4 planes) ≈ 0.57⁴
      // ≈ 0.1 when top-5 cosines sit near 0.2; this is the known
      // weakness multi-probe/banding fixes, floored honestly, not hidden
      "lsh" -> 0.05,
      // hamming-radius-1 multi-probe over the same 4 planes: the fix the
      // plain-lsh row motivates (measured 0.50 — 5× the single-bucket
      // recall at 5× probe cost)
      "lsh_mp" -> 0.25,
      // banded OR-amplification, 24 planes in 12 bands of r=2 (match =
      // agree on ANY full band): recall 1-(1-p^r)^b with p ≈ 0.56 on this
      // fixture's weak top-5 cosines (~0.2) predicts ≈0.99; measured
      // 1.0 at sf0.01. Probe cost, stated honestly: candidate fraction ≈
      // 1-(1-2^-r)^b ≈ 0.97 of the corpus here — uniform random
      // embeddings with near-orthogonal "neighbors" are LSH's worst case
      // (ρ = ln p1/ln p2 → 1 as p1 → p2), so production-grade recall on
      // THIS fixture costs nearly brute force. On a real near-dup corpus
      // (cos ≥ 0.8 → p ≥ 0.85) the same operator runs r=8/b=16 for
      // recall ≈ 0.97 probing ~6% of the corpus — the r/b knobs, not the
      // operator shape, carry the trade (see Similarity.lshTopKBanded).
      "lsh_banded" -> 0.8,
      // product quantization at the QUALITY setting (PqM × PqCodes
      // below, hash-ordered codebook, cosine-of-reconstruction scoring;
      // ann_pq_topk pins the coarser m=4 inner-product shape): on this
      // near-uniform fixture top-5 cosines are weak (~0.2) with tiny
      // rank gaps, so recall is acutely sensitive to reconstruction
      // distortion — m=16×16 codes measured 0.325; finer 2-dim
      // subspaces with 64 codes each recover the ranking. Floor sits
      // just under the measured sf0.01/sf0.1 recall@5 (round-13 NOTES)
      "pq" -> 0.9)

  // The ann_recall pq row's production setting: PqM subspaces of
  // Dims/PqM dims, PqCodes hash-ordered codes per subspace, exact
  // re-rank of each query's PqRerank-deep ADC shortlist.
  private val PqM = 32
  private val PqCodes = 64
  private val PqSub = Dims / PqM
  private val PqRerank = 32

  /** Floor for `ann_ivf_probe_recall` — the PERSISTED-index probe path.
    * Same centroids (first 16 by id) as `ann_recall`'s in-memory "ivf"
    * row, so the same measured 0.90 recall and the same 0.85 floor: the
    * on-disk index is an access path over the identical closed-form IVF,
    * and this row exists to notice the probe path (pruned scan, list
    * assignment, tie-breaks) silently diverging from it.
    */
  private val IvfProbeRecallFloor = 0.85

  /** Floor for the AUTO-sized + recall-CALIBRATED IVF path, and the
    * calibration's own target. The gate floor sits under the calibration
    * target because calibration measures recall on a 32-query training
    * sample while the gate re-measures it on 8 held-out queries — the
    * 0.05 gap absorbs sample variance, not a quality concession.
    */
  private val IvfAutoRecallFloor = 0.85
  private val IvfAutoRecallTarget = 0.9

  // Target source-mix for the rebalancing query: src3 is the binding
  // source (kept whole), src0/1/2 are downsampled toward the shares.
  private val RebalanceShares =
    Seq("src0" -> 0.3, "src1" -> 0.1, "src2" -> 0.1, "src3" -> 0.5)

  /** One oracle, two implementations: ev_session_window (batch) and
    * ev_session_window_stream (complete-mode stream) replay the
    * built-in's exact boundary semantics (gap of EXACTLY the threshold
    * starts a new session — >= on epoch microseconds). */
  private lazy val sessionWindowOracleSql: String =
    s"""WITH g AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM $evSql WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM g)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL 30 MINUTE AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  round(sum(value), 2) AS sum_value
       |FROM s GROUP BY user_id, session_id
       |ORDER BY user_id, session_start""".stripMargin

  /** One oracle, two implementations: ev_funnel (batch joins) and
    * ev_funnel_stream (stateful fold) must both reproduce it. */
  private lazy val funnelOracleSql: String =
    s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM $evSql
       |            WHERE event_type = 'view' GROUP BY 1),
       |s2 AS (SELECT s1.user_id, t1,
       |         min(CASE WHEN ev.ts > t1 AND ev.ts <= t1 + INTERVAL 24 HOUR THEN ev.ts END) AS t2
       |       FROM s1 LEFT JOIN $evSql
       |         ON ev.user_id = s1.user_id AND ev.event_type = 'click'
       |       GROUP BY 1, 2),
       |s3 AS (SELECT s2.user_id, t1, t2,
       |         min(CASE WHEN ev.ts > t2 AND ev.ts <= t2 + INTERVAL 24 HOUR THEN ev.ts END) AS t3
       |       FROM s2 LEFT JOIN $evSql
       |         ON ev.user_id = s2.user_id AND ev.event_type = 'purchase'
       |       GROUP BY 1, 2, 3)
       |SELECT user_id, t1, t2, t3,
       |  CAST(1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT) AS INT) AS reached
       |FROM s3 ORDER BY user_id""".stripMargin

  def all: Seq[QueryDef] = Seq(

    // ───────────────────────── text analysis ─────────────────────────────
    QueryDef(
      "text_quality",
      (s, dir) => TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
              |  $toksSql AS toks, $subsSql AS subs FROM documents)
              |SELECT doc_id, n_chars,
              |  CAST(len(toks) AS BIGINT) AS n_tokens,
              |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
              |  CAST(len(subs) AS BIGINT) AS n_subwords,
              |  CAST(len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS BIGINT) AS n_stopwords,
              |  round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS mean_token_len,
              |  round(CAST(len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
              |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio
              |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Logistic quality score on the rounded ratio features — the
    // classifier-scoring pass of a curation pipeline, model-free and
    // engine-portable (same left-folded z, round(6) absorbs exp ulps).
    QueryDef(
      "text_quality_score",
      (s, dir) => TextAnalysis.qualityScore(
          TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text", "doc_id"))
        .select("doc_id", "q_score")
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |f AS (SELECT doc_id,
              |  round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS mean_token_len,
              |  round(CAST(len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
              |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio
              |FROM b)
              |SELECT doc_id,
              |  round(1.0 / (1.0 + exp(-(-1.0 + stopword_ratio * 4.0 + distinct_ratio * 2.0 + mean_token_len * -0.3))), 6) AS q_score
              |FROM f ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "text_langid",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(
        s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id,
           |  $langScoresSql
           |FROM b)
           |SELECT doc_id, $langCaseSql AS lang_pred
           |FROM s ORDER BY doc_id""".stripMargin
      )
    ),

    QueryDef(
      "text_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp
              |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Rabin–Karp-style rolling-hash fingerprints: whole-document polynomial
    // hash + distinct 3-token-window hashes (shingle fingerprints without
    // concatenated shingle strings).
    QueryDef(
      "text_rolling_fp",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("roll_fp"),
          size(array_distinct(TextAnalysis.ngramHashes(col("text"), 3)))
            .cast("long").as("n_distinct_3grams"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT doc_id,
              |  ${polyHashSql("toks")} AS roll_fp,
              |  CAST(len(list_distinct(list_transform(
              |    range(1, greatest(len(toks) - 2, 0) + 1),
              |    i -> ${polyHashSql("toks[i:i+2]")}))) AS BIGINT) AS n_distinct_3grams
              |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // Winnowing (MOSS) fingerprints: min gram hash per w-window,
    // de-duplicated — the robust document-fingerprint middle ground
    // between full shingle sets and one whole-doc hash; (doc_id, fp)
    // rows are the join-ready matching form.
    QueryDef(
      "text_winnow",
      (s, dir) => TextAnalysis.winnowFingerprints(
          Tables.documents(s, dir), "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "fp"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
              |        i -> ${polyHashSql("toks[i:i+2]")}) AS grams FROM b),
              |wnw AS (SELECT doc_id, CASE WHEN len(grams) = 0 THEN CAST([] AS BIGINT[])
              |  ELSE list_distinct(list_transform(range(1, greatest(len(grams) - 3, 1) + 1),
              |    i -> list_min(grams[i:i+3]))) END AS fps FROM g)
              |SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wnw
              |ORDER BY doc_id, fp""".stripMargin)
    ),

    // RAG-style overlapping token chunking (16-token windows every 12):
    // tokenize once, explode(sequence(...)) per doc — narrow, shuffle-free,
    // ~n_toks/step rows per document at any scale.
    QueryDef(
      "text_chunk_overlap",
      (s, dir) => TextAnalysis.chunkOverlap(
          Tables.documents(s, dir).filter(col("doc_id") % 4 === 0),
          "doc_id", "text", chunkSize = 16, step = 12)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH d AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 4 = 0),
              |t AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
              |st AS (SELECT doc_id, toks, n,
              |         unnest(generate_series(0, n - 1, 12)) AS start_tok FROM t)
              |SELECT doc_id,
              |  CAST(floor(CAST(start_tok AS DOUBLE) / 12) AS INTEGER) AS chunk_id,
              |  start_tok,
              |  least(16, n - start_tok) AS chunk_len,
              |  array_to_string(toks[start_tok + 1 : start_tok + 16], ' ') AS chunk_text
              |FROM st ORDER BY doc_id, chunk_id""".stripMargin)
    ),

    // Winnow-fingerprint near-dup candidates: ids sharing ≥3 selected
    // fingerprints — the equi-join-on-fp pair search, same scale shape as
    // the MinHash band join.
    QueryDef(
      "dedup_winnow_pairs",
      (s, dir) => TextAnalysis.winnowPairs(
          Tables.documents(s, dir), "doc_id", "text", k = 3, w = 4, minShared = 3)
        .withColumnRenamed("id1", "doc1").withColumnRenamed("id2", "doc2")
        .orderBy("doc1", "doc2"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
              |        i -> ${polyHashSql("toks[i:i+2]")}) AS grams FROM b),
              |wnw AS (SELECT doc_id, CASE WHEN len(grams) = 0 THEN CAST([] AS BIGINT[])
              |  ELSE list_distinct(list_transform(range(1, greatest(len(grams) - 3, 1) + 1),
              |    i -> list_min(grams[i:i+3]))) END AS fps FROM g),
              |f AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wnw)
              |SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_shared
              |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= 3
              |ORDER BY doc1, doc2""".stripMargin)
    ),

    // Redaction: scrub emails/URLs/long digit runs before training. The
    // patterns are one shared constant rendered into both plans — written
    // in the Java∩RE2 regex subset so both engines match identical spans.
    QueryDef(
      "text_redact",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.redact(col("text")).as("clean_text"),
          (length(col("text")) - length(TextAnalysis.redact(col("text"))))
            .cast("long").as("chars_removed"))
        .orderBy("doc_id"),
      Some {
        // DuckDB single-quoted literals keep backslashes verbatim — only
        // quotes need escaping for the pattern to reach RE2 unchanged.
        val applied = TextAnalysis.RedactionRules.foldLeft("text") {
          case (expr, (pat, repl)) =>
            s"regexp_replace($expr, '${pat.replace("'", "''")}', '$repl', 'g')"
        }
        s"""SELECT doc_id, $applied AS clean_text,
           |  CAST(length(text) - length($applied) AS BIGINT) AS chars_removed
           |FROM documents ORDER BY doc_id""".stripMargin
      }
    ),

    // TF-IDF top terms per document: the distinctive-vocabulary op (two
    // hash-aggs over exploded tokens + a per-doc rank window). Smoothed
    // idf = ln((N+1)/(df+1)); scores rounded to 9 dp, term breaks ties.
    QueryDef(
      "text_tfidf",
      (s, dir) => TextAnalysis.tfidfTopTerms(
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
        "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank"),
      Some(s"""WITH toks AS (
              |  SELECT doc_id AS id, tok
              |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 5 = 0) d,
              |       UNNEST(d.toks) AS t(tok)),
              |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
              |dfq AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok),
              |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents WHERE doc_id % 5 = 0),
              |sc AS (SELECT id, tok, tf, df_t,
              |         round(tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df_t + 1)), 9) AS score
              |       FROM tf JOIN dfq USING (tok) CROSS JOIN nd),
              |r AS (SELECT id, tok, tf, df_t,
              |        CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, tok) AS INTEGER) AS rank,
              |        score
              |      FROM sc)
              |SELECT id AS doc_id, tok, tf, df_t, rank, score FROM r WHERE rank <= 3
              |ORDER BY doc_id, rank""".stripMargin)
    ),

    // Unigram-LM quality score: ln of each doc's mean token corpus
    // frequency — the perplexity-filter stand-in. Integer sums only
    // (shuffle-order-proof); one ln per doc rounded to 9 dp.
    QueryDef(
      "text_unigram_score",
      (s, dir) => TextAnalysis.unigramLogFreq(
        Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id AS id, tok
              |  FROM (SELECT doc_id, $toksSql AS toks FROM documents) d,
              |       UNNEST(d.toks) AS x(tok)),
              |f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
              |tot AS (SELECT count(*) AS total FROM t),
              |s AS (SELECT id, CAST(sum(cnt) AS BIGINT) AS sum_cnt,
              |        count(*) AS n_tokens
              |      FROM t JOIN f USING (tok) GROUP BY id)
              |SELECT id AS doc_id, n_tokens,
              |  round(ln(CAST(sum_cnt AS DOUBLE) /
              |    (CAST(n_tokens AS DOUBLE) * CAST(total AS DOUBLE))), 9) AS mean_logfreq
              |FROM s CROSS JOIN tot ORDER BY doc_id""".stripMargin)
    ),

    // ───────────────────────── dedup family ──────────────────────────────
    QueryDef(
      "dedup_exact",
      (s, dir) => Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("fp"),
      Some(s"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT md5(array_to_string(toks, ' ')) AS fp, min(doc_id) AS keep_id,
              |  count(*) AS n_copies
              |FROM b GROUP BY fp ORDER BY fp""".stripMargin)
    ),

    QueryDef(
      "dedup_simhash",
      (s, dir) => Dedup.simhash(Tables.documents(s, dir), "doc_id", "text", bits = 16)
        .orderBy("doc_id"),
      Some {
        val sums = (1 to 16).map(j =>
          s"sum(CASE WHEN substr(h, $j, 1) IN (${sqlList(Dedup.HighHexDigits)}) THEN 1 ELSE -1 END) AS s$j"
        ).mkString(",\n  ")
        val bits = (1 to 16).map(j => s"CASE WHEN s$j >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH toks AS (
           |  SELECT doc_id, md5(tok) AS h
           |  FROM (SELECT doc_id, $toksSql AS toks FROM documents) d, UNNEST(d.toks) AS t(tok)),
           |s AS (SELECT doc_id,
           |  $sums
           |FROM toks GROUP BY doc_id)
           |SELECT doc_id, $bits AS simhash FROM s ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "dedup_simhash_pairs",
      (s, dir) => Dedup.simhashPairs(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", bits = 16, nBands = 4, maxHamming = 2)
        .orderBy("id1", "id2"),
      Some(s"""WITH ${simhashPairsCtes("doc_id % 10 = 0")}
              |SELECT id1, id2, hamming FROM pairs
              |WHERE hamming <= 2 ORDER BY id1, id2""".stripMargin)
    ),

    // Incremental ingestion dedup: which incoming docs are content-new vs
    // the existing corpus — one fingerprint anti join (split the corpus by
    // doc_id parity to simulate old/new batches).
    QueryDef(
      "dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.newDocuments(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .select("doc_id", "fp")
          .orderBy("doc_id")
      },
      Some(s"""WITH fps AS (SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS fp FROM documents),
              |new AS (SELECT doc_id, fp FROM fps WHERE doc_id % 2 = 1),
              |old AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0)
              |SELECT doc_id, fp FROM new
              |WHERE fp NOT IN (SELECT fp FROM old)
              |ORDER BY doc_id""".stripMargin)
    ),

    // Pairs → clusters → keep-one: connected components over the simhash
    // near-dup graph (Spark: hash-min label propagation; oracle: recursive
    // transitive closure + min). The corpus-shrinking step the pair ops
    // feed — every doc gets its cluster's min id, representatives are kept.
    QueryDef(
      "dedup_clusters",
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
        val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
          bits = 16, nBands = 4, maxHamming = 2)
        Dedup.clusterAssign(docs, "doc_id", pairs)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${simhashPairsCtes("doc_id % 10 = 0")},
              |hp AS (SELECT id1, id2 FROM pairs WHERE hamming <= 2),
              |edges AS (SELECT id1 AS src, id2 AS dst FROM hp
              |          UNION SELECT id2, id1 FROM hp),
              |reach(id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
              |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
              |SELECT d.doc_id,
              |  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
              |  d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS kept
              |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
              |LEFT JOIN cc ON cc.id = d.doc_id
              |ORDER BY doc_id""".stripMargin)
    ),

    // Quality-aware cluster survivor: same SimHash components as
    // dedup_clusters, but the kept doc per cluster is the one with the
    // MOST tokens (ties → smallest id) — the keep-the-best-copy rule real
    // pipelines use instead of keep-smallest-id.
    QueryDef(
      "dedup_cluster_keep_best",
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
        val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
          bits = 16, nBands = 4, maxHamming = 2)
        Dedup.clusterKeepBest(docs, "doc_id", pairs,
          size(TextAnalysis.tokens(col("text"))).cast("long"))
          .withColumnRenamed("id", "doc_id")
          .withColumnRenamed("score", "n_tokens")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${simhashPairsCtes("doc_id % 10 = 0")},
              |hp AS (SELECT id1, id2 FROM pairs WHERE hamming <= 2),
              |edges AS (SELECT id1 AS src, id2 AS dst FROM hp
              |          UNION SELECT id2, id1 FROM hp),
              |reach(id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
              |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
              |asg AS (
              |  SELECT d.doc_id,
              |    coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
              |    len($toksSql) AS n_tokens
              |  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0) d
              |  LEFT JOIN cc ON cc.id = d.doc_id),
              |rn AS (SELECT doc_id, cluster_id, n_tokens,
              |         row_number() OVER (PARTITION BY cluster_id
              |           ORDER BY n_tokens DESC, doc_id ASC) AS rk
              |       FROM asg)
              |SELECT doc_id, cluster_id, n_tokens, rk = 1 AS kept
              |FROM rn ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "dedup_minhash_lsh",
      (s, dir) => Dedup.lshCandidatePairs(
        Tables.documents(s, dir).filter(col("doc_id") % 50 === 0),
        "doc_id", "text", k = 8, rowsPerBand = 2)
        .withColumnRenamed("id1", "doc1").withColumnRenamed("id2", "doc2")
        .orderBy("doc1", "doc2"),
      Some {
        val mins = (0 until 8).map(i => s"min(md5('$i|' || tok)) AS mh$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bh FROM s"
        ).mkString(" UNION ALL ")
        s"""WITH w AS (
           |  SELECT DISTINCT doc_id, tok
           |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = 0) d,
           |       UNNEST(d.toks) AS t(tok)),
           |s AS (SELECT doc_id, $mins FROM w GROUP BY doc_id),
           |bands AS ($bands)
           |SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
           |FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id
           |ORDER BY doc1, doc2""".stripMargin
      }
    ),

    // Persisted LSH index + incremental probe: dedupe a NEW crawl batch
    // against the already-indexed corpus without re-sigging the corpus.
    // The oracle replays both sides' band computation and the band join.
    QueryDef(
      "dedup_lsh_index_probe",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val corpus   = docs.filter(col("doc_id") % 50 === 0)
        val incoming = docs.filter(col("doc_id") % 50 === 25)
        val idx = java.nio.file.Files.createTempDirectory("lshidx").toString + "/idx"
        Dedup.buildLshIndex(corpus, "doc_id", "text", k = 8, rowsPerBand = 2, idx)
        Dedup.probeLshIndex(s, idx, incoming, "doc_id", "text", k = 8, rowsPerBand = 2)
          .orderBy("new_id", "corpus_id")
      },
      Some {
        val mins = (0 until 8).map(i => s"min(md5('$i|' || tok)) AS mh$i").mkString(", ")
        def bands(src: String) = (0 until 4).map(b =>
          s"SELECT doc_id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bh FROM $src"
        ).mkString(" UNION ALL ")
        def sig(m: Int) =
          s"""SELECT doc_id, $mins FROM (
             |  SELECT DISTINCT doc_id, tok
             |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = $m) d,
             |       UNNEST(d.toks) AS t(tok)) w GROUP BY doc_id""".stripMargin
        s"""WITH sc AS (${sig(0)}),
           |si AS (${sig(25)}),
           |cb AS (${bands("sc")}),
           |ib AS (${bands("si")})
           |SELECT DISTINCT i.doc_id AS new_id, c.doc_id AS corpus_id
           |FROM ib i JOIN cb c ON i.band = c.band AND i.bh = c.bh
           |ORDER BY new_id, corpus_id""".stripMargin
      }
    ),

    // LSH candidates verified by EDIT DISTANCE (order-sensitive, the
    // complement of Jaccard): levenshtein over whitespace-normalized
    // text, computed only on candidate pairs. Bands are WIDE here (2
    // bands × 4 minhashes): edit-distance verification is the most
    // expensive verifier in the family (O(len·maxDist) per pair), so the
    // candidate generator trades recall for precision — the knob a real
    // fuzzy-dedup flow turns, since banded cost scales with candidate
    // count, not corpus size. maxDist = 64 is a near-dup bound (~¼ of a
    // typical doc), not the anything-goes 200 of earlier rounds.
    QueryDef(
      "dedup_fuzzy",
      (s, dir) => {
        val docs = Tables.documents(s, dir).filter(col("doc_id") % 50 === 0)
        // ONE tokenization pass (Dedup.signatures): candidate generation
        // derives the token SET from it, the edit-distance verify derives
        // the normalized text — the corpus is scanned once, not three
        // times. The verified pairs materialize BEFORE the orderBy (a
        // range sort's sampling pass re-executes its child — that would
        // run the whole levenshtein pass twice); the shared pass releases.
        val sigs = Dedup.signatures(docs, "doc_id", "text")
        val cands = Dedup.lshCandidatePairsOnSets(
          sigs.select(col("id"), array_distinct(col("toks")).as("toks")),
          k = 8, rowsPerBand = 4)
        val verified = Dedup.verifyPairsEditDistanceOnTokens(sigs, cands,
          maxDist = 64).localCheckpoint()
        CacheControl.release(cands)
        CacheControl.release(sigs)
        val out = verified.orderBy("id1", "id2").localCheckpoint()
        CacheControl.release(verified)
        out
      },
      Some {
        val mins = (0 until 8).map(i => s"min(md5('$i|' || tok)) AS mh$i").mkString(", ")
        val bands = (0 until 2).map(b =>
          s"SELECT doc_id, $b AS band, md5(mh${4 * b} || mh${4 * b + 1} || mh${4 * b + 2} || mh${4 * b + 3}) AS bh FROM s"
        ).mkString(" UNION ALL ")
        s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = 0),
           |w AS (SELECT DISTINCT doc_id, tok FROM d, UNNEST(d.toks) AS t(tok)),
           |s AS (SELECT doc_id, $mins FROM w GROUP BY doc_id),
           |bands AS ($bands),
           |cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
           |         FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
           |txt AS (SELECT doc_id, array_to_string(toks, ' ') AS t FROM d)
           |SELECT id1, id2, CAST(levenshtein(t1.t, t2.t) AS INTEGER) AS edit_dist
           |FROM cand JOIN txt t1 ON id1 = t1.doc_id JOIN txt t2 ON id2 = t2.doc_id
           |WHERE levenshtein(t1.t, t2.t) <= 64
           |ORDER BY id1, id2""".stripMargin
      }
    ),

    QueryDef(
      "dedup_jaccard",
      (s, dir) => Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") % 50 === 0),
        "doc_id", "text", minJaccard = 0.5)
        .orderBy("id1", "id2"),
      Some(s"""WITH w AS (
              |  SELECT DISTINCT doc_id, tok
              |  FROM (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = 0) d,
              |       UNNEST(d.toks) AS t(tok)),
              |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
              |common AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id1, id2, jaccard FROM (
              |  SELECT id1, id2,
              |    round(CAST(common AS DOUBLE) / (s1.sz + s2.sz - common), 4) AS jaccard
              |  FROM common
              |  JOIN sz s1 ON s1.doc_id = id1
              |  JOIN sz s2 ON s2.doc_id = id2)
              |WHERE jaccard >= 0.5 ORDER BY id1, id2""".stripMargin)
    ),

    QueryDef(
      "dedup_embedding",
      (s, dir) => Similarity.cosineNearDupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") % 20 === 0),
        "vec_id", "embedding", threshold = 0.35)
        .orderBy("id1", "id2"),
      Some(s"""WITH a AS (SELECT vec_id AS id1, embedding AS v1 FROM embeddings WHERE vec_id % 20 = 0),
              |b AS (SELECT vec_id AS id2, embedding AS v2 FROM embeddings WHERE vec_id % 20 = 0)
              |SELECT id1, id2, cos FROM (
              |  SELECT id1, id2, round(${cosSql("v1", "v2", Dims)}, 6) AS cos
              |  FROM a CROSS JOIN b WHERE id1 < id2)
              |WHERE cos >= 0.35 ORDER BY id1, id2""".stripMargin)
    ),

    // Scale path for embedding near-dups: hyperplane-LSH banded candidates
    // + exact-cosine verify (never all-pairs); cosineNearDupPairs above
    // stays as the small-N verifier. 24 planes / 6 bands of 4 bits —
    // sized for the synthetic corpus, where "near" is cos ≥ 0.25 (the
    // vectors are random; real near-dup corpora use tighter thresholds
    // and wider bands).
    QueryDef(
      "dedup_embedding_lsh",
      (s, dir) => Similarity.lshNearDupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", threshold = 0.25, planes = 24, nBands = 6, dims = Dims)
        .orderBy("id1", "id2"),
      Some {
        val (planes, nB, w) = (24, 6, 4)
        val bands = (0 until nB).map(b =>
          s"SELECT id, $b AS band, substr(sig, ${b * w + 1}, $w) AS bh FROM e"
        ).mkString(" UNION ALL ")
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v,
           |            ${bucketSql("embedding", planes, Dims)} AS sig
           |          FROM embeddings WHERE vec_id % 5 = 0),
           |bands AS ($bands),
           |cands AS (SELECT DISTINCT a.id AS id1, c.id AS id2
           |          FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh AND a.id < c.id),
           |p AS (SELECT id1, id2, round(${cosSql("e1.v", "e2.v", Dims)}, 6) AS cos
           |      FROM cands JOIN e e1 ON e1.id = id1 JOIN e e2 ON e2.id = id2)
           |SELECT id1, id2, cos FROM p WHERE cos >= 0.25 ORDER BY id1, id2""".stripMargin
      }
    ),

    // Bloom-prefiltered anti join: exactly the plain left_anti result
    // (orders with no lineitems), but only bloom-positive probe rows reach
    // the anti-join shuffle — the 100 TB CDC shape.
    QueryDef(
      "j1_anti_join_bloom",
      (s, dir) => BloomJoin.bloomAntiJoin(
        Tables.orders(s, dir), Tables.lineitem(s, dir).select(col("l_orderkey").as("o_orderkey")),
        "o_orderkey", expectedItems = 200000L, numBits = 2000000L)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // SemDeDup-style semantic dedup: nearest-centroid assignment bounds
    // the pair search to within-cluster, connected components pick one
    // representative per duplicate group. Centroids are the same
    // deterministic id-prefix sampler the IVF queries use; the oracle
    // replays assignment, within-cluster cosine pairs, and the recursive
    // closure.
    QueryDef(
      "dedup_semantic",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_v"))
        Similarity.semanticDedup(e, "vec_id", "embedding", cents, threshold = 0.35)
          .withColumnRenamed("id", "vec_id")
          .orderBy("vec_id")
      },
      Some {
        val cosVC = cosSql("e.embedding", "c.cent_v", Dims)
        val cosP  = cosSql("e1.embedding", "e2.embedding", Dims)
        s"""WITH RECURSIVE
           |cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM embeddings e CROSS JOIN cents c) WHERE rn = 1),
           |p AS (
           |  SELECT a1.vec_id AS id1, a2.vec_id AS id2, round($cosP, 6) AS cos
           |  FROM assign a1 JOIN assign a2
           |    ON a1.cent_id = a2.cent_id AND a1.vec_id < a2.vec_id
           |  JOIN embeddings e1 ON e1.vec_id = a1.vec_id
           |  JOIN embeddings e2 ON e2.vec_id = a2.vec_id),
           |hp AS (SELECT id1, id2 FROM p WHERE cos >= 0.35),
           |edges AS (SELECT id1 AS src, id2 AS dst FROM hp
           |          UNION SELECT id2, id1 FROM hp),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
           |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
           |SELECT em.vec_id,
           |  coalesce(cc.cluster_id, em.vec_id) AS cluster_id,
           |  em.vec_id = coalesce(cc.cluster_id, em.vec_id) AS kept
           |FROM embeddings em LEFT JOIN cc ON cc.id = em.vec_id
           |ORDER BY em.vec_id""".stripMargin
      }
    ),

    // ─────────────── deterministic sampling / dataset splits ─────────────
    QueryDef(
      "sample_hash",
      (s, dir) => Sampling.sampleByHash(Tables.documents(s, dir), "doc_id", 0.25)
        .select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents)
              |SELECT doc_id, $hashBucketSql AS bucket FROM b
              |WHERE $hashBucketSql < ${Sampling.threshold(0.25)} ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "split_assign",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          Sampling.hashBucket(col("doc_id")).as("bucket"),
          Sampling.splitColumn(col("doc_id"), Sampling.DefaultSplits).as("split"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
              |k AS (SELECT doc_id, $hashBucketSql AS bucket FROM b)
              |SELECT doc_id, bucket, $splitCaseSql AS split FROM k ORDER BY doc_id""".stripMargin)
    ),

    // per-stratum fractions: downsample the dominant language, keep a rare
    // one at a higher rate — the corpus-balancing daily-use op.
    QueryDef(
      "sample_stratified",
      (s, dir) => Sampling.stratifiedSampleByHash(Tables.documents(s, dir),
          "doc_id", "lang", StrataFractions, defaultFraction = StrataDefault)
        .select(col("doc_id"), col("lang"), Sampling.hashBucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
              |k AS (SELECT doc_id, lang, $hashBucketSql AS bucket FROM b)
              |SELECT doc_id, lang, bucket FROM k
              |WHERE bucket < $strataCaseSql
              |ORDER BY doc_id""".stripMargin)
    ),

    // Weighted sample without replacement (Efraimidis–Spirakis, ln(u)/w
    // keys from the md5 uniform): longer documents proportionally more
    // likely — the quality-weighted corpus-selection op. Both engines
    // derive u from the same 13 md5 hex digits; keys rounded to 9 dp so
    // libm log ulps can't flip ranks, doc_id breaks residual ties.
    QueryDef(
      "sample_weighted",
      (s, dir) => Sampling.weightedSample(
        Tables.documents(s, dir), "doc_id", col("n_chars"), k = 100)
        .orderBy(desc("skey"), col("doc_id")),
      Some(s"""WITH u AS (
              |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
              |    (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 0.5)
              |      / ${Sampling.UniformDenom} AS u
              |  FROM documents WHERE n_chars > 0)
              |SELECT doc_id, w, round(ln(u) / w, 9) AS skey FROM u
              |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin)
    ),

    // Deterministic per-epoch shuffle keys: each epoch is a different but
    // reproducible total order (md5("<epoch>|<id>")); writing sorted by
    // the key gives the epoch's corpus order at any parallelism.
    QueryDef(
      "sample_epoch_shuffle",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          Sampling.epochShuffleKey(col("doc_id"), 1).as("ek1"),
          Sampling.epochShuffleKey(col("doc_id"), 2).as("ek2"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5('1|' || CAST(doc_id AS VARCHAR)) AS ek1,
             |  md5('2|' || CAST(doc_id AS VARCHAR)) AS ek2
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Source-mix rebalancing (domain mixing): per-source keep fractions
    // computed from observed counts vs target shares (binding source kept
    // whole, everything else downsampled), applied as the deterministic
    // md5-bucket filter. The oracle replays the rate arithmetic
    // term-for-term over the same counts.
    QueryDef(
      "sample_rebalance",
      (s, dir) => Sampling.rebalanceToShares(Tables.documents(s, dir),
          "doc_id", "source", RebalanceShares)
        .select("doc_id", "source").orderBy("doc_id"),
      Some {
        val values = RebalanceShares
          .map { case (k, w) => s"('$k', $w)" }.mkString(", ")
        s"""WITH counts AS (SELECT source, CAST(count(*) AS DOUBLE) AS c
           |               FROM documents GROUP BY 1),
           |t(source, share) AS (VALUES $values),
           |sc AS (SELECT min(c / share) AS sc FROM counts JOIN t USING (source)),
           |thr AS (SELECT t.source,
           |          CAST(floor(least(1.0, (SELECT sc FROM sc) * share / c) * ${Sampling.Buckets} + 0.5) AS INT) AS thr
           |        FROM counts JOIN t USING (source)),
           |b AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
           |k AS (SELECT doc_id, source, $hashBucketSql AS bucket FROM b)
           |SELECT doc_id, source FROM k JOIN thr USING (source)
           |WHERE bucket < thr ORDER BY doc_id""".stripMargin
      }
    ),

    // Temperature-flattened mixing (T5/multilingual recipe): target share
    // ∝ count^0.5 — α=0.5 pinned because sqrt is correctly rounded in
    // every IEEE libm (pow is not), so the per-source rates and the
    // md5-bucket membership are bit-identical in both engines.
    QueryDef(
      "sample_temperature_mix",
      (s, dir) => Sampling.temperatureMix(Tables.documents(s, dir),
          "doc_id", "source", alpha = 0.5)
        .select("doc_id", "source").orderBy("doc_id"),
      Some(s"""WITH counts AS (SELECT source, CAST(count(*) AS DOUBLE) AS c
             |               FROM documents GROUP BY 1),
             |t AS (SELECT source, sqrt(c) AS share, c FROM counts),
             |sc AS (SELECT min(c / share) AS sc FROM t),
             |thr AS (SELECT source,
             |          CAST(floor(least(1.0, (SELECT sc FROM sc) * share / c) * ${Sampling.Buckets} + 0.5) AS INT) AS thr
             |        FROM t),
             |b AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
             |k AS (SELECT doc_id, source, $hashBucketSql AS bucket FROM b)
             |SELECT doc_id, source FROM k JOIN thr USING (source)
             |WHERE bucket < thr ORDER BY doc_id""".stripMargin)
    ),

    // ─────────────────────── similarity search ───────────────────────────
    QueryDef(
      "ann_cosine_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
              |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
              |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qv", "cv", Dims)}, 6) AS cos
              |       FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
              |r AS (SELECT query_id, neighbor_id,
              |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              |        cos
              |      FROM sc)
              |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // Same result as ann_cosine_topk through the heap-aggregate path
    // (TypedImperativeAggregate) instead of the rank window — the SAME
    // DuckDB oracle must hash-match both implementations.
    QueryDef(
      "ann_topk_agg",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.bruteForceTopKAgg(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
              |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
              |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qv", "cv", Dims)}, 6) AS cos
              |       FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
              |r AS (SELECT query_id, neighbor_id,
              |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              |        cos
              |      FROM sc)
              |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    QueryDef(
      "ann_lsh_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, planes = 8, dims = Dims)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", 8, Dims)} AS bucket FROM embeddings),
              |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < 8),
              |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM e),
              |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qv", "cv", Dims)}, 6) AS cos
              |       FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id),
              |r AS (SELECT query_id, neighbor_id,
              |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
              |        cos
              |      FROM sc)
              |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // Multi-probe LSH: each query also probes every bucket ONE bit-flip
    // away (hamming radius 1) — the standard recall fix for single-bucket
    // hyperplane LSH at a (planes+1)× probe cost. The oracle replays the
    // probe-set expansion as a UNION ALL of flipped-bucket selects.
    QueryDef(
      "ann_lsh_multiprobe_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshTopKMultiProbe(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, planes = 8, dims = Dims)
          .orderBy("query_id", "rank")
      },
      Some {
        def flipSql(i: Int, planes: Int) =
          s"""substr(bucket, 1, ${i - 1}) ||
             | (CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END) ||
             | substr(bucket, ${i + 1}, ${planes - i})""".stripMargin.replaceAll("\n", "")
        val probeUnion = (s"SELECT query_id, qv, bucket FROM q0" +:
          (1 to 8).map(i =>
            s"SELECT query_id, qv, ${flipSql(i, 8)} AS bucket FROM q0"))
          .mkString("\n|       UNION ALL ")
        s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", 8, Dims)} AS bucket FROM embeddings),
           |q0 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < 8),
           |qp AS ($probeUnion),
           |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qv", "cv", Dims)}, 6) AS cos
           |       FROM (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM e) c
           |       JOIN qp USING (bucket) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
           |        cos
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // ANN over int8-quantized vectors: 4× smaller corpus, integer dot
    // products (order-independent — no float-fold parity care needed),
    // cosine from integer norms. floor(x+0.5) rounding on both engines.
    QueryDef(
      "ann_quantized_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.quantizedTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      Some(
        s"""WITH z AS (SELECT vec_id, ${qzSql("embedding")} AS qv FROM embeddings),
           |n AS (SELECT vec_id, qv, sqrt(CAST(${idotSql("qv", "qv")} AS DOUBLE)) AS nn FROM z),
           |q AS (SELECT vec_id AS query_id, qv AS qqv, nn AS qn FROM n WHERE vec_id < 8),
           |c AS (SELECT vec_id AS neighbor_id, qv AS cv, nn AS cn FROM n),
           |sc AS (SELECT query_id, neighbor_id,
           |         round(CAST(${idotSql("qqv", "cv")} AS DOUBLE) / (qn * cn), 6) AS cos
           |       FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
           |        cos
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin)
    ),

    // Recall floors for the approximate ANN paths, pinned as an oracle
    // query: recall@5 of each method against the brute-force ground
    // truth, as a deterministic fraction — the DuckDB mirror recomputes
    // BOTH the ground truth and every approximate method's result in
    // SQL (the same closed forms the individual ann_* oracles pin), so
    // an approximate-path change that silently degrades recall breaks
    // the hash match. Floors sit below the measured sf0.01/sf0.1 values;
    // meets_floor must stay true.
    QueryDef(
      "ann_recall",
      (s, dir) => {
        // ONE normalized-and-signed corpus checkpoint shared by the
        // ground truth and all five probe methods (r9: each method
        // independently re-read and re-normalized the embeddings — 5
        // extra corpus scans; at 100 TB that is the dominant cost even
        // though at bench SF the fixed per-stage overhead dominates).
        // The 24-plane signature serves every LSH variant: the 4-plane
        // single/multi-probe buckets are its prefix, the 12×2 banded
        // probes slice it directly (Similarity.prepVectors' prefix
        // property).
        val e = Similarity.prepVectors(Tables.embeddings(s, dir),
          "embedding", sigPlanes = 24, dims = Dims).localCheckpoint()
        val q = e.filter(col("vec_id") < 8)
        val k = 5
        // Truth is consumed exactly ONCE (the single semi-join below),
        // so it rides the final job unpinned — no second checkpoint.
        val truth = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k)
          .select(col("query_id"), col("neighbor_id"))
        // Union the methods' (query_id, neighbor_id) PAIRS tagged by
        // method, then ONE semi-join against truth + ONE groupBy — not
        // five joins and five single-row aggregates unioned after the
        // fact. Collapses ~10 exchanges to 2 beyond the methods' own
        // ranking windows; row-for-row identical output (A/B verified).
        def tag(name: String, approx: org.apache.spark.sql.DataFrame) =
          approx.select(lit(name).as("method"), col("query_id"), col("neighbor_id"))
        val pairs = tag("int8",
            Similarity.quantizedTopK(q, e, "vec_id", "embedding", k))
          .unionByName(tag("ivf",
            Similarity.ivfTopK(q, e, "vec_id", "embedding", k, nCentroids = 16)))
          .unionByName(tag("lsh",
            // 4 planes (16 buckets): the recall-floor fixture wants
            // populated buckets, not the 256-bucket scale setting
            Similarity.lshTopK(q, e, "vec_id", "embedding", k, planes = 4, dims = Dims)))
          .unionByName(tag("lsh_mp",
            // same 4 planes, hamming-radius-1 multi-probe: the row that
            // shows what the probe expansion buys over plain lsh
            Similarity.lshTopKMultiProbe(q, e, "vec_id", "embedding", k,
              planes = 4, dims = Dims)))
          .unionByName(tag("lsh_banded",
            // banded OR-amplification (b bands × r planes, match = share
            // ANY full band): the production recall setting — see the
            // trade documented at AnnRecallFloors
            Similarity.lshTopKBanded(q, e, "vec_id", "embedding", k,
              planes = 24, nBands = 12, dims = Dims)))
          .unionByName(tag("pq",
            // product quantization at the PRODUCTION setting: ADC
            // shortlist (PqM × PqCodes hash-ordered codes) + exact
            // re-rank of the PqRerank-deep shortlist — gates PQ
            // retrieval quality end to end, the one ANN method
            // ann_recall previously left unmeasured (VERDICT r12 #1);
            // ann_pq_topk keeps the raw m=4 inner-product shape and
            // pins the scoring math
            Similarity.pqTopKRerank(q, e, "vec_id", "embedding", k, m = PqM,
              codebook = Similarity.pqCodebookHashOrdered(
                e, "vec_id", "embedding", m = PqM, nCodes = PqCodes),
              rerank = PqRerank)))
        val hits = pairs.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("method").agg(count(lit(1)).as("__hits"))
        // left-join from the literal method list so a method that found
        // NOTHING still emits its row (recall 0.0, meets_floor false)
        // instead of silently vanishing from the gate
        import s.implicits._
        val methods = AnnRecallFloors.toSeq.sortBy(_._1).toDF("method", "floor")
        val out = methods.join(hits, Seq("method"), "left")
          .select(col("method"),
            round(coalesce(col("__hits"), lit(0L)).cast("double") / lit(8 * k), 4)
              .as("recall"),
            col("floor"))
          .select(col("method"), col("recall"), col("floor"),
            (col("recall") >= col("floor")).as("meets_floor"))
          // EAGER + release (cache policy): the tiny recall rows
          // materialize, then the corpus checkpoint — repinned otherwise
          // on every bench/session invocation — is dropped, so a
          // long-lived session keeps ONE persistent entry per call (the
          // 5-row result), not the corpus.
          .orderBy("method").localCheckpoint()
        CacheControl.release(e)
        out
      },
      Some {
        val cosQC = cosSql("qv", "cv", Dims)
        val cosVC = cosSql("v", "cent_v", Dims)
        // squared-L2 between candidate e's PqSub-dim subspace-s slice and
        // code b.code_v — the pq row's encode argmin
        val pqL2Sql = s"list_sum(list_transform(range(1, ${PqSub + 1}), " +
          s"i -> (CAST(e.embedding[b.s*$PqSub+i] AS DOUBLE) - CAST(b.code_v[i] AS DOUBLE))" +
          s" * (CAST(e.embedding[b.s*$PqSub+i] AS DOUBLE) - CAST(b.code_v[i] AS DOUBLE))))"
        def flipSql(i: Int, planes: Int) =
          s"substr(bucket, 1, ${i - 1}) || (CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END) || substr(bucket, ${i + 1}, ${planes - i})"
        val mpProbeUnion = (s"SELECT query_id, qv, bucket FROM lq0" +:
          (1 to 4).map(i =>
            s"SELECT query_id, qv, ${flipSql(i, 4)} AS bucket FROM lq0"))
          .mkString(" UNION ALL ")
        // 12 bands of 2 bits over the 24-plane signature (lsh_banded row)
        val bandedBandsSql = (0 until 12).map(b =>
          s"SELECT vec_id, $b AS band, substr(sig, ${b * 2 + 1}, 2) AS bh FROM be")
          .mkString(" UNION ALL ")
        def rec(m: String, cte: String) =
          s"""SELECT '$m' AS method,
             |  round(CAST((SELECT count(*) FROM $cte a
             |              JOIN bf t ON a.query_id = t.query_id
             |               AND a.neighbor_id = t.neighbor_id) AS DOUBLE) / 40.0, 4) AS recall,
             |  CAST(${AnnRecallFloors(m)} AS DOUBLE) AS floor""".stripMargin
        s"""WITH bfsc AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) q
           |  WHERE q.vec_id <> c.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM bfsc) WHERE rk <= 5),
           |le AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4, Dims)} AS bucket FROM embeddings),
           |lsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |          round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |        FROM le c JOIN le q USING (bucket)
           |        WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
           |lsh5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM lsc) WHERE rk <= 5),
           |lq0 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM le WHERE vec_id < 8),
           |lqp AS ($mpProbeUnion),
           |lmsc AS (SELECT query_id, c.vec_id AS neighbor_id,
           |           round(${cosSql("qv", "c.embedding", Dims)}, 6) AS cos
           |         FROM le c JOIN lqp USING (bucket)
           |         WHERE query_id <> c.vec_id),
           |lmp5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM lmsc) WHERE rk <= 5),
           |be AS (SELECT vec_id, embedding, ${bucketSql("embedding", 24, Dims)} AS sig FROM embeddings),
           |bbands AS ($bandedBandsSql),
           |bcand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
           |          FROM bbands c JOIN bbands q ON q.band = c.band AND q.bh = c.bh
           |          WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
           |bsc AS (SELECT query_id, neighbor_id,
           |          round(${cosSql("e1.embedding", "e2.embedding", Dims)}, 6) AS cos
           |        FROM bcand JOIN be e1 ON e1.vec_id = query_id
           |                   JOIN be e2 ON e2.vec_id = neighbor_id),
           |lb5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM bsc) WHERE rk <= 5),
           |cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |iq AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |       FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |ic AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |       FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |isc AS (SELECT query_id, neighbor_id, round($cosQC, 6) AS cos
           |        FROM ic JOIN iq USING (cent_id) WHERE query_id <> neighbor_id),
           |ivf5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM isc) WHERE rk <= 5),
           |z AS (SELECT vec_id, ${qzSql("embedding")} AS qv FROM embeddings),
           |zn AS (SELECT vec_id, qv, sqrt(CAST(${idotSql("qv", "qv")} AS DOUBLE)) AS nn FROM z),
           |zsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |          round(CAST(${idotSql("q.qv", "c.qv")} AS DOUBLE) / (q.nn * c.nn), 6) AS cos
           |        FROM zn c CROSS JOIN zn q
           |        WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
           |i85 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM zsc) WHERE rk <= 5),
           |pbook AS (
           |  SELECT s, rn - 1 AS code_id,
           |    embedding[s*$PqSub+1 : s*$PqSub+$PqSub] AS code_v
           |  FROM (SELECT embedding,
           |          row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           |        FROM embeddings)
           |  CROSS JOIN (SELECT unnest(range($PqM)) AS s)
           |  WHERE rn <= $PqCodes),
           |penc AS (
           |  SELECT vec_id, sub_id, code_id FROM (
           |    SELECT e.vec_id, b.s AS sub_id, b.code_id,
           |      row_number() OVER (PARTITION BY e.vec_id, b.s
           |        ORDER BY round($pqL2Sql, 6), b.code_id) AS rn
           |    FROM embeddings e CROSS JOIN pbook b) WHERE rn = 1),
           |precon AS (
           |  SELECT p.vec_id, flatten(list(b.code_v ORDER BY p.sub_id)) AS rv
           |  FROM penc p JOIN pbook b ON b.s = p.sub_id AND b.code_id = p.code_id
           |  GROUP BY p.vec_id),
           |pqsc AS (
           |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
           |    round(${cosSql("q.embedding", "r.rv", Dims)}, 6) AS score
           |  FROM precon r CROSS JOIN
           |    (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
           |  WHERE q.vec_id <> r.vec_id),
           |pshort AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
           |    FROM pqsc) WHERE rk <= $PqRerank),
           |pxsc AS (
           |  SELECT p.query_id, p.neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM pshort p JOIN embeddings q ON q.vec_id = p.query_id
           |  JOIN embeddings c ON c.vec_id = p.neighbor_id),
           |pq5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM pxsc) WHERE rk <= 5),
           |rc AS (${rec("int8", "i85")}
           |  UNION ALL ${rec("ivf", "ivf5")}
           |  UNION ALL ${rec("lsh", "lsh5")}
           |  UNION ALL ${rec("lsh_banded", "lb5")}
           |  UNION ALL ${rec("lsh_mp", "lmp5")}
           |  UNION ALL ${rec("pq", "pq5")})
           |SELECT method, recall, floor, recall >= floor AS meets_floor
           |FROM rc ORDER BY method""".stripMargin
      }
    ),

    // The composed scale path: LSH buckets (on float vectors) cut the
    // candidates, int8 quantization scores them — bucket join instead of
    // cross product AND a 4× smaller scoring payload.
    QueryDef(
      "ann_lsh_quantized_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.lshQuantizedTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, planes = 8, dims = Dims)
          .orderBy("query_id", "rank")
      },
      Some(
        s"""WITH e AS (SELECT vec_id, ${bucketSql("embedding", 8, Dims)} AS bucket,
           |            ${qzSql("embedding")} AS qv FROM embeddings),
           |n AS (SELECT vec_id, bucket, qv, sqrt(CAST(${idotSql("qv", "qv")} AS DOUBLE)) AS nn FROM e),
           |q AS (SELECT vec_id AS query_id, bucket, qv AS qqv, nn AS qn FROM n WHERE vec_id < 8),
           |c AS (SELECT vec_id AS neighbor_id, bucket, qv AS cv, nn AS cn FROM n),
           |sc AS (SELECT query_id, neighbor_id,
           |         round(CAST(${idotSql("qqv", "cv")} AS DOUBLE) / (qn * cn), 6) AS cos
           |       FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
           |        cos
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin)
    ),

    // The composed flagship: exact collapse → LSH candidates → Jaccard
    // verification → keep/drop decision, mirrored in SQL end-to-end.
    QueryDef(
      "dedup_pipeline",
      (s, dir) => Dedup.dedupPipeline(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", k = 8, rowsPerBand = 2, minJaccard = 0.7)
        .orderBy("id"),
      Some {
        val mins = (0 until 8).map(i => s"min(md5('$i|' || tok)) AS mh$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bh FROM sigs"
        ).mkString(" UNION ALL ")
        s"""WITH fp AS (
           |  SELECT doc_id AS id, md5(array_to_string($toksSql, ' ')) AS fp
           |  FROM documents WHERE doc_id % 10 = 0),
           |keep AS (SELECT fp, min(id) AS keep_id FROM fp GROUP BY fp),
           |wk AS (SELECT f.id, k.keep_id FROM fp f JOIN keep k ON f.fp = k.fp),
           |w AS (
           |  SELECT DISTINCT d.id, tok
           |  FROM (SELECT doc_id AS id, $toksSql AS toks
           |        FROM documents WHERE doc_id % 10 = 0) d, UNNEST(d.toks) AS t(tok)
           |  WHERE d.id IN (SELECT id FROM wk WHERE id = keep_id)),
           |sigs AS (SELECT id, $mins FROM w GROUP BY id),
           |bands AS ($bands),
           |cands AS (
           |  SELECT DISTINCT a.id AS id1, b.id AS id2
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
           |sz AS (SELECT id, count(*) AS sz FROM w GROUP BY id),
           |common AS (
           |  SELECT c.id1, c.id2, count(*) AS common
           |  FROM cands c
           |  JOIN w w1 ON w1.id = c.id1
           |  JOIN w w2 ON w2.id = c.id2 AND w2.tok = w1.tok
           |  GROUP BY 1, 2),
           |verified AS (
           |  SELECT id1, id2 FROM (
           |    SELECT c.id1, c.id2,
           |      round(CAST(coalesce(m.common, 0) AS DOUBLE) /
           |            (s1.sz + s2.sz - coalesce(m.common, 0)), 4) AS j
           |    FROM cands c
           |    LEFT JOIN common m ON m.id1 = c.id1 AND m.id2 = c.id2
           |    JOIN sz s1 ON s1.id = c.id1
           |    JOIN sz s2 ON s2.id = c.id2)
           |  WHERE j >= 0.7),
           |near AS (SELECT DISTINCT id2 AS id FROM verified)
           |SELECT wk.id,
           |  CASE WHEN wk.id <> wk.keep_id THEN 'exact_dup'
           |       WHEN n.id IS NOT NULL THEN 'near_dup'
           |       ELSE 'kept' END AS status
           |FROM wk LEFT JOIN near n ON n.id = wk.id
           |ORDER BY wk.id""".stripMargin
      }
    ),

    QueryDef(
      "dedup_shingle_jaccard",
      (s, dir) => Dedup.shingleJaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 2, minJaccard = 0.3)
        .orderBy("id1", "id2"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE doc_id % 50 = 0),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(toks) - 1, 0) + 1),
              |         i -> array_to_string(toks[i:i+1], ' '))) AS toks FROM d),
              |w AS (SELECT DISTINCT doc_id, tok FROM sh, UNNEST(sh.toks) AS t(tok)),
              |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
              |common AS (
              |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id1, id2, jaccard FROM (
              |  SELECT id1, id2,
              |    round(CAST(common AS DOUBLE) / (s1.sz + s2.sz - common), 4) AS jaccard
              |  FROM common
              |  JOIN sz s1 ON s1.doc_id = id1
              |  JOIN sz s2 ON s2.doc_id = id2)
              |WHERE jaccard >= 0.3 ORDER BY id1, id2""".stripMargin)
    ),

    QueryDef(
      "ann_ivf_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, nCentroids = 16)
          .orderBy("query_id", "rank")
      },
      Some {
        val cosQC = cosSql("qv", "cv", Dims)
        val cosVC = cosSql("v", "cent_v", Dims)
        s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |sc AS (SELECT query_id, neighbor_id, round($cosQC, 6) AS cos
           |       FROM c JOIN q USING (cent_id) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
           |        cos
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // ann_ivf_topk under the L2 scorer (Similarity.VecScore — NOTES r12
    // staging: the metric flows through assignment AND ranking by
    // construction, never as a per-call flag that can disagree with the
    // build). Score = NEGATED squared euclidean distance, expressed over
    // the same left-fold dots as the cosine rows so DuckDB replays it
    // bit-identically; note the list assignment genuinely differs from
    // the cosine row's (different Voronoi partitioning), so this gates
    // the whole metric path, not just the final rank.
    QueryDef(
      "ann_ivf_l2_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, nCentroids = 16, scorer = Similarity.L2Score)
          .orderBy("query_id", "rank")
      },
      Some {
        val l2QC = l2Sql("qv", "cv", Dims)
        val l2VC = l2Sql("v", "cent_v", Dims)
        s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($l2VC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |sc AS (SELECT query_id, neighbor_id, round($l2QC, 6) AS score
           |       FROM c JOIN q USING (cent_id) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank,
           |        score
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, score FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // The third VecScore member under the gate: inner-product (MIPS)
    // IVF. On unnormalized vectors dot ranking differs from both cosine
    // and L2 (magnitude matters), so this row pins a genuinely third
    // ordering — assignment and ranking replayed closed-form like the
    // cosine and L2 rows.
    QueryDef(
      "ann_ivf_dot_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, nCentroids = 16, scorer = Similarity.DotScore)
          .orderBy("query_id", "rank")
      },
      Some {
        val dQC = dotSql("qv", "cv", Dims)
        val dVC = dotSql("v", "cent_v", Dims)
        s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($dVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |sc AS (SELECT query_id, neighbor_id, round($dQC, 6) AS score
           |       FROM c JOIN q USING (cent_id) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank,
           |        score
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, score FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // Same semantics as ann_ivf_topk but through the PERSISTED index and
    // the batch probe: build once, then ONE cent_id-IN-pruned scan serves
    // all 8 queries. The oracle is the same closed-form IVF as above —
    // the index is an access path, not a semantics change.
    QueryDef(
      "ann_ivf_batch_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_v"))
        val idx = java.nio.file.Files.createTempDirectory("ivfq").toString + "/idx"
        Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, idx)
        Similarity.probeIvfIndexBatch(s, idx, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", cents, k = 5)
          .orderBy("query_id", "rank")
      },
      Some {
        val cosQC = cosSql("qv", "cv", Dims)
        val cosVC = cosSql("v", "cent_v", Dims)
        s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |      FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |sc AS (SELECT query_id, neighbor_id, round($cosQC, 6) AS cos
           |       FROM c JOIN q USING (cent_id) WHERE query_id <> neighbor_id),
           |r AS (SELECT query_id, neighbor_id,
           |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
           |        cos
           |      FROM sc)
           |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // Recall floor for the PERSISTED IVF probe path (VERDICT r10 #5):
    // ann_recall gates the in-memory ivfTopK only; this row measures
    // recall@5 of probeIvfIndexBatch against the STANDING on-disk index
    // (build → partition-pruned probe), vs the same brute-force ground
    // truth. With identical centroids the persisted probe and the
    // in-memory form are the same closed-form IVF — the index is an
    // access path — so the oracle reuses that closed form; a probe-path
    // change that silently degrades recall (pruning too much, dropping a
    // list, breaking the assignment tie-break) breaks the hash match.
    QueryDef(
      "ann_ivf_probe_recall",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent_v"))
        val idx = java.nio.file.Files.createTempDirectory("ivfrec").toString + "/idx"
        Similarity.buildIvfIndex(e, "vec_id", "embedding", cents, idx)
        val q = e.filter(col("vec_id") < 8)
        val truth = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        val probe = Similarity.probeIvfIndexBatch(s, idx, q,
          "vec_id", "embedding", cents, k = 5)
          .select(col("query_id"), col("neighbor_id"))
        probe.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(round(count(lit(1)).cast("double") / lit(40), 4).as("recall"))
          .select(lit("ivf_probe").as("method"), col("recall"),
            lit(IvfProbeRecallFloor).as("floor"),
            (col("recall") >= lit(IvfProbeRecallFloor)).as("meets_floor"))
      },
      Some {
        val cosQC = cosSql("qv", "cv", Dims)
        val cosVC = cosSql("v", "cent_v", Dims)
        s"""WITH bfsc AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) q
           |  WHERE q.vec_id <> c.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM bfsc) WHERE rk <= 5),
           |cents AS (SELECT vec_id AS cent_id, embedding AS cent_v FROM embeddings WHERE vec_id < 16),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e CROSS JOIN cents c)
           |  WHERE rn = 1),
           |iq AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cent_id
           |       FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id WHERE e.vec_id < 8),
           |ic AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, a.cent_id
           |       FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
           |isc AS (SELECT query_id, neighbor_id, round($cosQC, 6) AS cos
           |        FROM ic JOIN iq USING (cent_id) WHERE query_id <> neighbor_id),
           |ivf5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM isc) WHERE rk <= 5),
           |rc AS (SELECT 'ivf_probe' AS method,
           |  round(CAST((SELECT count(*) FROM ivf5 a
           |              JOIN bf t ON a.query_id = t.query_id
           |               AND a.neighbor_id = t.neighbor_id) AS DOUBLE) / 40.0, 4) AS recall,
           |  CAST($IvfProbeRecallFloor AS DOUBLE) AS floor)
           |SELECT method, recall, floor, recall >= floor AS meets_floor
           |FROM rc""".stripMargin
      }
    ),

    // The FULL auto path under the oracle gate (VERDICT r11 #4):
    // buildIvfIndexAuto sizes √N lists and seeds them from the
    // engine-portable md5 hash order, calibrateNProbe measures the
    // recall-vs-probe-width curve on a 32-query training sample and
    // picks the smallest width hitting 0.9, and the persisted index is
    // probed at that width for 8 held-out queries. The oracle replays
    // EVERYTHING closed-form — sizing, seeding, assignment, the
    // calibration curve, the calibrated width itself (published as
    // n_probe), and the final recall — so a drift anywhere in the auto
    // path (seed order, tie-breaks, cumulative-recall rule) breaks the
    // hash match, and shipping the low-recall nProbe=1 default on a
    // √N index (measured 0.08–0.15 at sf0.1) is structurally impossible
    // for callers of the calibrated path.
    QueryDef(
      "ann_ivf_auto_recall",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val (idx, centsPath, nProbe) = ivfAutoFor(s, dir)
        val cents = s.read.parquet(centsPath)
        val q = e.filter(col("vec_id") < 8)
        val truth = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        val probe = Similarity.probeIvfIndexBatch(s, idx, q,
          "vec_id", "embedding", cents, k = 5, nProbe = nProbe)
          .select(col("query_id"), col("neighbor_id"))
        probe.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(round(count(lit(1)).cast("double") / lit(40), 4).as("recall"))
          .select(lit("ivf_auto").as("method"),
            lit(nProbe).as("n_probe"), col("recall"),
            lit(IvfAutoRecallFloor).as("floor"),
            (col("recall") >= lit(IvfAutoRecallFloor)).as("meets_floor"))
      },
      Some {
        val cosVC = cosSql("v", "cent_v", Dims)
        val cosQC = cosSql("q.embedding", "c.cent_v", Dims)
        s"""WITH lists AS (
           |  SELECT CAST(round(sqrt(count(*))) AS INTEGER) AS l FROM embeddings),
           |seedord AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent_v,
           |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           |  FROM embeddings),
           |cents AS (SELECT CAST(rn - 1 AS INTEGER) AS cent_id, cent_v
           |          FROM seedord WHERE rn <= (SELECT l FROM lists)),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT e.vec_id, c.cent_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY round($cosVC, 6) DESC, c.cent_id) AS rn
           |    FROM (SELECT vec_id, embedding AS v FROM embeddings) e
           |    CROSS JOIN cents c)
           |  WHERE rn = 1),
           |qr AS (
           |  SELECT query_id, cent_id, lrank FROM (
           |    SELECT q.vec_id AS query_id, c.cent_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY round($cosQC, 6) DESC, c.cent_id) AS lrank
           |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 40)),
           |calsc AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM embeddings c CROSS JOIN
           |    (SELECT * FROM embeddings WHERE vec_id >= 8 AND vec_id < 40) q
           |  WHERE q.vec_id <> c.vec_id),
           |caltruth AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM calsc) WHERE rk <= 5),
           |hitranks AS (
           |  SELECT qr.lrank, count(*) AS cnt
           |  FROM caltruth t JOIN assign a ON a.vec_id = t.neighbor_id
           |  JOIN qr ON qr.query_id = t.query_id AND qr.cent_id = a.cent_id
           |  GROUP BY 1),
           |cum AS (SELECT lrank, sum(cnt) OVER (ORDER BY lrank) AS cum FROM hitranks),
           |np AS (SELECT coalesce(
           |    (SELECT min(lrank) FROM cum
           |     WHERE cum / (SELECT count(*) FROM caltruth) >= $IvfAutoRecallTarget),
           |    (SELECT l FROM lists)) AS np),
           |bfsc AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) q
           |  WHERE q.vec_id <> c.vec_id),
           |bf AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM bfsc) WHERE rk <= 5),
           |probed AS (
           |  SELECT qr.query_id, a.vec_id AS neighbor_id
           |  FROM qr JOIN np ON qr.lrank <= np.np
           |  JOIN assign a ON a.cent_id = qr.cent_id
           |  WHERE qr.query_id < 8 AND a.vec_id <> qr.query_id),
           |psc AS (
           |  SELECT p.query_id, p.neighbor_id,
           |    round(${cosSql("q.embedding", "c.embedding", Dims)}, 6) AS cos
           |  FROM probed p JOIN embeddings q ON q.vec_id = p.query_id
           |  JOIN embeddings c ON c.vec_id = p.neighbor_id),
           |ivf5 AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
           |    FROM psc) WHERE rk <= 5),
           |rc AS (SELECT 'ivf_auto' AS method,
           |  CAST((SELECT np FROM np) AS INTEGER) AS n_probe,
           |  round(CAST((SELECT count(*) FROM ivf5 a
           |              JOIN bf t ON a.query_id = t.query_id
           |               AND a.neighbor_id = t.neighbor_id) AS DOUBLE) / 40.0, 4) AS recall,
           |  CAST($IvfAutoRecallFloor AS DOUBLE) AS floor)
           |SELECT method, n_probe, recall, floor, recall >= floor AS meets_floor
           |FROM rc""".stripMargin
      }
    ),

    // Product-quantization ANN: encode → argmin-L2 codes per subspace,
    // score = one dot against the concatenated code vectors (ADC for
    // inner product). The oracle replays codebook derivation, encoding,
    // and reconstruction in SQL over the same table; the Spark side
    // inlines the codebook as a plan literal so encode+score never join.
    QueryDef(
      "ann_pq_topk",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val book = Similarity.pqCodebookHashOrdered(e, "vec_id", "embedding",
          m = 4, nCodes = 16)
        Similarity.pqTopK(e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, m = 4, codebook = book)
          .orderBy("query_id", "rank")
      },
      Some {
        val sub = Dims / 4 // 16-dim subvectors
        val l2 = s"list_sum(list_transform(range(1, ${sub + 1}), " +
          "i -> (CAST(e.embedding[b.sub_id*16+i] AS DOUBLE) - CAST(b.code_v[i] AS DOUBLE))" +
          " * (CAST(e.embedding[b.sub_id*16+i] AS DOUBLE) - CAST(b.code_v[i] AS DOUBLE))))"
        // code_id = rank in (md5(id), id) order — the hash-ordered
        // sample pqCodebookHashOrdered draws, replayed closed-form
        s"""WITH book AS (
           |  SELECT s, rn - 1 AS code_id, embedding[s*$sub+1 : s*$sub+$sub] AS code_v
           |  FROM (SELECT embedding,
           |          row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           |        FROM embeddings)
           |  CROSS JOIN (SELECT unnest(range(4)) AS s)
           |  WHERE rn <= 16),
           |enc AS (
           |  SELECT vec_id, sub_id, code_id FROM (
           |    SELECT e.vec_id, b.s AS sub_id, b.code_id,
           |      row_number() OVER (PARTITION BY e.vec_id, b.s
           |        ORDER BY round(${l2.replace("b.sub_id", "b.s")}, 6), b.code_id) AS rn
           |    FROM embeddings e CROSS JOIN book b) WHERE rn = 1),
           |ew AS (
           |  SELECT vec_id,
           |    max(CASE WHEN sub_id=0 THEN code_id END) AS c0,
           |    max(CASE WHEN sub_id=1 THEN code_id END) AS c1,
           |    max(CASE WHEN sub_id=2 THEN code_id END) AS c2,
           |    max(CASE WHEN sub_id=3 THEN code_id END) AS c3
           |  FROM enc GROUP BY vec_id),
           |recon AS (
           |  SELECT ew.vec_id, b0.code_v || b1.code_v || b2.code_v || b3.code_v AS rv
           |  FROM ew
           |  JOIN book b0 ON b0.s = 0 AND b0.code_id = ew.c0
           |  JOIN book b1 ON b1.s = 1 AND b1.code_id = ew.c1
           |  JOIN book b2 ON b2.s = 2 AND b2.code_id = ew.c2
           |  JOIN book b3 ON b3.s = 3 AND b3.code_id = ew.c3),
           |sc AS (
           |  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
           |    round(${dotSql("q.embedding", "r.rv", Dims)}, 6) AS score
           |  FROM recon r CROSS JOIN
           |    (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) q
           |  WHERE q.vec_id <> r.vec_id),
           |rk AS (SELECT query_id, neighbor_id,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY score DESC, neighbor_id) AS INTEGER) AS rank, score
           |  FROM sc)
           |SELECT query_id, neighbor_id, rank, score FROM rk WHERE rank <= 5
           |ORDER BY query_id, rank""".stripMargin
      }
    ),

    // Sketch-based distinct count, oracled WITH TOLERANCE: raw HLL
    // estimates differ across engines, so the query emits whether Spark's
    // estimate lands within ±15% (3× the 5% rsd — deterministic for a
    // fixed dataset, so stable across runs) of the exact count computed in
    // the same scan, and the oracle asserts the verdict, not the estimate.
    // SketchSpec keeps the tighter error-bound anchors.
    QueryDef(
      "agg_approx_distinct",
      (s, dir) => Tables.lineitem(s, dir).agg(
          approx_count_distinct(col("l_partkey")).as("a_parts"),
          countDistinct(col("l_partkey")).as("x_parts"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("a_supps"),
          countDistinct(col("l_suppkey")).as("x_supps"),
          count(lit(1)).as("n_rows"))
        .select(
          (abs(col("a_parts") - col("x_parts")) <= col("x_parts") * 0.15)
            .as("parts_within_tol"),
          (abs(col("a_supps") - col("x_supps")) <= col("x_supps") * 0.15)
            .as("supps_within_tol"),
          col("n_rows")),
      Some("""SELECT true AS parts_within_tol, true AS supps_within_tol,
             |  count(*) AS n_rows FROM lineitem""".stripMargin)
    ),

    // Quantile sketch (GK), oracled with tolerance like the HLL query:
    // accuracy 10000 bounds rank error to n/10000, so the estimate must
    // sit within ±5% of the exact interpolated percentile computed in the
    // same query; the oracle asserts the verdict.
    QueryDef(
      "agg_approx_percentile",
      (s, dir) => Tables.lineitem(s, dir).agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a_p50"),
          expr("percentile(l_extendedprice, 0.5)").as("x_p50"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("a_p90"),
          expr("percentile(l_quantity, 0.9)").as("x_p90"),
          count(lit(1)).as("n_rows"))
        .select(
          (abs(col("a_p50") - col("x_p50")) <= abs(col("x_p50")) * 0.05)
            .as("p50_within_tol"),
          (abs(col("a_p90") - col("x_p90")) <= abs(col("x_p90")) * 0.05)
            .as("p90_within_tol"),
          col("n_rows")),
      Some("""SELECT true AS p50_within_tol, true AS p90_within_tol,
             |  count(*) AS n_rows FROM lineitem""".stripMargin)
    ),

    // Per-group linear regression + covariance + correlation from ONE pass
    // of exact-decimal sufficient statistics (built-in regr_*/covar/corr
    // stream float co-moments — merge-order-dependent, never bit-portable).
    // Both engines run the identical closed form on identical exact sums.
    QueryDef(
      "agg_regression",
      (s, dir) => Profile.regression(Tables.lineitem(s, dir),
          "l_returnflag", "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag"),
      Some {
        def d(c: String) = s"CAST($c AS DECIMAL(19,4))"
        def p(a: String, b: String) = s"CAST(${d(a)} * ${d(b)} AS DECIMAL(38,8))"
        s"""WITH agg AS (
           |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
           |    CAST(sum(${d("l_quantity")}) AS DOUBLE) AS sx,
           |    CAST(sum(${d("l_extendedprice")}) AS DOUBLE) AS sy,
           |    CAST(sum(${p("l_quantity", "l_quantity")}) AS DOUBLE) AS sxx,
           |    CAST(sum(${p("l_extendedprice", "l_extendedprice")}) AS DOUBLE) AS syy,
           |    CAST(sum(${p("l_quantity", "l_extendedprice")}) AS DOUBLE) AS sxy
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           |  round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6) AS intercept,
           |  round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
           |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
           |  round((n * sxy - sx * sy) / (n * n), 6) AS covar_pop,
           |  round((n * sxy - sx * sy) / (n * (n - 1.0)), 6) AS covar_samp,
           |  round((n * sxy - sx * sy) /
           |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_xy
           |FROM agg ORDER BY l_returnflag""".stripMargin
      }
    ),

    // Deterministic distributed mode: two partial-aggregated groupBys
    // (value counts, then min_by over a (−count, value) struct) — the
    // highest-count value, ties to the smallest. Built-in mode() breaks
    // ties arbitrarily, so it can never be oracled; this shape is also the
    // one that scales (post-agg cardinality = distinct values per group,
    // never the table).
    QueryDef(
      "agg_mode",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(
          min_by(col("l_quantity"), struct((-col("cnt")).as("nc"),
            col("l_quantity").as("v"))).as("mode_qty"),
          max(col("cnt")).as("mode_n"))
        .orderBy("l_returnflag"),
      Some("""WITH c AS (
             |  SELECT l_returnflag, l_quantity, count(*) AS cnt
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (
             |  SELECT l_returnflag, l_quantity, cnt,
             |    row_number() OVER (PARTITION BY l_returnflag
             |                       ORDER BY cnt DESC, l_quantity) AS rn
             |  FROM c)
             |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n
             |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)
    ),

    // Mergeable cardinality sketches — the 100 TB pattern: one Apache
    // DataSketches HLL per month partition (tiny, mergeable, storable),
    // union-merged for the global estimate WITHOUT re-touching rows.
    // Tolerance-oracled like agg_approx_distinct: lgK=12 bounds relative
    // error ~1.6%, asserted within ±5% of the exact distinct count.
    QueryDef(
      "agg_hll_mergeable",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val perMonth = o
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"))
        val merged = perMonth.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), false)).as("est"),
          count(lit(1)).as("n_months"))
        val exact = o.agg(countDistinct(col("o_custkey")).as("exact_custs"))
        merged.crossJoin(broadcast(exact)).select(
          (abs(col("est") - col("exact_custs")) <= col("exact_custs") * 0.05)
            .as("est_within_tol"),
          col("n_months"), col("exact_custs"))
      },
      Some("""SELECT true AS est_within_tol,
             |  count(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
             |  count(DISTINCT o_custkey) AS exact_custs FROM orders""".stripMargin)
    ),

    // ─────────────────────── event analytics ─────────────────────────────
    QueryDef(
      "ev_tumbling_1h",
      (s, dir) => Events.tumblingAgg(Tables.events(s, dir), "ts", "1 hour")
        .orderBy("window_start", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n_events, round(sum(value), 2) AS sum_value,
             |  min(value) AS min_value, max(value) AS max_value
             |FROM $evSql GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // The SAME tumbling aggregation computed through the streaming path:
    // readStream → watermarked groupBy(window) → writeStream (complete mode,
    // AvailableNow) → memory table. Oracle-checked against the identical
    // batch SQL — streaming correctness goes through the driver gate, not
    // just unit tests.
    QueryDef(
      "ev_tumbling_stream",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        // The streaming file source requires a directory; the corpus ships
        // single files — stage a symlink into a temp dir.
        val streamDir = java.nio.file.Files.createTempDirectory("ev_stream")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val agg = withTs
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n_events"), col("sum_value"))
        val name = s"ev_stream_${System.nanoTime()}"
        // state layout sized to the stream, not the batch session (see
        // StreamOps.withStatePartitions); only start() needs the window
        val q = graft.streaming.StreamOps.withStatePartitions(s, 8) {
          agg.writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        s.table(name).orderBy("window_start", "event_type")
      },
      Some(s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
              |  count(*) AS n_events, round(sum(value), 2) AS sum_value
              |FROM $evSql GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    QueryDef(
      "ev_sliding_1h_30m",
      (s, dir) => Events.slidingAgg(Tables.events(s, dir), "ts", "1 hour", "30 minutes")
        .orderBy("window_start", "event_type"),
      Some(s"""WITH w AS (
             |  SELECT event_type,
             |    make_timestamp((epoch_ms(ts) // 1800000) * 1800000 * 1000) AS s1,
             |    make_timestamp(((epoch_ms(ts) // 1800000) - 1) * 1800000 * 1000) AS s2
             |  FROM $evSql),
             |u AS (SELECT unnest([s1, s2]) AS window_start, event_type FROM w)
             |SELECT window_start, event_type, count(*) AS n_events
             |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Per-type z-score outliers: decimal-exact Σv/Σv² per type, broadcast
    // stats join, |z| ≥ 2.5 filter. The anomaly-detection primitive.
    QueryDef(
      "ev_outliers",
      (s, dir) => Events.outliers(Tables.events(s, dir),
          "event_type", "value", "event_id", zThreshold = 2.5)
        .orderBy("event_id"),
      Some(s"""WITH st AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS s,
             |    CAST(sum(CAST(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4)) AS DECIMAL(28,8))) AS DOUBLE) AS ss
             |  FROM $evSql GROUP BY 1),
             |m AS (SELECT event_type, s/n AS mean, sqrt((ss - s*s/n)/(n-1)) AS std FROM st)
             |SELECT event_id, event_type, value, round((value - mean)/std, 4) AS z
             |FROM $evSql JOIN m USING (event_type)
             |WHERE abs(round((value - mean)/std, 4)) >= 2.5
             |ORDER BY event_id""".stripMargin)
    ),

    // Robust MAD outliers: the median-based complement of ev_outliers.
    // exactPercentile = true ONLY here: exact interpolated medians are
    // what DuckDB's quantile_cont computes, so the oracle can hash-match;
    // the operator's default is the bounded-memory approx_percentile
    // sketch (see Events.outliersRobust docstring).
    QueryDef(
      "ev_outliers_robust",
      (s, dir) => Events.outliersRobust(Tables.events(s, dir),
          "event_type", "value", "event_id", zThreshold = 3.5,
          exactPercentile = true)
        .orderBy("event_id"),
      Some(s"""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             |             FROM $evSql GROUP BY 1),
             |mad AS (SELECT event_type, med,
             |          quantile_cont(abs(value - med), 0.5) AS mad
             |        FROM $evSql JOIN med USING (event_type)
             |        GROUP BY event_type, med)
             |SELECT event_id, event_type, value,
             |  round(0.6745 * (value - med) / mad, 4) AS rz
             |FROM $evSql JOIN mad USING (event_type)
             |WHERE mad > 0 AND abs(round(0.6745 * (value - med) / mad, 4)) >= 3.5
             |ORDER BY event_id""".stripMargin)
    ),

    // Ordered conversion funnel view→click→purchase with a 24h per-stage
    // window: stage times via one co-partitioned left join + conditional
    // min per stage; `reached` is how deep each user got.
    QueryDef(
      "ev_funnel",
      (s, dir) => Events.funnel(Tables.events(s, dir), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"), maxGap = "24 HOURS")
        .orderBy("user_id"),
      Some(funnelOracleSql)
    ),

    // The SAME funnel as a per-user state machine over a stream
    // (mapGroupsWithState folding time-ordered events, O(#stages) state
    // per user) — verified against the identical batch oracle: the
    // incremental fold and the three-join batch plan must agree bit-wise.
    QueryDef(
      "ev_funnel_stream",
      (s, dir) => {
        import s.implicits._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_funnel")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("a.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val funnel = graft.streaming.StreamOps.funnelStream(
          withTs.select("event_id", "user_id", "event_type", "value", "ts")
            .as[graft.streaming.StreamOps.Event],
          Seq("view", "click", "purchase"), java.time.Duration.ofHours(24))
        val name = s"ev_funnel_${System.nanoTime()}"
        // statePartitions: stateful stream queries size their state layout
        // to the stream (one AvailableNow batch of ~100k rows → 8), not
        // the session's batch shuffle setting — every micro-batch pays one
        // state-store commit per partition per stateful operator (see
        // StreamOps.withStatePartitions)
        graft.streaming.StreamOps.runToMemory(funnel.toDF(), name,
          outputMode = "update", statePartitions = Some(8))
        // users with no stage-1 event have no row in the batch shape
        s.table(name).filter(col("reached") >= 1).orderBy("user_id")
      },
      Some(funnelOracleSql)
    ),

    // Retention cohorts: first-active day → share active k days later.
    QueryDef(
      "ev_retention",
      (s, dir) => Events.retentionCohorts(Tables.events(s, dir), "user_id", "ts")
        .orderBy("cohort_day", "k"),
      Some(s"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM $evSql),
             |cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
             |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS INT) AS k,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM days JOIN cohort USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Dense resample + gap fill: every (event_type, hour) bucket between
    // the global bounds exists in the output — empty hours carry
    // n_events=0 and the last non-null hourly sum forward. The grid is
    // built from a 1-row min/max broadcast × the type dimension (output
    // size, not a second scan); fill is one window per series.
    QueryDef(
      "ev_resample_gapfill",
      (s, dir) => Events.resampleGapFill(Tables.events(s, dir),
          "event_type", "ts", "value")
        .orderBy("event_type", "bucket_ts"),
      Some(s"""WITH b AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             |    CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS sum_value
             |  FROM $evSql GROUP BY 1, 2),
             |bounds AS (SELECT date_trunc('hour', min(ts)) AS mn,
             |                  date_trunc('hour', max(ts)) AS mx FROM $evSql),
             |g AS (SELECT t.event_type, gs.bucket_ts
             |      FROM (SELECT DISTINCT event_type FROM $evSql) t
             |      CROSS JOIN (SELECT unnest(generate_series((SELECT mn FROM bounds),
             |        (SELECT mx FROM bounds), INTERVAL 1 HOUR)) AS bucket_ts) gs),
             |j AS (SELECT g.event_type, g.bucket_ts,
             |        coalesce(b.n_events, 0) AS n_events, b.sum_value
             |      FROM g LEFT JOIN b
             |        ON g.event_type = b.event_type AND g.bucket_ts = b.bucket_ts)
             |SELECT event_type, bucket_ts, n_events, sum_value,
             |  last_value(sum_value IGNORE NULLS) OVER (PARTITION BY event_type
             |    ORDER BY bucket_ts
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
             |FROM j ORDER BY event_type, bucket_ts""".stripMargin)
    ),

    QueryDef(
      "ev_sessionize",
      (s, dir) => Events.sessionStats(Tables.events(s, dir), "user_id", "ts",
        gapMinutes = 30, tieCol = "event_id")
        .orderBy("user_id", "session_id"),
      Some(s"""WITH g AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM $evSql WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts, value,
             |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS session_start, max(ts) AS session_end,
             |  round(sum(value), 2) AS sum_value
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Interval-overlap join over session windows: concurrent sessions
    // across two user populations via the bucketed overlap join (equi-join
    // on a shared hour grid, pair emitted once in the later start cell).
    // The oracle is the direct quadratic overlap predicate.
    QueryDef(
      "ev_session_overlap",
      (s, dir) => {
        val sess = Events.sessionStats(
          Tables.events(s, dir).filter(col("user_id") < 40),
          "user_id", "ts", gapMinutes = 30, tieCol = "event_id")
        val l = sess.filter(col("user_id") < 20)
          .select(col("user_id").as("u1"), col("session_id").as("sid1"),
            col("session_start").as("ls"), col("session_end").as("le"))
        val r = sess.filter(col("user_id") >= 20)
          .select(col("user_id").as("u2"), col("session_id").as("sid2"),
            col("session_start").as("rs"), col("session_end").as("re"))
        RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", cellSeconds = 3600)
          .select(col("u1"), col("sid1"), col("u2"), col("sid2"),
            greatest(col("ls"), col("rs")).as("ov_start"),
            least(col("le"), col("re")).as("ov_end"))
          .orderBy("u1", "sid1", "u2", "sid2")
      },
      Some(s"""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM $evSql WHERE user_id < 40
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g),
             |sess AS (SELECT user_id, session_id,
             |           min(ts) AS s_start, max(ts) AS s_end FROM s GROUP BY 1, 2),
             |l AS (SELECT user_id AS u1, session_id AS sid1, s_start AS ls, s_end AS le
             |      FROM sess WHERE user_id < 20),
             |r AS (SELECT user_id AS u2, session_id AS sid2, s_start AS rs, s_end AS re
             |      FROM sess WHERE user_id >= 20)
             |SELECT u1, sid1, u2, sid2,
             |  greatest(ls, rs) AS ov_start, least(le, re) AS ov_end
             |FROM l JOIN r ON ls <= re AND rs <= le
             |ORDER BY u1, sid1, u2, sid2""".stripMargin)
    ),

    // as-of join: each event matched to the user's most recent purchase
    // at-or-before it; oracle uses DuckDB's native ASOF JOIN.
    QueryDef(
      "ev_asof_purchase",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event"), col("ts").as("p_ts"))
        AsOf.asofJoin(
          ev.select("event_id", "user_id", "ts"), purchases,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          payload = Seq("p_event", "p_ts"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
             |p AS (SELECT user_id, event_id AS p_event, ts AS p_ts FROM ev WHERE event_type = 'purchase')
             |SELECT e.event_id, e.user_id, e.ts, p.p_event, p.p_ts
             |FROM ev e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.p_ts <= e.ts
             |ORDER BY e.event_id""".stripMargin)
    ),

    // Forward as-of: the NEXT purchase at-or-after each event (time-to-
    // conversion shape); DuckDB's ASOF with a flipped inequality is the
    // oracle.
    QueryDef(
      "ev_asof_next_purchase",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event"), col("ts").as("p_ts"))
        AsOf.asofJoinForward(
          ev.select("event_id", "user_id", "ts"), purchases,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
          payload = Seq("p_event", "p_ts"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
             |p AS (SELECT user_id, event_id AS p_event, ts AS p_ts FROM ev WHERE event_type = 'purchase')
             |SELECT e.event_id, e.user_id, e.ts, p.p_event, p.p_ts
             |FROM ev e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.p_ts >= e.ts
             |ORDER BY e.event_id""".stripMargin)
    ),

    // The built-in session_window aggregation — the engine-native way to
    // get gap sessions without the manual lag/cumsum plan. Boundary
    // semantics differ from Events.sessionize by one epsilon: a gap of
    // EXACTLY the threshold starts a new session (window end exclusive),
    // so the oracle replays >= on epoch microseconds.
    QueryDef(
      "ev_session_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
      Some(sessionWindowOracleSql)
    ),

    // The SAME session_window aggregation running as a stream (complete
    // mode drains every session under AvailableNow, so the identical
    // batch oracle applies — no watermark needed when the sink holds the
    // full result).
    QueryDef(
      "ev_session_window_stream",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_sw")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val agg = withTs
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
        val name = s"ev_sw_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(agg, name,
          outputMode = "complete", statePartitions = Some(8))
        s.table(name).orderBy("user_id", "session_start")
      },
      Some(sessionWindowOracleSql)
    ),

    QueryDef(
      "ev_duration",
      (s, dir) => Events.durations(Tables.events(s, dir), "user_id", "ts")
        .orderBy("user_id"),
      Some(s"""SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
             |  round((epoch_ms(max(ts)) - epoch_ms(min(ts))) / 1000.0, 3) AS duration_sec
             |FROM $evSql GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),

    // JSON property extraction + grouped aggregation over the parsed value
    QueryDef(
      "ev_json_props",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
             |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // The streaming→Manifest composition under the oracle gate (VERDICT
    // r11 #5): events stream in TWO micro-batches (maxFilesPerTrigger=1
    // over two symlinks of the same file — every row delivered twice)
    // through manifestUpsertSink, which merges each batch by event_id
    // (last-writer-wins on ts) and publishes it as an OCC manifest
    // version carrying the batchId watermark. The duplicate delivery
    // collapses in the merge, so the versioned dataset must aggregate
    // identically to the plain events table — exactly-once end state
    // from at-least-once delivery, on the transactional layout instead
    // of upsertSink's directory swaps.
    QueryDef(
      "ev_stream_manifest_sink",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_mfup")
        for (i <- 0 to 1)
          java.nio.file.Files.createSymbolicLink(
            streamDir.resolve(s"ev$i.parquet"),
            java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val dst = java.nio.file.Files.createTempDirectory("ev_mfup_dst").toString + "/ev"
        val ckpt = graft.streaming.StreamOps.scratchDir("ev_mfup_ck").toString
        graft.streaming.StreamOps.manifestUpsertSink(withTs, dst,
          keys = Seq("event_id"), orderCol = "ts", checkpointDir = ckpt)
        Manifest.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Append-mode streaming with a watermark: the same tumbling aggregation
    // as ev_tumbling_stream, but windows are EMITTED (and their state
    // evicted) only once the watermark passes them — the bounded-state
    // shape an unbounded stream needs. With the whole file as one batch,
    // the final watermark is max(ts) - delay and AvailableNow's trailing
    // no-data batch flushes every window whose end <= watermark; the
    // oracle applies the same cutoff in SQL.
    QueryDef(
      "ev_append_stream",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_append")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val agg = graft.streaming.StreamOps.windowedCounts(
          withTs, "ts", "1 hour", "10 minutes")
        val name = s"ev_append_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(agg, name,
          outputMode = "append", statePartitions = Some(8))
        s.table(name).orderBy("window_start", "event_type")
      },
      Some("""WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM e)
             |SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n_events, round(sum(value), 2) AS sum_value
             |FROM e GROUP BY 1, 2
             |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
             |ORDER BY 1, 2""".stripMargin)
    ),

    // Streaming exact dedup with bounded state: the stream reads the events
    // file TWICE (two symlinks → every row duplicated) and
    // dropDuplicatesWithinWatermark collapses it back to the original
    // table, which the batch oracle reads once.
    QueryDef(
      "ev_dedup_stream",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_dedup")
        Seq("a", "b").foreach { n =>
          java.nio.file.Files.createSymbolicLink(
            streamDir.resolve(s"$n.parquet"),
            java.nio.file.Paths.get(s"$dir/events.parquet"))
        }
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val dedup = graft.streaming.StreamOps.dedupStream(
          withTs, Seq("event_id"), "ts", "10 minutes")
        val name = s"ev_dedup_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(dedup, name,
          outputMode = "append", statePartitions = Some(8))
        s.table(name)
          .select("event_id", "user_id", "event_type", "value", "ts")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    // Streaming sessionization parity: the flatMapGroupsWithState op emits
    // a running update per event; folding the stream's appends with
    // max(n_events) per (user, session) must reproduce the BATCH window
    // sessionization exactly — same gap rule, same (ts, event_id) order,
    // same session numbering.
    QueryDef(
      "ev_sessionize_stream",
      (s, dir) => {
        import s.implicits._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_sess")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("a.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val withTs = Tables.normalizeTs(stream, "ts")
        val sessions = graft.streaming.StreamOps.sessionizeStream(
          withTs.select("event_id", "user_id", "event_type", "value", "ts")
            .as[graft.streaming.StreamOps.Event], gapMinutes = 30)
        val name = s"ev_sess_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(sessions.toDF(), name,
          outputMode = "append", statePartitions = Some(8))
        s.table(name)
          .groupBy("user_id", "session_id")
          .agg(max("n_events").as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH g AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM $evSql WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Stream-static enrichment: every micro-batch broadcast-joins the
    // customer dimension — stateless, constant memory on an unbounded
    // stream. The batch oracle is the same inner join.
    QueryDef(
      "ev_stream_enrich",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_enrich")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("a.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        val enriched = graft.streaming.StreamOps
          .enrichStream(stream, dim, Seq("user_id" -> "c_custkey"))
          .select("event_id", "user_id", "event_type", "c_nationkey", "c_mktsegment")
        val name = s"ev_enrich_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(enriched, name, outputMode = "append")
        s.table(name).orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.event_type, c.c_nationkey, c.c_mktsegment
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |ORDER BY event_id""".stripMargin)
    ),

    // ──────────────── monitoring view (O9, reference SQL) ────────────────
    // v_etl_enabled_job_status (install/etl_tables.mysql.sql:56-64): status
    // × enabled schedules, IFNULL(end, now) duration, newest first. Fixture
    // is a literal — mirrored as VALUES rows in the oracle — because the
    // reference defines this view over its own metadata tables, not data.
    QueryDef(
      "meta_status_view",
      (s, _) => {
        import s.implicits._
        val statuses = Seq(
          ("etl_daily", "ok", Some("finished"), "2026-03-01 01:00:00", Some("2026-03-01 01:05:30")),
          ("etl_daily", "running", Some("load"), "2026-03-02 01:00:00", None),
          ("etl_weekly", "failed", None, "2026-03-01 02:00:00", Some("2026-03-01 02:00:01")),
          ("old_job", "ok", Some("x"), "2026-02-01 00:00:00", Some("2026-02-01 00:10:00")))
          .toDF("jobName", "status", "phase", "st", "et")
          .select(col("jobName"), col("status"), col("phase"),
            to_timestamp(col("st")).as("startTime"), to_timestamp(col("et")).as("endTime"))
        val schedules = Seq(
          ("etl_daily", true, 1), ("etl_weekly", true, 2), ("old_job", false, 3))
          .toDF("jobName", "isEnabled", "runOrder")
        graft.meta.Status.monitoringView(statuses, schedules,
          java.sql.Timestamp.valueOf("2026-03-02 02:00:00"))
      },
      Some("""WITH st(job_name, status, phase, start_time, end_time) AS (VALUES
             |  ('etl_daily', 'ok', 'finished', TIMESTAMP '2026-03-01 01:00:00', TIMESTAMP '2026-03-01 01:05:30'),
             |  ('etl_daily', 'running', 'load', TIMESTAMP '2026-03-02 01:00:00', NULL),
             |  ('etl_weekly', 'failed', NULL, TIMESTAMP '2026-03-01 02:00:00', TIMESTAMP '2026-03-01 02:00:01'),
             |  ('old_job', 'ok', 'x', TIMESTAMP '2026-02-01 00:00:00', TIMESTAMP '2026-02-01 00:10:00')),
             |sch(job_name, is_enabled, run_order) AS (VALUES
             |  ('etl_daily', true, 1), ('etl_weekly', true, 2), ('old_job', false, 3))
             |SELECT st.job_name AS "jobName", status, phase,
             |  start_time AS "startTime", end_time AS "endTime",
             |  round((epoch_ms(coalesce(end_time, TIMESTAMP '2026-03-02 02:00:00'))
             |         - epoch_ms(start_time)) / 1000.0, 3) AS duration_sec,
             |  run_order AS "runOrder"
             |FROM st JOIN sch ON st.job_name = sch.job_name AND sch.is_enabled
             |ORDER BY "startTime" DESC""".stripMargin)
    ),

    // ─────────────────────── multimodal plumbing ─────────────────────────
    QueryDef(
      "mm_features",
      (s, dir) => Multimodal.binaryFeatures(
        Multimodal.attachBinary(Tables.documents(s, dir), "text"), "doc_id", "content")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  md5(text) AS content_md5,
             |  lower(hex(encode(substring(text, 1, 8)))) AS head_hex
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Frame sampling over binary payloads: every 4th 64-byte frame, one
    // row per kept frame. Spark slices real binary behind the scan;
    // DuckDB 1.0 can't slice blobs, so the oracle slices the hex string
    // (2 chars/byte) — same bytes, same rows.
    QueryDef(
      "mm_frame_sample",
      (s, dir) => Multimodal.frameSample(
        Multimodal.attachBinary(
          Tables.documents(s, dir).filter(col("doc_id") % 20 === 0), "text"),
        "doc_id", "content", frameBytes = 64, stride = 4)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("n_frame_bytes"),
          lower(hex(col("frame"))).as("frame_hex"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH b AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx, octet_length(encode(text)) AS n
             |  FROM documents WHERE doc_id % 20 = 0 AND octet_length(encode(text)) > 0),
             |f AS (
             |  SELECT doc_id, hx, UNNEST(range(0, CAST(ceil(n / 64.0) AS INT))) AS frame_idx
             |  FROM b)
             |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             |  CAST(length(substring(hx, frame_idx * 128 + 1, 128)) / 2 AS BIGINT) AS n_frame_bytes,
             |  substring(hx, frame_idx * 128 + 1, 128) AS frame_hex
             |FROM f WHERE frame_idx % 4 = 0
             |ORDER BY doc_id, frame_idx""".stripMargin)
    ),

    // REAL codec work, not plumbing: each document's bytes are rendered
    // into a 16×16 8-bit grayscale PNG and decoded back through
    // javax.imageio. PNG grayscale round-trips samples bit-exactly, so
    // the decoded raster sum is predictable from the source bytes: pixel
    // i = byte[i mod n]. DuckDB can't index blobs, so the oracle reads
    // byte values out of the hex string (2 chars/byte, strpos-as-hexval).
    QueryDef(
      "mm_decode",
      (s, dir) => Multimodal.pngRoundtripStats(
        Tables.documents(s, dir), "doc_id", "text", w = 16, h = 16)
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |px AS (
             |  SELECT doc_id, hx, n, UNNEST(range(0, 256)) AS i FROM b)
             |SELECT doc_id, 16 AS width, 16 AS height, 1 AS channels,
             |  CAST(SUM(
             |    (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 1, 1)) - 1) * 16
             |  + (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 2, 1)) - 1)
             |  ) AS BIGINT) AS pixel_sum
             |FROM px GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)
    ),

    // Perceptual average-hash over the decoded raster: integer-exact
    // block-mean bits, so the oracle rebuilds the hash from the payload
    // bytes with no PNG decoder (the roundtrip is bit-exact, proven by
    // mm_decode's pixel_sum).
    QueryDef(
      "mm_phash",
      (s, dir) => Multimodal.pngAHash(
          Tables.documents(s, dir), "doc_id", "text", w = 16, h = 16, grid = 8)
        .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |px AS (
             |  SELECT doc_id,
             |    ((i // 16) // 2) * 8 + (i % 16) // 2 AS blk,
             |    (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 1, 1)) - 1) * 16
             |  + (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 2, 1)) - 1) AS v
             |  FROM b, (SELECT unnest(range(0, 256)) AS i)),
             |bs AS (SELECT doc_id, blk, SUM(v) AS s FROM px GROUP BY 1, 2),
             |tot AS (SELECT doc_id, SUM(v) AS total FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, blk,
             |  CASE WHEN s * 256 >= total * 4 THEN '1' ELSE '0' END AS bit
             |  FROM bs JOIN tot USING (doc_id))
             |SELECT doc_id, string_agg(bit, '' ORDER BY blk) AS phash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // Image near-dup pairs: banded phash join (pigeonhole over 4 quarters)
    // + exact hamming on candidates only.
    QueryDef(
      "mm_phash_pairs",
      (s, dir) => Multimodal.phashPairs(
          Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id1", "id2"),
      Some("""WITH b AS (
             |  SELECT doc_id, lower(hex(encode(text))) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |px AS (
             |  SELECT doc_id, ((i // 16) // 2) * 8 + (i % 16) // 2 AS blk,
             |    (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 1, 1)) - 1) * 16
             |  + (strpos('0123456789abcdef', substring(hx, (i % n) * 2 + 2, 1)) - 1) AS v
             |  FROM b, (SELECT unnest(range(0, 256)) AS i)),
             |bs AS (SELECT doc_id, blk, SUM(v) AS s FROM px GROUP BY 1, 2),
             |tot AS (SELECT doc_id, SUM(v) AS total FROM px GROUP BY 1),
             |bits AS (SELECT doc_id, blk,
             |  CASE WHEN s * 256 >= total * 4 THEN '1' ELSE '0' END AS bit
             |  FROM bs JOIN tot USING (doc_id)),
             |ph AS (SELECT doc_id, string_agg(bit, '' ORDER BY blk) AS phash
             |       FROM bits GROUP BY doc_id),
             |bands AS (SELECT doc_id, band, substring(phash, band*16+1, 16) AS bh, phash
             |          FROM ph, (SELECT unnest(range(0, 4)) AS band)),
             |cand AS (SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2,
             |           a.phash AS p1, b2.phash AS p2
             |         FROM bands a JOIN bands b2
             |           ON a.band = b2.band AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
             |hp AS (SELECT id1, id2,
             |         CAST(len(list_filter(range(1, 65),
             |           i -> substring(p1, i, 1) <> substring(p2, i, 1))) AS BIGINT) AS hamming
             |       FROM cand)
             |SELECT id1, id2, hamming FROM hp WHERE hamming <= 3
             |ORDER BY id1, id2""".stripMargin)
    ),

    // ─────────────── benchmark contamination (train/test leakage) ────────
    // Corpus docs sharing word 3-grams with a benchmark set (stand-in:
    // every 97th doc). Spark joins md5'd grams (fixed-width shuffle key);
    // the oracle joins the raw grams — identical pairs, md5 is injective
    // here. bench_frac = shared / benchmark-doc grams: exact int-derived
    // doubles, unrounded by the NOTES.md rule.
    QueryDef(
      "contam_pairs",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.ngramOverlap(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 3)
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(toks) - 2, 0) + 1),
              |         i -> array_to_string(toks[i:i+2], ' '))) AS grams FROM d),
              |w AS (SELECT DISTINCT doc_id, gram FROM sh, UNNEST(sh.grams) AS g(gram)),
              |c AS (SELECT doc_id, gram FROM w WHERE doc_id % 97 <> 0),
              |b AS (SELECT doc_id AS bench_id, gram FROM w WHERE doc_id % 97 = 0),
              |bsz AS (SELECT bench_id, count(*) AS bench_grams FROM b GROUP BY 1),
              |ov AS (SELECT c.doc_id, b.bench_id, count(*) AS n_shared
              |       FROM c JOIN b ON c.gram = b.gram GROUP BY 1, 2)
              |SELECT ov.doc_id, ov.bench_id, n_shared, bench_grams,
              |  CAST(n_shared AS DOUBLE) / bench_grams AS bench_frac
              |FROM ov JOIN bsz ON ov.bench_id = bsz.bench_id
              |ORDER BY ov.doc_id, ov.bench_id""".stripMargin)
    ),

    // Doc-level quarantine list: ≥2 shared 3-grams with any benchmark doc.
    QueryDef(
      "contam_docs",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.contaminatedDocs(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 3, minShared = 2L)
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(toks) - 2, 0) + 1),
              |         i -> array_to_string(toks[i:i+2], ' '))) AS grams FROM d),
              |w AS (SELECT DISTINCT doc_id, gram FROM sh, UNNEST(sh.grams) AS g(gram)),
              |c AS (SELECT doc_id, gram FROM w WHERE doc_id % 97 <> 0),
              |b AS (SELECT doc_id AS bench_id, gram FROM w WHERE doc_id % 97 = 0),
              |bsz AS (SELECT bench_id, count(*) AS bench_grams FROM b GROUP BY 1),
              |ov AS (SELECT c.doc_id, b.bench_id, count(*) AS n_shared
              |       FROM c JOIN b ON c.gram = b.gram GROUP BY 1, 2)
              |SELECT doc_id, count(*) AS n_bench_hits,
              |  CAST(sum(n_shared) AS BIGINT) AS total_shared,
              |  max(CAST(n_shared AS DOUBLE) / bench_grams) AS max_bench_frac
              |FROM ov JOIN bsz ON ov.bench_id = bsz.bench_id
              |WHERE n_shared >= 2
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // The decontamination step itself: the corpus minus the quarantine
    // list — detection composed with the anti join a pipeline actually
    // runs before training.
    QueryDef(
      "contam_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.decontaminate(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 3, minShared = 2L)
          .select(col("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(toks) - 2, 0) + 1),
              |         i -> array_to_string(toks[i:i+2], ' '))) AS grams FROM d),
              |w AS (SELECT DISTINCT doc_id, gram FROM sh, UNNEST(sh.grams) AS g(gram)),
              |c AS (SELECT doc_id, gram FROM w WHERE doc_id % 97 <> 0),
              |b AS (SELECT doc_id AS bench_id, gram FROM w WHERE doc_id % 97 = 0),
              |ov AS (SELECT c.doc_id, b.bench_id, count(*) AS n_shared
              |       FROM c JOIN b ON c.gram = b.gram GROUP BY 1, 2),
              |bad AS (SELECT DISTINCT doc_id FROM ov WHERE n_shared >= 2)
              |SELECT doc_id FROM documents
              |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
              |ORDER BY doc_id""".stripMargin)
    ),

    // In-flight contamination: the corpus side is a document STREAM; the
    // benchmark gram set (static, broadcast, carrying per-doc totals) is
    // joined BEFORE the single streaming aggregation, so the whole check
    // is legal structured streaming (no post-agg stream-static join) and
    // the batch oracle verifies it verbatim.
    QueryDef(
      "contam_stream",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val streamDir = java.nio.file.Files.createTempDirectory("contamstream")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("documents.parquet"),
          java.nio.file.Paths.get(s"$dir/documents.parquet"))
        val stream = s.readStream.schema(docs.schema).parquet(streamDir.toString)
        val out = Contamination.ngramOverlap(
          stream.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 3)
        val name = s"contam_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(out, name,
          outputMode = "complete", statePartitions = Some(8))
        s.table(name).orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(toks) - 2, 0) + 1),
              |         i -> array_to_string(toks[i:i+2], ' '))) AS grams FROM d),
              |w AS (SELECT DISTINCT doc_id, gram FROM sh, UNNEST(sh.grams) AS g(gram)),
              |c AS (SELECT doc_id, gram FROM w WHERE doc_id % 97 <> 0),
              |b AS (SELECT doc_id AS bench_id, gram FROM w WHERE doc_id % 97 = 0),
              |bsz AS (SELECT bench_id, count(*) AS bench_grams FROM b GROUP BY 1),
              |ov AS (SELECT c.doc_id, b.bench_id, count(*) AS n_shared
              |       FROM c JOIN b ON c.gram = b.gram GROUP BY 1, 2)
              |SELECT ov.doc_id, ov.bench_id, n_shared, bench_grams,
              |  CAST(n_shared AS DOUBLE) / bench_grams AS bench_frac
              |FROM ov JOIN bsz ON ov.bench_id = bsz.bench_id
              |ORDER BY ov.doc_id, ov.bench_id""".stripMargin)
    ),

    // ─────────── intra-document repetition (Gopher-style drop rules) ─────
    QueryDef(
      "text_repetition",
      (s, dir) => TextAnalysis.repetitionFeatures(
        Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT doc_id, toks, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
              |    i -> array_to_string(toks[i:i+2], ' ')) AS g3
              |  FROM d),
              |tc AS (SELECT doc_id, max(c) AS mc FROM (
              |    SELECT doc_id, tok, count(*) AS c
              |    FROM g, UNNEST(g.toks) AS t(tok) GROUP BY 1, 2) GROUP BY 1)
              |SELECT g.doc_id, CAST(nt AS BIGINT) AS n_tokens,
              |  CASE WHEN len(g2) > 0
              |    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
              |    ELSE 0.0 END AS dup_2gram_frac,
              |  CASE WHEN len(g3) > 0
              |    THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
              |    ELSE 0.0 END AS dup_3gram_frac,
              |  coalesce(CAST(mc AS DOUBLE) / nt, 0.0) AS top_token_frac
              |FROM g LEFT JOIN tc ON g.doc_id = tc.doc_id
              |ORDER BY g.doc_id""".stripMargin)
    ),

    // ───────────── C4-style cross-document line dedup ────────────────────
    // Fixed 8-token "lines" (the corpus has no newlines); any line present
    // in more than one document is boilerplate and dropped everywhere;
    // docs reassemble from surviving lines in order. Spark shuffles line
    // md5s, the oracle joins raw lines — identical rows.
    QueryDef(
      "dedup_lines",
      (s, dir) => Dedup.dedupLines(Tables.documents(s, dir), "doc_id", "text",
        tokensPerLine = 8)
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |ln AS (SELECT doc_id, i AS line_no,
              |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS line
              |       FROM d, UNNEST(range(0, CAST(ceil(len(toks) / 8.0) AS INT))) AS r(i)),
              |dup AS (SELECT line FROM ln GROUP BY line HAVING count(DISTINCT doc_id) > 1),
              |kept AS (SELECT doc_id, line_no, line FROM ln
              |         WHERE line NOT IN (SELECT line FROM dup)),
              |agg AS (SELECT doc_id, count(*) AS n_kept,
              |          string_agg(line, ' ' ORDER BY line_no) AS clean_text
              |        FROM kept GROUP BY doc_id),
              |tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id)
              |SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
              |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
              |  coalesce(a.clean_text, '') AS clean_text
              |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
              |ORDER BY t.doc_id""".stripMargin)
    ),

    // ExactSubstr-style span REMOVAL (Lee et al. 2021) at 3-token-gram
    // granularity: any position covered by a gram occurring ≥2× in the
    // corpus slice (cross-doc or within-doc) is dropped; docs reassemble
    // from surviving positions in order. Catches duplicated runs at ANY
    // alignment where dedup_lines only sees fixed chunk boundaries.
    QueryDef(
      "dedup_span_removal",
      (s, dir) => Dedup.removeDuplicateSpans(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3)
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents
              |           WHERE doc_id % 10 = 0),
              |g AS (SELECT doc_id, i AS gpos,
              |        md5(array_to_string(toks[i:i+2], ' ')) AS gh
              |      FROM d, UNNEST(range(1, greatest(len(toks) - 2, 0) + 1)) AS t(i)),
              |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
              |cov AS (SELECT DISTINCT doc_id, gpos + off AS pos
              |        FROM g JOIN dup USING (gh), UNNEST(range(0, 3)) AS o(off)),
              |p AS (SELECT doc_id, i AS pos, toks[i] AS tok
              |      FROM d, UNNEST(range(1, len(toks) + 1)) AS t(i)),
              |kept AS (SELECT p.doc_id, count(*) AS n_kept,
              |           string_agg(p.tok, ' ' ORDER BY p.pos) AS clean_text
              |         FROM p WHERE NOT EXISTS (
              |           SELECT 1 FROM cov c
              |           WHERE c.doc_id = p.doc_id AND c.pos = p.pos)
              |         GROUP BY 1),
              |tot AS (SELECT doc_id, len(toks) AS n_tokens FROM d)
              |SELECT t.doc_id, CAST(t.n_tokens AS INT) AS n_tokens,
              |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
              |  coalesce(k.clean_text, '') AS clean_text
              |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
              |ORDER BY t.doc_id""".stripMargin)
    ),

    // Lee et al.'s actual removal rule: all-but-one — the globally first
    // occurrence of each duplicated gram survives, later copies drop.
    QueryDef(
      "dedup_span_keep_first",
      (s, dir) => Dedup.removeDuplicateSpans(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, keepFirst = true)
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents
              |           WHERE doc_id % 10 = 0),
              |g AS (SELECT doc_id, i AS gpos,
              |        md5(array_to_string(toks[i:i+2], ' ')) AS gh
              |      FROM d, UNNEST(range(1, greatest(len(toks) - 2, 0) + 1)) AS t(i)),
              |dg AS (SELECT doc_id, gpos,
              |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, gpos) AS rk,
              |         count(*) OVER (PARTITION BY gh) AS cnt
              |       FROM g),
              |cov AS (SELECT DISTINCT doc_id, gpos + off AS pos
              |        FROM dg, UNNEST(range(0, 3)) AS o(off)
              |        WHERE cnt >= 2 AND rk > 1),
              |p AS (SELECT doc_id, i AS pos, toks[i] AS tok
              |      FROM d, UNNEST(range(1, len(toks) + 1)) AS t(i)),
              |kept AS (SELECT p.doc_id, count(*) AS n_kept,
              |           string_agg(p.tok, ' ' ORDER BY p.pos) AS clean_text
              |         FROM p WHERE NOT EXISTS (
              |           SELECT 1 FROM cov c
              |           WHERE c.doc_id = p.doc_id AND c.pos = p.pos)
              |         GROUP BY 1),
              |tot AS (SELECT doc_id, len(toks) AS n_tokens FROM d)
              |SELECT t.doc_id, CAST(t.n_tokens AS INT) AS n_tokens,
              |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
              |  coalesce(k.clean_text, '') AS clean_text
              |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
              |ORDER BY t.doc_id""".stripMargin)
    ),

    // ───────────── composite quality gate (keep/drop + reason) ───────────
    QueryDef(
      "quality_filter",
      (s, dir) => TextAnalysis.qualityFilter(Tables.documents(s, dir),
        "doc_id", "text", minTokens = 30, maxDup2Frac = 0.08,
        minMeanTokenLen = 3.8, maxMeanTokenLen = 5.2, minStopwordRatio = 0.02)
        .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |m AS (SELECT doc_id, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_sum(list_transform(toks, t -> length(t))) AS tchars,
              |  len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS nstop
              |  FROM d),
              |r AS (SELECT doc_id, nt,
              |  CASE WHEN nt < 30 THEN 'too_short'
              |       WHEN len(g2) > 0 AND 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) > 0.08 THEN 'repetitive'
              |       WHEN CAST(tchars AS DOUBLE) / nt < 3.8 OR CAST(tchars AS DOUBLE) / nt > 5.2 THEN 'token_len'
              |       WHEN CAST(nstop AS DOUBLE) / nt < 0.02 THEN 'no_stopwords'
              |       ELSE 'ok' END AS reason
              |  FROM m)
              |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, reason,
              |  reason = 'ok' AS keep
              |FROM r ORDER BY doc_id""".stripMargin)
    ),

    // Streaming corpus prep: the quality gate applied to a document
    // FIREHOSE — stateless column math runs unchanged under readStream
    // (append mode, no state store), so in-flight filtering costs the
    // same as the batch scan and the batch oracle verifies it verbatim.
    QueryDef(
      "doc_quality_stream",
      (s, dir) => {
        val raw = s.read.parquet(s"$dir/documents.parquet")
        // FileStreamSource needs a directory: symlink the single-file table
        val streamDir = java.nio.file.Files.createTempDirectory("docstream")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("documents.parquet"),
          java.nio.file.Paths.get(s"$dir/documents.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val gated = TextAnalysis.qualityFilter(stream, "doc_id", "text",
          minTokens = 30, maxDup2Frac = 0.08,
          minMeanTokenLen = 3.8, maxMeanTokenLen = 5.2, minStopwordRatio = 0.02)
        val name = s"doc_quality_${System.nanoTime()}"
        graft.streaming.StreamOps.runToMemory(gated, name, outputMode = "append")
        s.table(name).orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |m AS (SELECT doc_id, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_sum(list_transform(toks, t -> length(t))) AS tchars,
              |  len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS nstop
              |  FROM d),
              |r AS (SELECT doc_id, nt,
              |  CASE WHEN nt < 30 THEN 'too_short'
              |       WHEN len(g2) > 0 AND 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) > 0.08 THEN 'repetitive'
              |       WHEN CAST(tchars AS DOUBLE) / nt < 3.8 OR CAST(tchars AS DOUBLE) / nt > 5.2 THEN 'token_len'
              |       WHEN CAST(nstop AS DOUBLE) / nt < 0.02 THEN 'no_stopwords'
              |       ELSE 'ok' END AS reason
              |  FROM m)
              |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, reason,
              |  reason = 'ok' AS keep
              |FROM r ORDER BY doc_id""".stripMargin)
    ),

    // ─────────── flagship composition: corpus prep end-to-end ───────────
    // quality gate → line dedup → exact dedup on cleaned text →
    // contamination quarantine → shard assignment. One disposition per
    // corpus doc. The oracle replays every stage from the verified pieces
    // above (quality CASE, line-dedup CTEs, md5-of-clean-text groups,
    // contamination join, md5 shard buckets).
    QueryDef(
      "prep_pipeline",
      (s, dir) => {
        val all = Tables.documents(s, dir)
        Prep.prepPipeline(
          all.filter(col("doc_id") % 97 =!= 0),
          all.filter(col("doc_id") % 97 === 0),
          "doc_id", "text",
          minTokens = 30, maxDup2Frac = 0.08,
          minMeanTokenLen = 3.8, maxMeanTokenLen = 5.2, minStopwordRatio = 0.02,
          tokensPerLine = 8, contamN = 3, minShared = 2L, nShards = 8)
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, $toksSql AS toks FROM documents
              |          WHERE doc_id % 97 <> 0),
              |m AS (SELECT doc_id, toks, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_sum(list_transform(toks, t -> length(t))) AS tchars,
              |  len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS nstop
              |  FROM d),
              |q AS (SELECT doc_id, toks,
              |  CASE WHEN nt < 30 THEN 'too_short'
              |       WHEN len(g2) > 0 AND 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) > 0.08 THEN 'repetitive'
              |       WHEN CAST(tchars AS DOUBLE) / nt < 3.8 OR CAST(tchars AS DOUBLE) / nt > 5.2 THEN 'token_len'
              |       WHEN CAST(nstop AS DOUBLE) / nt < 0.02 THEN 'no_stopwords'
              |       ELSE 'ok' END AS reason
              |  FROM m),
              |p AS (SELECT doc_id, toks FROM q WHERE reason = 'ok'),
              |ln AS (SELECT doc_id, i AS line_no,
              |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS line
              |       FROM p, UNNEST(range(0, CAST(ceil(len(toks) / 8.0) AS INT))) AS r(i)),
              |ldup AS (SELECT line FROM ln GROUP BY line HAVING count(DISTINCT doc_id) > 1),
              |lkept AS (SELECT doc_id, line_no, line FROM ln
              |          WHERE line NOT IN (SELECT line FROM ldup)),
              |agg AS (SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS clean_text
              |        FROM lkept GROUP BY doc_id),
              |fp AS (SELECT p.doc_id, md5(coalesce(a.clean_text, '')) AS fp
              |       FROM p LEFT JOIN agg a ON p.doc_id = a.doc_id),
              |keep AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp),
              |bsh AS (SELECT doc_id, list_distinct(list_transform(
              |          range(1, greatest(len(toks) - 2, 0) + 1),
              |          i -> array_to_string(toks[i:i+2], ' '))) AS grams
              |        FROM (SELECT doc_id, $toksSql AS toks FROM documents
              |              WHERE doc_id % 97 = 0)),
              |bw AS (SELECT DISTINCT doc_id AS bench_id, gram
              |       FROM bsh, UNNEST(bsh.grams) AS g(gram)),
              |csh AS (SELECT p.doc_id, list_distinct(list_transform(
              |          range(1, greatest(len(p.toks) - 2, 0) + 1),
              |          i -> array_to_string(p.toks[i:i+2], ' '))) AS grams FROM p),
              |cw AS (SELECT DISTINCT doc_id, gram FROM csh, UNNEST(csh.grams) AS g(gram)),
              |ov AS (SELECT cw.doc_id, bw.bench_id, count(*) AS n_shared
              |       FROM cw JOIN bw ON cw.gram = bw.gram GROUP BY 1, 2),
              |contam AS (SELECT DISTINCT doc_id FROM ov WHERE n_shared >= 2),
              |st AS (SELECT q.doc_id,
              |  CASE WHEN q.reason <> 'ok' THEN q.reason
              |       WHEN f.doc_id <> k.keep_id THEN 'exact_dup'
              |       WHEN c.doc_id IS NOT NULL THEN 'contaminated'
              |       ELSE 'kept' END AS status,
              |  md5(CAST(q.doc_id AS VARCHAR)) AS hh
              |  FROM q
              |  LEFT JOIN fp f ON q.doc_id = f.doc_id
              |  LEFT JOIN keep k ON f.fp = k.fp
              |  LEFT JOIN contam c ON q.doc_id = c.doc_id)
              |SELECT doc_id, status,
              |  CASE WHEN status = 'kept' THEN ($hashBucketSql) % 8
              |       ELSE NULL END AS shard
              |FROM st ORDER BY doc_id""".stripMargin)
    ),

    // ───── capstone composition: the full LLM training-data pipeline ─────
    // The way a real pipeline actually runs the r7/r8 operators, as ONE
    // dataflow: quality gate → cross-doc line dedup → verbatim span
    // removal (keep-first) → near-dup clustering with quality-aware
    // survivor selection → benchmark decontamination → split assignment +
    // sequence packing. Column contracts between operators only surface
    // under composition — each stage consumes the previous stage's
    // OUTPUT text/token counts, not the raw corpus. One disposition row
    // per corpus doc; packing metadata only for final survivors. The
    // oracle replays every stage from the individually-verified CTE
    // pieces, chained the same way.
    QueryDef(
      "pipeline_end_to_end",
      (s, dir) => {
        // the dataflow lives in Prep.corpusPipeline — shared verbatim
        // with the orchestrated CorpusPipelineJob (phases per stage,
        // batch audit, status row), so the CLI-run job produces exactly
        // the disposition this oracle verifies
        val all = Tables.documents(s, dir)
        Prep.corpusPipeline(
          all.filter(col("doc_id") % 10 === 0),
          all.filter(col("doc_id") % 97 === 0),
          "doc_id", "text")
      },
      Some(s"""WITH RECURSIVE
              |d AS (SELECT doc_id, text, $toksSql AS toks FROM documents
              |      WHERE doc_id % 10 = 0),
              |m AS (SELECT doc_id, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_sum(list_transform(toks, t -> length(t))) AS tchars,
              |  len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS nstop
              |  FROM d),
              |q AS (SELECT doc_id,
              |  CASE WHEN nt < 30 THEN 'too_short'
              |       WHEN len(g2) > 0 AND 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) > 0.08 THEN 'repetitive'
              |       WHEN CAST(tchars AS DOUBLE) / nt < 3.8 OR CAST(tchars AS DOUBLE) / nt > 5.2 THEN 'token_len'
              |       WHEN CAST(nstop AS DOUBLE) / nt < 0.02 THEN 'no_stopwords'
              |       ELSE 'ok' END AS reason
              |  FROM m),
              |p AS (SELECT d.doc_id, d.toks FROM d JOIN q USING (doc_id)
              |      WHERE q.reason = 'ok'),
              |ln AS (SELECT doc_id, i AS line_no,
              |         array_to_string(toks[(i*8+1):(i*8+8)], ' ') AS line
              |       FROM p, UNNEST(range(0, CAST(ceil(len(toks) / 8.0) AS INT))) AS r(i)),
              |ldup AS (SELECT line FROM ln GROUP BY line HAVING count(DISTINCT doc_id) > 1),
              |lagg AS (SELECT doc_id, count(*) AS n_kept,
              |           string_agg(line, ' ' ORDER BY line_no) AS clean_text
              |         FROM ln WHERE line NOT IN (SELECT line FROM ldup)
              |         GROUP BY doc_id),
              |l2 AS (SELECT doc_id, string_split(clean_text, ' ') AS toks FROM lagg),
              |g AS (SELECT doc_id, i AS gpos,
              |        md5(array_to_string(toks[i:i+2], ' ')) AS gh
              |      FROM l2, UNNEST(range(1, greatest(len(toks) - 2, 0) + 1)) AS t(i)),
              |dg AS (SELECT doc_id, gpos,
              |         row_number() OVER (PARTITION BY gh ORDER BY doc_id, gpos) AS rk,
              |         count(*) OVER (PARTITION BY gh) AS cnt
              |       FROM g),
              |cov AS (SELECT DISTINCT doc_id, gpos + off AS pos
              |        FROM dg, UNNEST(range(0, 3)) AS o(off)
              |        WHERE cnt >= 2 AND rk > 1),
              |pp AS (SELECT doc_id, i AS pos, toks[i] AS tok
              |       FROM l2, UNNEST(range(1, len(toks) + 1)) AS t(i)),
              |sk AS (SELECT pp.doc_id, count(*) AS n_tokens,
              |         string_agg(pp.tok, ' ' ORDER BY pp.pos) AS clean2
              |       FROM pp WHERE NOT EXISTS (
              |         SELECT 1 FROM cov c
              |         WHERE c.doc_id = pp.doc_id AND c.pos = pp.pos)
              |       GROUP BY 1),
              |s2 AS (SELECT doc_id, n_tokens, string_split(clean2, ' ') AS toks FROM sk),
              |w AS (SELECT DISTINCT doc_id, tok FROM s2, UNNEST(s2.toks) AS t(tok)),
              |sz AS (SELECT doc_id, count(*) AS szv FROM w GROUP BY doc_id),
              |cm AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common
              |       FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
              |       GROUP BY 1, 2),
              |jp AS (SELECT id1, id2 FROM (
              |         SELECT id1, id2,
              |           round(CAST(common AS DOUBLE) / (s1.szv + s2x.szv - common), 4) AS j
              |         FROM cm JOIN sz s1 ON s1.doc_id = id1
              |         JOIN sz s2x ON s2x.doc_id = id2)
              |       WHERE j >= 0.5),
              |edges AS (SELECT id1 AS src, id2 AS dst FROM jp
              |          UNION SELECT id2, id1 FROM jp),
              |reach(id, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
              |cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
              |asg AS (SELECT s2.doc_id, coalesce(cc.cluster_id, s2.doc_id) AS cluster_id,
              |          s2.n_tokens
              |        FROM s2 LEFT JOIN cc ON cc.id = s2.doc_id),
              |rn AS (SELECT doc_id, n_tokens,
              |         row_number() OVER (PARTITION BY cluster_id
              |           ORDER BY n_tokens DESC, doc_id ASC) AS rk
              |       FROM asg),
              |kb AS (SELECT doc_id, n_tokens FROM rn WHERE rk = 1),
              |bsh AS (SELECT doc_id, list_distinct(list_transform(
              |          range(1, greatest(len(toks) - 2, 0) + 1),
              |          i -> array_to_string(toks[i:i+2], ' '))) AS grams
              |        FROM (SELECT doc_id, $toksSql AS toks FROM documents
              |              WHERE doc_id % 97 = 0)),
              |bw AS (SELECT DISTINCT doc_id AS bench_id, gram
              |       FROM bsh, UNNEST(bsh.grams) AS g2(gram)),
              |csh AS (SELECT s2.doc_id, list_distinct(list_transform(
              |          range(1, greatest(len(s2.toks) - 2, 0) + 1),
              |          i -> array_to_string(s2.toks[i:i+2], ' '))) AS grams
              |        FROM s2 JOIN kb USING (doc_id)),
              |cw AS (SELECT DISTINCT doc_id, gram
              |       FROM csh, UNNEST(csh.grams) AS g3(gram)),
              |ov AS (SELECT cw.doc_id, bw.bench_id, count(*) AS n_shared
              |       FROM cw JOIN bw ON cw.gram = bw.gram GROUP BY 1, 2),
              |contam AS (SELECT DISTINCT doc_id FROM ov WHERE n_shared >= 2),
              |surv AS (SELECT kb.doc_id, kb.n_tokens FROM kb
              |         WHERE kb.doc_id NOT IN (SELECT doc_id FROM contam)),
              |b2 AS (SELECT doc_id, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS hh
              |       FROM surv),
              |k2 AS (SELECT doc_id, n_tokens,
              |         CAST(($hashBucketSql) % 8 AS INTEGER) AS shard,
              |         $hashBucketSql AS bucket FROM b2),
              |o2 AS (SELECT doc_id, n_tokens, shard, bucket,
              |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
              |  FROM k2),
              |fin AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, shard, start_tok,
              |  CAST(floor(start_tok / 256.0) AS BIGINT) AS chunk_first,
              |  CAST(floor(greatest(start_tok + n_tokens - 1, start_tok) / 256.0) AS BIGINT) AS chunk_last,
              |  $splitCaseSql AS split FROM o2)
              |SELECT q.doc_id,
              |  CASE WHEN q.reason <> 'ok' THEN q.reason
              |       WHEN lagg.doc_id IS NULL THEN 'boilerplate'
              |       WHEN sk.doc_id IS NULL THEN 'span_empty'
              |       WHEN kb.doc_id IS NULL THEN 'near_dup'
              |       WHEN fin.doc_id IS NULL THEN 'contaminated'
              |       ELSE 'kept' END AS status,
              |  fin.split, fin.shard, fin.n_tokens, fin.start_tok,
              |  fin.chunk_first, fin.chunk_last
              |FROM q
              |LEFT JOIN lagg ON q.doc_id = lagg.doc_id
              |LEFT JOIN sk ON q.doc_id = sk.doc_id
              |LEFT JOIN kb ON q.doc_id = kb.doc_id
              |LEFT JOIN fin ON q.doc_id = fin.doc_id
              |ORDER BY q.doc_id""".stripMargin)
    ),

    // ───────────────────────── data profiling ────────────────────────────
    // One-pass column profile (the pre-ingest audit a pipeline runs before
    // trusting a new feed). The average goes through an exact decimal sum
    // (money-sum rule: a 1e9-magnitude double fold is order-dependent).
    QueryDef(
      "profile_orders",
      (s, dir) => Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        sum(col("o_totalprice").isNull.cast("long")).as("null_totalprice"),
        min("o_orderdate").as("min_date"),
        max("o_orderdate").as("max_date"),
        (sum(col("o_totalprice").cast("decimal(12,2)")).cast("double") /
          count(lit(1))).as("avg_totalprice")),
      Some("""SELECT count(*) AS n_rows,
             |  count(DISTINCT o_custkey) AS d_custkey,
             |  count(DISTINCT o_orderstatus) AS d_status,
             |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
             |  min(o_orderdate) AS min_date,
             |  max(o_orderdate) AS max_date,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_totalprice
             |FROM orders""".stripMargin)
    ),

    // Grouped top-n through the native heap aggregate: the exchange
    // carries groups×n rows (map-side partial agg), not the table sorted
    // — vs the window formulation w1_window_rank exercises.
    QueryDef(
      "topn_orders_by_priority",
      (s, dir) => TopN.topNPerGroup(Tables.orders(s, dir),
          Seq("o_orderpriority"), col("o_totalprice"), col("o_orderkey"), n = 3)
        .orderBy("o_orderpriority", "rank"),
      Some("""SELECT o_orderpriority,
             |  CAST(row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank,
             |  o_orderkey AS id, o_totalprice AS score
             |FROM orders
             |QUALIFY rank <= 3
             |ORDER BY o_orderpriority, rank""".stripMargin)
    ),

    // Declarative data-quality gate: every expectation evaluated in ONE
    // scan (nulls, key uniqueness, bounds, accepted values) with the
    // verdicts unpivoted from the single agg row. Bounds(l_quantity ≤ 40)
    // deliberately fails so both verdict branches are exercised.
    QueryDef(
      "check_lineitem",
      (s, dir) => Checks.run(Tables.lineitem(s, dir), Seq(
          Checks.NotNull("l_quantity"),
          Checks.Unique(Seq("l_orderkey", "l_linenumber")),
          Checks.Bounds("l_quantity", 1.0, 40.0),
          Checks.Bounds("l_discount", 0.0, 0.1),
          Checks.AcceptedValues("l_returnflag", Seq("A", "N", "R"))))
        .orderBy("check_name", "col_name"),
      Some("""WITH a AS (SELECT
             |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS o0,
             |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) AS o1,
             |  CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 40.0 THEN 1 ELSE 0 END) AS DOUBLE) AS o2,
             |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS DOUBLE) AS o3,
             |  CAST(sum(CASE WHEN l_returnflag IS NOT NULL
             |                 AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS DOUBLE) AS o4
             |FROM lineitem)
             |SELECT * FROM (
             |  SELECT 'not_null' AS check_name, 'l_quantity' AS col_name, o0 AS observed, o0 <= 0.0 AS passed FROM a
             |  UNION ALL
             |  SELECT 'unique', 'l_orderkey,l_linenumber', o1, o1 = 0.0 FROM a
             |  UNION ALL
             |  SELECT 'bounds', 'l_quantity', o2, o2 = 0.0 FROM a
             |  UNION ALL
             |  SELECT 'bounds', 'l_discount', o3, o3 = 0.0 FROM a
             |  UNION ALL
             |  SELECT 'accepted_values', 'l_returnflag', o4, o4 = 0.0 FROM a)
             |ORDER BY check_name, col_name""".stripMargin)
    ),

    // One-pass Pearson correlation matrix from decimal-exact sums.
    QueryDef(
      "profile_corr",
      (s, dir) => Profile.correlations(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_x", "col_y"),
      Some {
        // DECIMAL(19,4) operands: DuckDB sizes a product at p1+p2 capped
        // to 38 — (15,4)² infers an int64 intermediate that overflows;
        // 19 digits forces the hugeint path. Values are identical to the
        // Spark side's decimal(15,4)² products (both exact at scale 8).
        def d(c: String) = s"CAST($c AS DECIMAL(19,4))"
        def sums(c: String) =
          s"CAST(sum(${d(c)}) AS DOUBLE) AS s_$c, " +
            s"CAST(sum(CAST(${d(c)} * ${d(c)} AS DECIMAL(38,8))) AS DOUBLE) AS ss_$c"
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
          yield (cols(i), cols(j))
        val sp = pairs.map { case (a, b) =>
          s"CAST(sum(CAST(${d(a)} * ${d(b)} AS DECIMAL(38,8))) AS DOUBLE) AS sp_${a}_$b"
        }.mkString(", ")
        val arms = pairs.map { case (a, b) =>
          s"""SELECT '$a' AS col_x, '$b' AS col_y,
             |  round((n * sp_${a}_$b - s_$a * s_$b) /
             |    (sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b)), 6) AS r
             |FROM agg""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH agg AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS n,
           |    ${cols.map(sums).mkString(", ")}, $sp
           |  FROM lineitem)
           |$arms
           |ORDER BY col_x, col_y""".stripMargin
      }
    ),

    // Distribution-drift monitor: PSI between pre-1998 and 1998+ orders
    // over fixed totalprice buckets. Fixed edges (not data-derived
    // quantiles) keep the buckets engine-portable; the psi_term sum is
    // the drift alarm.
    QueryDef(
      "profile_drift_psi",
      (s, dir) => Profile.driftPsi(Tables.orders(s, dir),
          col("o_totalprice"),
          col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"),
          col("o_orderdate") >= expr("timestamp'1998-01-01 00:00:00'"),
          bucketWidth = 50000.0, maxBucket = 9)
        .orderBy("bucket"),
      Some("""WITH b AS (
             |  SELECT least(CAST(floor(o_totalprice / 50000.0) AS INT), 9) AS bucket,
             |    CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01') AS DOUBLE) AS na,
             |    CAST(count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS DOUBLE) AS nb
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM b)
             |SELECT bucket,
             |  round(na / (SELECT ta FROM tot), 6) AS p,
             |  round(nb / (SELECT tb FROM tot), 6) AS q,
             |  round((na / (SELECT ta FROM tot) - nb / (SELECT tb FROM tot)) *
             |    ln((na / (SELECT ta FROM tot)) / (nb / (SELECT tb FROM tot))), 6) AS psi_term
             |FROM b WHERE na > 0 AND nb > 0 ORDER BY bucket""".stripMargin)
    ),

    // Generic multi-column profile: every column's metrics in ONE agg
    // pass, unpivoted AFTER aggregation (stack multiplies #cols rows,
    // never the table). exactDistinct = true ONLY here — the oracle
    // compares exact cardinalities; the operator's production default is
    // the HLL sketch (no Expand, no rows×#cols intermediate).
    QueryDef(
      "profile_columns",
      (s, dir) => Profile.profileNumeric(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exactDistinct = true)
        .orderBy("col_name"),
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
             |  CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / CAST(count($c) AS DOUBLE) AS mean_v
             |FROM lineitem""".stripMargin
        Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }
    ),

    // Equal-width histogram: a codegen'd bucket projection + one hash-agg —
    // value-distribution profiling with no sort and no sketch.
    QueryDef(
      "hist_totalprice",
      (s, dir) => Tables.orders(s, dir)
        .select(least(floor(col("o_totalprice") / 50000).cast("int"), lit(9)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_orders"))
        .orderBy("bucket"),
      Some("""SELECT least(CAST(floor(o_totalprice / 50000) AS INTEGER), 9) AS bucket,
             |  count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)
    ),

    // Quality-gate rollup per source: which feeds produce droppable docs,
    // and why — the triage view over the composite filter.
    QueryDef(
      "quality_by_source",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.qualityFilter(docs, "doc_id", "text",
          minTokens = 30, maxDup2Frac = 0.08,
          minMeanTokenLen = 3.8, maxMeanTokenLen = 5.2, minStopwordRatio = 0.02)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("source", "reason")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "reason")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
              |m AS (SELECT doc_id, source, len(toks) AS nt,
              |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
              |    i -> array_to_string(toks[i:i+1], ' ')) AS g2,
              |  list_sum(list_transform(toks, t -> length(t))) AS tchars,
              |  len(list_filter(toks, t -> t IN (${sqlList(TextAnalysis.DefaultStopwords)}))) AS nstop
              |  FROM d),
              |r AS (SELECT source,
              |  CASE WHEN nt < 30 THEN 'too_short'
              |       WHEN len(g2) > 0 AND 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) > 0.08 THEN 'repetitive'
              |       WHEN CAST(tchars AS DOUBLE) / nt < 3.8 OR CAST(tchars AS DOUBLE) / nt > 5.2 THEN 'token_len'
              |       WHEN CAST(nstop AS DOUBLE) / nt < 0.02 THEN 'no_stopwords'
              |       ELSE 'ok' END AS reason
              |  FROM m)
              |SELECT source, reason, count(*) AS n_docs
              |FROM r GROUP BY source, reason
              |ORDER BY source, reason""".stripMargin)
    ),

    // ───────────────── hash-sharded training export layout ───────────────
    QueryDef(
      "export_shards",
      (s, dir) => Tables.documents(s, dir)
        .select(Sampling.shardColumn(col("doc_id"), 8).as("shard"), col("n_chars"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("shard"),
      Some(s"""WITH b AS (SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
              |k AS (SELECT n_chars, ($hashBucketSql) % 8 AS shard FROM b)
              |SELECT shard, count(*) AS n_docs,
              |  CAST(sum(n_chars) AS BIGINT) AS total_chars
              |FROM k GROUP BY shard ORDER BY shard""".stripMargin)
    ),

    // Sequence packing: concatenate docs in id order WITHIN each shard,
    // cut into 256-token training sequences — per-doc offset and chunk
    // span as metadata. The running total is a per-shard window sum of
    // BIGINTs (exact in any order, parallelism = shard count).
    QueryDef(
      "sample_pack_chunks",
      (s, dir) => Sampling.packChunks(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks")),
        "doc_id", "n_toks", nShards = 8, chunkTokens = 256L)
        .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |         md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
              |k AS (SELECT doc_id, n_tokens, CAST(($hashBucketSql) % 8 AS INTEGER) AS shard FROM b),
              |o AS (SELECT doc_id, shard, n_tokens,
              |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
              |  FROM k)
              |SELECT doc_id, shard, n_tokens, start_tok,
              |  CAST(floor(start_tok / 256.0) AS BIGINT) AS chunk_first,
              |  CAST(floor(greatest(start_tok + n_tokens - 1, start_tok) / 256.0) AS BIGINT) AS chunk_last
              |FROM o ORDER BY doc_id""".stripMargin)
    ),

    // The streaming manifest SINK under the oracle gate: events stream
    // through foreachBatch → Manifest.append (batchId watermark recorded),
    // and the committed dataset must read back as exactly the source
    // table. Decimal-exact sums keep the verdict bit-stable cross-engine.
    QueryDef(
      "manifest_sink_stream",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("mf_sink_src")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        val stream = s.readStream.schema(raw.schema).parquet(streamDir.toString)
        val path = java.nio.file.Files.createTempDirectory("mf_sink_ds").toString + "/ev"
        val ckpt = graft.streaming.StreamOps.scratchDir("mf_sink_ck").toString
        graft.streaming.StreamOps.manifestSink(
          stream.select(col("event_id"), col("event_type"), col("value")), path, ckpt)
        Manifest.read(s, path)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // The partition-scoped manifest UPSERT under the oracle gate: orders
    // is published partitioned by order year, then a deterministic update
    // batch (every 10th key flipped to status 'X') merges through
    // Manifest.upsert — only touched partitions rewrite — and the merged
    // state must aggregate identically to the oracle's CASE-simulated
    // merge over the raw table. Build cached per JVM like
    // manifest_range_scan below.
    QueryDef(
      "manifest_upsert_scan",
      (s, dir) => {
        val path = manifestUpsertFor(s, dir)
        Manifest.read(s, path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             |  o_totalprice FROM orders)
             |SELECT o_orderstatus, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Incrementally-maintained aggregate view under the oracle gate: the
    // source manifest grows through three appends and a delete, the state
    // at aggPath folds ONLY each commit's churned files (signed counts +
    // exact-decimal sums), and the final state must equal a full
    // aggregation of the final table — the oracle computes exactly that
    // from the raw rows.
    QueryDef(
      "manifest_incr_agg",
      (s, dir) => {
        val aggPath = manifestIvmFor(s, dir)
        Manifest.read(s, aggPath)
          .select(col("l_returnflag"), col("n_rows"),
            round(col("sum_l_quantity").cast("double"), 2).as("sum_qty"),
            round(col("sum_l_extendedprice").cast("double"), 2).as("sum_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem WHERE l_orderkey % 100 <> 7
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Bloom-sidecar point lookup under the oracle gate: orders is
    // published HASH-scattered on o_orderkey (every file spans the whole
    // key range, so min/max bounds cannot prune anything) with per-file
    // bloom filters; readPoint opens only the file(s) whose bloom admits
    // the key — the "find one id in 100 TB" shape. The oracle is the
    // plain equality SELECT over the same source.
    QueryDef(
      "manifest_point_scan",
      (s, dir) => {
        val path = manifestBloomFor(s, dir)
        val key = Tables.orders(s, dir)
          .agg(max(col("o_orderkey"))).head.getAs[Number](0).longValue()
        Manifest.readPoint(s, path, "o_orderkey", key)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders
             |WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // Manifest-only count: every commit records each file's exact footer
    // row count, so count(*) — current version AND time-travel — is
    // answered from the manifest file alone: no scan, no job, at any data
    // size. The oracle recomputes both counts from the raw table.
    QueryDef(
      "manifest_count_scan",
      (s, dir) => {
        val path = manifestCountFor(s, dir)
        val v1 = Manifest.countRows(s, path, version = 1)
        val v2 = Manifest.countRows(s, path)
        import s.implicits._
        Seq((1L, v1), (2L, v2)).toDF("version", "n_rows").orderBy("version")
      },
      Some("""SELECT CAST(1 AS BIGINT) AS version,
             |  (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS n_rows
             |UNION ALL
             |SELECT CAST(2 AS BIGINT),
             |  (SELECT count(*) FROM orders)
             |ORDER BY version""".stripMargin)
    ),

    // The same metadata-only count through CATALYST: the
    // MetadataOnlyCount optimizer rule (injectable via
    // spark.sql.extensions=graft.plans.GraftSparkExtensions) collapses an
    // ungrouped, unfiltered SQL count(*) over a manifest relation into a
    // LocalRelation carrying the manifest's recorded row total — no scan
    // in the plan at all (plan pinned by MetadataOnlyCountSpec). The
    // oracle recounts the raw table.
    QueryDef(
      "manifest_meta_count_sql",
      (s, dir) => {
        graft.plans.MetadataOnlyCount.install(s)
        val path = manifestCountFor(s, dir)
        s.sql("CREATE OR REPLACE TEMPORARY VIEW graft_meta_cnt " +
          s"USING `graft-manifest` OPTIONS (path '$path')")
        s.sql("SELECT count(*) AS n_rows FROM graft_meta_cnt")
      },
      Some("SELECT count(*) AS n_rows FROM orders")
    ),

    // The transactional manifest layer under the driver's oracle gate:
    // lineitem is published once per JVM as a stats-carrying manifest
    // dataset (range-clustered on l_orderkey, per-file bounds recorded),
    // and the query reads a key range back through readRange — file
    // skipping happens on the manifest list, the oracle checks the rows
    // against plain SQL over the same source. Builds are cached so the
    // bench's warm-up pass pays the one-time write and the timed passes
    // measure the pruned read.
    QueryDef(
      "manifest_range_scan",
      (s, dir) => {
        val path = manifestDatasetFor(s, dir)
        Manifest.readRange(s, path, "l_orderkey", 1000, 5000)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 5000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // The DECLARATIVE manifest scan under the oracle gate: the same
    // stats-carrying dataset read through Manifest.table — a manifest-
    // backed FileIndex — where a plain .filter is pushed down by Catalyst
    // into manifest-level file skipping (no readRange call; the plan's
    // Location shows ManifestFileIndex and numFiles drops to the
    // intersecting files). Same rows as ordinary SQL over the source,
    // which is exactly what the oracle asserts.
    QueryDef(
      "manifest_table_scan",
      (s, dir) => {
        val path = manifestDatasetFor(s, dir)
        Manifest.table(s, path)
          .filter(col("l_orderkey") >= 2000 && col("l_orderkey") <= 6000)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem WHERE l_orderkey BETWEEN 2000 AND 6000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // PURE SQL over the manifest layer: the dataset registered through the
    // `graft-manifest` data source format (CREATE TEMPORARY VIEW … USING),
    // queried with ordinary spark.sql — the WHERE clause reaches the same
    // manifest-level file skipping as the DataFrame form, proving the
    // transactional layout is a first-class SQL citizen, not a bespoke API.
    QueryDef(
      "manifest_sql_scan",
      (s, dir) => {
        val path = manifestDatasetFor(s, dir)
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_mf_lineitem " +
          s"USING `graft-manifest` OPTIONS (path '$path')")
        s.sql("""SELECT l_orderkey, count(*) AS n_items,
                |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
                |FROM graft_mf_lineitem WHERE l_orderkey BETWEEN 3000 AND 7000
                |GROUP BY 1 ORDER BY 1""".stripMargin)
      },
      Some("""SELECT l_orderkey, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem WHERE l_orderkey BETWEEN 3000 AND 7000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // STRING file skipping under the oracle gate: documents published
    // range-clustered on (lang, doc_id) with `#filestr` bounds recorded
    // (Iceberg's truncated string bounds, code-point ordered), and a
    // plain declarative equality on the string column prunes whole files
    // off the manifest list before Spark plans the scan — the rows must
    // match ordinary SQL over the raw table.
    QueryDef(
      "manifest_string_scan",
      (s, dir) => {
        val path = manifestStrFor(s, dir)
        Manifest.table(s, path)
          .filter(col("lang") === "en")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents WHERE lang = 'en'
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Metadata-only aggregates over STRING facts through pure SQL: with
    // per-file `#rows`, `#nulls`, and exact `#filestr` bounds recorded,
    // the MetadataOnlyCount rule answers count(*), count(col), and
    // string min/max from the manifest alone — no scan in the plan
    // (pinned by ManifestStringStatsSpec) — and the values must equal
    // DuckDB's full-table answers.
    QueryDef(
      "manifest_meta_agg_sql",
      (s, dir) => {
        graft.plans.MetadataOnlyCount.install(s)
        val path = manifestStrFor(s, dir)
        s.sql("CREATE OR REPLACE TEMPORARY VIEW graft_meta_agg " +
          s"USING `graft-manifest` OPTIONS (path '$path')")
        s.sql("""SELECT count(*) AS n_rows, count(lang) AS n_lang,
                |  min(lang) AS min_lang, max(lang) AS max_lang,
                |  min(source) AS min_source, max(source) AS max_source
                |FROM graft_meta_agg""".stripMargin)
      },
      Some("""SELECT count(*) AS n_rows, count(lang) AS n_lang,
             |  min(lang) AS min_lang, max(lang) AS max_lang,
             |  min(source) AS min_source, max(source) AS max_source
             |FROM documents""".stripMargin)
    ),

    // Partition-grouped METADATA aggregation under the oracle gate:
    // documents is published partitioned by lang and analyzed (facts
    // backfilled in one commit, no data rewrite), and `GROUP BY lang`
    // with count(*)/count(col)/min/max collapses to the manifest's
    // per-partition facts — the Iceberg partition-stats idea: this
    // query over 100 TB costs one manifest read. Values must equal
    // DuckDB's full-scan answers.
    QueryDef(
      "manifest_meta_group_sql",
      (s, dir) => {
        graft.plans.MetadataOnlyCount.install(s)
        val path = manifestPartFor(s, dir)
        Manifest.table(s, path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), count(col("source")).as("n_src"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, count(source) AS n_src,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Copy-on-write DELETE under the oracle gate: lineitem published
    // range-clustered with stats, a key range deleted through
    // Manifest.delete — only the files whose bounds intersect the range
    // are rewritten — and the surviving state must aggregate identically
    // to SQL's WHERE NOT over the raw table.
    QueryDef(
      "manifest_delete_scan",
      (s, dir) => {
        val path = manifestDeleteFor(s, dir)
        Manifest.table(s, path)
          .groupBy((col("l_orderkey") % 7).as("bucket"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("bucket")
      },
      Some("""SELECT l_orderkey % 7 AS bucket, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem WHERE NOT (l_orderkey BETWEEN 4000 AND 8000)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // MERGE-ON-READ delete under the oracle gate: lineitem published
    // range-clustered with stats, then two deletes recorded as DELETION
    // VECTORS — no data file rewritten; the read applies the vectors as
    // an anti-join on (file, row index). The surviving rows must
    // aggregate identically to SQL's double-NOT over the raw table.
    QueryDef(
      "manifest_mor_delete_scan",
      (s, dir) => {
        val path = manifestMorFor(s, dir)
        Manifest.table(s, path)
          .groupBy((col("l_orderkey") % 7).as("bucket"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("bucket")
      },
      Some("""SELECT l_orderkey % 7 AS bucket, count(*) AS n_items,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM lineitem
             |WHERE NOT (l_orderkey BETWEEN 2000 AND 6000)
             |  AND NOT (l_orderkey % 97 = 0)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // The streaming manifest SOURCE under the oracle gate: events are
    // published as a TWO-append manifest lineage (so delivery spans
    // versions), tailed with spark.readStream.format("graft-manifest") —
    // offsets are manifest versions; each micro-batch reads only the files
    // appended since the checkpoint — and landed idempotently in a second
    // manifest dataset, whose contents must aggregate identically to the
    // source table. Closes the loop: manifest → stream → manifest.
    QueryDef(
      "manifest_source_stream",
      (s, dir) => {
        val srcPath = manifestStreamSrcFor(s, dir)
        val dst = java.nio.file.Files.createTempDirectory("mf_src_dst").toString + "/ev"
        val ckpt = graft.streaming.StreamOps.scratchDir("mf_src_ck").toString
        val q = s.readStream.format("graft-manifest").load(srcPath)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            graft.streaming.StreamOps.appendIdempotent(batch, dst, batchId)
          }
          .start()
        q.awaitTermination()
        Manifest.read(s, dst)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Compaction of a PARTITIONED dataset under the oracle gate: orders
    // published partitioned by year in two appends (many small files),
    // compacted — the rewrite must restage into the `__p` layout — then
    // read back through the declarative scan WITH a partition filter. A
    // compaction that dropped the partition dirs would silently prune the
    // compacted files out of this query; the oracle pins the row set.
    QueryDef(
      "manifest_compact_scan",
      (s, dir) => {
        val path = manifestCompactFor(s, dir)
        Manifest.table(s, path)
          .filter(col("o_year") === "1995")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM orders WHERE year(o_orderdate) = 1995
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // MERGE INTO under the oracle gate: one conditional merge against a
    // range-clustered orders dataset — matched keys (every 3rd) update
    // their status unless the price crosses the delete threshold, novel
    // keys insert when cheap enough — and the merged state must aggregate
    // identically to the oracle's CASE/UNION-simulated merge. Only files
    // containing matched keys rewrite; inserts stage as new files.
    QueryDef(
      "manifest_merge_scan",
      (s, dir) => {
        val path = manifestMergeFor(s, dir)
        Manifest.read(s, path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice
             |  FROM orders WHERE o_orderkey % 3 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
             |  FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice <= 150000
             |  UNION ALL
             |  SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus, o_totalprice
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_totalprice < 100000)
             |SELECT o_orderstatus, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Version-to-version CDC over the manifest layer: the upsert fixture's
    // v1→v2 delta (every 10th key's status flipped to 'X') recovered by
    // Manifest.changes — which reads only the files churned between the
    // two manifests and compares them with the reference's fingerprint CDC
    // (SURVEY §2.7). The feed must name exactly the flipped keys, tagged
    // 'c', with the NEW row values.
    QueryDef(
      "manifest_changes_scan",
      (s, dir) => {
        val path = manifestUpsertFor(s, dir)
        Manifest.changes(s, path, 1, 2,
          keys = Seq("o_orderkey"), fields = Seq("o_orderstatus", "o_totalprice"))
          .select(col("o_orderkey"), col("o_orderstatus"), col("diff"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, 'X' AS o_orderstatus, 'c' AS diff
             |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY 1""".stripMargin)
    ),

    // MERGE-ON-READ upsert under the oracle gate: a CDC batch replaces
    // every 10th order (status 'X', price +100000) and inserts two novel
    // keys — via upsertMergeOnRead, so the replaced rows become deletion-
    // vector pairs and NO pre-existing data file rewrites; the batch
    // appends as new files. The declarative scan must aggregate
    // identically to the oracle's CASE/UNION-simulated merge.
    QueryDef(
      "manifest_mor_upsert_scan",
      (s, dir) => {
        val path = manifestMorUpsertFor(s, dir)
        Manifest.table(s, path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
              .as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH m AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100000 ELSE o_totalprice END AS o_totalprice
             |  FROM orders
             |  UNION ALL SELECT -1, 'Z', 1.5
             |  UNION ALL SELECT -2, 'Z', 2.5)
             |SELECT o_orderstatus, count(*) AS n_orders,
             |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Metadata-only NDV under the oracle gate: per-file HLL sketches
    // recorded once by analyzeNdv, the distinct-customer estimate then
    // answered by unioning sidecars driver-side — no scan. Tolerance-
    // oracled like agg_hll_mergeable: lgK=12 bounds relative error
    // ~1.6%, asserted within ±5% of the exact distinct count (which
    // itself hash-matches DuckDB).
    QueryDef(
      "manifest_ndv_scan",
      (s, dir) => {
        val path = manifestNdvFor(s, dir)
        val est = Manifest.approxDistinct(s, path, "o_custkey")
        Manifest.read(s, path)
          .agg(countDistinct(col("o_custkey")).as("exact_custs"))
          .select(col("exact_custs"),
            (abs(lit(est) - col("exact_custs")) <= col("exact_custs") * 0.05)
              .as("ndv_within_tol"))
      },
      Some("""SELECT count(DISTINCT o_custkey) AS exact_custs,
             |  true AS ndv_within_tol FROM orders""".stripMargin)
    ),

    // Metadata-only quantiles: per-file KLL sketches merged driver-side
    // give the median of o_totalprice without scanning — verified by
    // computing the RANK of the estimate in the data (must sit within
    // ±3% of 0.5; KLL's merged rank error is ~1.65% at k=200). The row
    // count anchors the hash to the same table the oracle reads.
    QueryDef(
      "manifest_quantile_scan",
      (s, dir) => {
        val path = manifestNdvFor(s, dir)
        val est = Manifest.approxQuantiles(s, path, "o_totalprice", Seq(0.5)).head
        Manifest.read(s, path)
          .agg(count(lit(1)).as("n_orders"),
            avg(when(col("o_totalprice") <= est, 1.0).otherwise(0.0))
              .as("rank_of_est"))
          .select(col("n_orders"),
            (col("rank_of_est") >= 0.47 && col("rank_of_est") <= 0.53)
              .as("p50_within_tol"))
      },
      Some("""SELECT count(*) AS n_orders, true AS p50_within_tol
             |FROM orders""".stripMargin)
    ),

    // The native codegen'd graft_dot expression through the PURE SQL
    // surface: GraftFunctions.register puts it on the live session (the
    // same builder GraftExtensions/GraftSparkExtensions inject at session
    // build), and the SQL text hash-matches DuckDB's list-fold oracle —
    // pinning that SQL users get the identical bit-exact fold the Column
    // API gets.
    QueryDef(
      "fn_native_dot_sql",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("emb_native_sql")
        s.sql("""SELECT vec_id, round(graft_dot(embedding, embedding), 6) AS norm_sq
                 FROM emb_native_sql ORDER BY vec_id LIMIT 200""")
      },
      Some(s"""SELECT vec_id, round(${dotSql("embedding", "embedding", 64)}, 6) AS norm_sq
              |FROM embeddings ORDER BY vec_id LIMIT 200""".stripMargin)
    ),

    // The CONTINUOUS corpus-dedup gate end-to-end: two crawl batches
    // stream through lshDedupGateSink — batch 1 seeds the accepted corpus
    // and band index; batch 2 is deduped within itself, probed against
    // the PERSISTED index (pruned scan, corpus never re-signatured), and
    // exact-Jaccard-verified against the accepted docs. The final corpus
    // must equal the oracle's two-stage simulation: per-batch pipeline
    // (exact fp + LSH + verify) then the cross-batch verified drop.
    //
    // ONE streaming run: both batch files are staged up front with pinned
    // mtimes and maxFilesPerTrigger=1 splits them into two ordered
    // micro-batches under a single Trigger.AvailableNow query — no second
    // cold stream start. One file per batch is load-bearing (it IS the
    // micro-batch boundary), which is why the staging write stays a
    // single-task coalesce(1) over the ~1/40 slice.
    QueryDef(
      "dedup_gate_stream",
      (s, dir) => {
        val src = java.nio.file.Files.createTempDirectory("gate_src")
        val idx = java.nio.file.Files.createTempDirectory("gate_idx").toString + "/idx"
        val corpus = java.nio.file.Files.createTempDirectory("gate_c").toString + "/c"
        val ckpt = graft.streaming.StreamOps.scratchDir("gate_ck").toString
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val t0 = System.currentTimeMillis()
        def writeBatch(name: String, pred: org.apache.spark.sql.Column,
                       mtime: Long): Unit = {
          val tmp = java.nio.file.Files.createTempDirectory("gate_tmp").toString
          docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = java.nio.file.Paths.get(src.toString, name)
          java.nio.file.Files.move(part.toPath, dst)
          dst.toFile.setLastModified(mtime): Unit // file source orders by mtime
        }
        writeBatch("b1.parquet", col("doc_id") % 40 === 0, t0 - 60000)
        writeBatch("b2.parquet", col("doc_id") % 40 === 20, t0 - 30000)
        graft.streaming.StreamOps.lshDedupGateSink(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(src.toString),
          idx, corpus, "doc_id", "text", ckpt)
        Manifest.read(s, corpus).select(col("doc_id")).orderBy("doc_id")
      },
      Some {
        val mins = (0 until 8).map(i => s"min(md5('$i|' || tok)) AS mh$i").mkString(", ")
        def stage(pred: String, p: String): String = {
          val bandsSql = (0 until 4).map(b =>
            s"SELECT id, $b AS band, md5(mh${2 * b} || mh${2 * b + 1}) AS bh FROM ${p}sigs"
          ).mkString(" UNION ALL ")
          s"""${p}fp AS (
             |  SELECT doc_id AS id, md5(array_to_string($toksSql, ' ')) AS fp
             |  FROM documents WHERE $pred),
             |${p}keep AS (SELECT fp, min(id) AS keep_id FROM ${p}fp GROUP BY fp),
             |${p}wk AS (SELECT f.id, k.keep_id FROM ${p}fp f JOIN ${p}keep k ON f.fp = k.fp),
             |${p}w AS (
             |  SELECT DISTINCT d.id, tok
             |  FROM (SELECT doc_id AS id, $toksSql AS toks
             |        FROM documents WHERE $pred) d, UNNEST(d.toks) AS t(tok)
             |  WHERE d.id IN (SELECT id FROM ${p}wk WHERE id = keep_id)),
             |${p}sigs AS (SELECT id, $mins FROM ${p}w GROUP BY id),
             |${p}bands AS ($bandsSql),
             |${p}cands AS (
             |  SELECT DISTINCT a.id AS id1, b.id AS id2
             |  FROM ${p}bands a JOIN ${p}bands b
             |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
             |${p}sz AS (SELECT id, count(*) AS sz FROM ${p}w GROUP BY id),
             |${p}common AS (
             |  SELECT c.id1, c.id2, count(*) AS common FROM ${p}cands c
             |  JOIN ${p}w w1 ON w1.id = c.id1
             |  JOIN ${p}w w2 ON w2.id = c.id2 AND w2.tok = w1.tok
             |  GROUP BY 1, 2),
             |${p}near AS (
             |  SELECT DISTINCT id2 AS id FROM (
             |    SELECT c.id1, c.id2,
             |      round(CAST(coalesce(m.common, 0) AS DOUBLE) /
             |            (s1.sz + s2.sz - coalesce(m.common, 0)), 4) AS j
             |    FROM ${p}cands c
             |    LEFT JOIN ${p}common m ON m.id1 = c.id1 AND m.id2 = c.id2
             |    JOIN ${p}sz s1 ON s1.id = c.id1
             |    JOIN ${p}sz s2 ON s2.id = c.id2)
             |  WHERE j >= 0.7),
             |${p}kept AS (
             |  SELECT wk.id FROM ${p}wk wk LEFT JOIN ${p}near n ON n.id = wk.id
             |  WHERE wk.id = wk.keep_id AND n.id IS NULL)""".stripMargin
        }
        s"""WITH ${stage("doc_id % 40 = 0", "c")},
           |${stage("doc_id % 40 = 20", "i")},
           |xc AS (
           |  SELECT DISTINCT i.id AS new_id, c.id AS corpus_id
           |  FROM ibands i JOIN cbands c ON i.band = c.band AND i.bh = c.bh
           |  WHERE i.id IN (SELECT id FROM ikept)
           |    AND c.id IN (SELECT id FROM ckept)),
           |xcommon AS (
           |  SELECT x.new_id, x.corpus_id, count(*) AS common FROM xc x
           |  JOIN iw w1 ON w1.id = x.new_id
           |  JOIN cw w2 ON w2.id = x.corpus_id AND w2.tok = w1.tok
           |  GROUP BY 1, 2),
           |xdrop AS (
           |  SELECT DISTINCT new_id AS id FROM (
           |    SELECT x.new_id,
           |      round(CAST(coalesce(m.common, 0) AS DOUBLE) /
           |            (s1.sz + s2.sz - coalesce(m.common, 0)), 4) AS j
           |    FROM xc x
           |    LEFT JOIN xcommon m
           |      ON m.new_id = x.new_id AND m.corpus_id = x.corpus_id
           |    JOIN isz s1 ON s1.id = x.new_id
           |    JOIN csz s2 ON s2.id = x.corpus_id)
           |  WHERE j >= 0.7)
           |SELECT id AS doc_id FROM ckept
           |UNION ALL
           |SELECT id FROM ikept WHERE id NOT IN (SELECT id FROM xdrop)
           |ORDER BY doc_id""".stripMargin
      }
    ),

    // Metadata-only drift: PSI between version 2 (low-price cohort) and
    // version 4 (full data) of a manifest dataset, estimated purely from
    // their KLL sidecars — then checked against the exact same-bin PSI
    // from scanning both versions. The sketch-based monitor must raise
    // the same alarm (PSI > 0.2) and land within ±0.25 of the exact
    // value; the oracle asserts both verdicts (the row count anchors the
    // hash to the table DuckDB reads).
    QueryDef(
      "manifest_psi_scan",
      (s, dir) => {
        val path = manifestPsiFor(s, dir)
        val est = Manifest.psiFromSketches(s, path, "o_totalprice",
          versionA = 2, versionB = 4, nBins = 10)
        val w = (est.hi - est.lo) / est.nBins
        val tagged = Manifest.read(s, path, version = 2)
          .withColumn("__c", lit("a"))
          .unionByName(Manifest.read(s, path, version = 4)
            .withColumn("__c", lit("b")))
        val exact = Profile.driftPsi(tagged, col("o_totalprice") - est.lo,
            col("__c") === "a", col("__c") === "b", w, est.nBins - 1)
          .agg(sum(col("psi_term")).as("psi")).head.getDouble(0)
        Manifest.read(s, path).agg(count(lit(1)).as("n_orders"))
          .select(col("n_orders"),
            (lit(est.psi > 0.2) === lit(exact > 0.2)).as("psi_alarm_parity"),
            (lit(math.abs(est.psi - exact)) <= 0.25).as("psi_within_tol"))
      },
      Some("""SELECT count(*) AS n_orders, true AS psi_alarm_parity,
             |  true AS psi_within_tol FROM orders""".stripMargin)
    ),

    // PageRank over the customer↔supplier co-purchase graph (symmetric
    // edges from orders⋈lineitem; suppliers offset into a disjoint id
    // space), 3 damped iterations in 64-bit FIXED POINT — integer sums
    // are order-free and integer division truncates identically in every
    // engine, so the rank vector hash-matches DuckDB bit-for-bit, which
    // no floating-point PageRank can do. The oracle unrolls the same
    // update rule as 3 CTE stages.
    QueryDef(
      "graph_pagerank",
      (s, dir) => {
        // symmetricEdges: orderSupplierEdges emits both orientations of
        // every co-purchase pair, so the node set = distinct src set and
        // pagerank skips the nodes union/distinct pass over the edge list
        Graph.pagerank(orderSupplierEdges(s, dir), "src", "dst",
            iterations = 3, symmetricEdges = true)
          .orderBy("node")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS node FROM edges),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |p AS (SELECT (1000000000000 // count(*)) AS init,
             |             (15 * (1000000000000 // count(*))) // 100 AS tele
             |      FROM nodes),
             |r0 AS (SELECT node, (SELECT init FROM p) AS r FROM nodes),
             |s1 AS (SELECT e.dst AS node, sum(r0.r // deg.deg) AS s
             |       FROM edges e JOIN r0 ON r0.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r1 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s1.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.r // deg.deg) AS s
             |       FROM edges e JOIN r1 ON r1.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r2 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s2.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.r // deg.deg) AS s
             |       FROM edges e JOIN r2 ON r2.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r3 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s3.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s3 USING (node))
             |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3
             |ORDER BY node""".stripMargin)
    ),

    // The SAME PageRank over the STANDING on-disk graph index (VERDICT
    // r11 #1): buildGraphIndex persists the canonical edge list, degree
    // frame, and node set as bucketed+sorted parquet, so the per-query
    // cost is the iterations — the ~10.5 s edge-layout rebuild the
    // non-indexed row pays per query (sf1 probe, NOTES round-12 staging)
    // is amortized into the one-time build. Same fixed-point update rule
    // via the shared rankLoop, so the rank vector must hash-match
    // graph_pagerank bit for bit — the oracle is identical.
    QueryDef(
      "graph_pagerank_indexed",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, graphIndexFor(s, dir))
        Graph.pagerankOnIndex(idx, iterations = 3).orderBy("node")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |nodes AS (SELECT DISTINCT src AS node FROM edges),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |p AS (SELECT (1000000000000 // count(*)) AS init,
             |             (15 * (1000000000000 // count(*))) // 100 AS tele
             |      FROM nodes),
             |r0 AS (SELECT node, (SELECT init FROM p) AS r FROM nodes),
             |s1 AS (SELECT e.dst AS node, sum(r0.r // deg.deg) AS s
             |       FROM edges e JOIN r0 ON r0.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r1 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s1.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.r // deg.deg) AS s
             |       FROM edges e JOIN r1 ON r1.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r2 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s2.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.r // deg.deg) AS s
             |       FROM edges e JOIN r2 ON r2.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r3 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s3.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s3 USING (node))
             |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3
             |ORDER BY node""".stripMargin)
    ),

    // BFS shortest-hop levels from one nation's customers across the
    // bipartite customer↔supplier graph — frontier-expansion BFS (each
    // hop joins only the nodes FIRST reached last hop with the edge
    // list). Exact integer labels; the oracle is DuckDB's recursive CTE
    // with min-level collapse.
    QueryDef(
      "graph_bfs_levels",
      (s, dir) => {
        val edges = orderSupplierEdges(s, dir)
        val seeds = Tables.customer(s, dir)
          .filter(col("c_nationkey") === 1).select(col("c_custkey"))
        Graph.bfsLevels(edges, "src", "dst", seeds, "c_custkey", maxHops = 3)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |bfs(node, lvl) AS (
             |  SELECT DISTINCT c_custkey AS node, 0 AS lvl
             |  FROM customer WHERE c_nationkey = 1
             |  UNION
             |  SELECT e.dst, bfs.lvl + 1
             |  FROM bfs JOIN edges e ON e.src = bfs.node WHERE bfs.lvl < 3)
             |SELECT node, CAST(min(lvl) AS INTEGER) AS level FROM bfs
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // The SAME BFS over the standing graph index: frontier hops join the
    // bucketed edge scan instead of a per-query edgeLayout rebuild —
    // identical integer labels (shared bfsLoop), identical oracle.
    QueryDef(
      "graph_bfs_indexed",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, graphIndexFor(s, dir))
        val seeds = Tables.customer(s, dir)
          .filter(col("c_nationkey") === 1).select(col("c_custkey"))
        Graph.bfsLevelsOnIndex(idx, seeds, "c_custkey", maxHops = 3)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs),
             |bfs(node, lvl) AS (
             |  SELECT DISTINCT c_custkey AS node, 0 AS lvl
             |  FROM customer WHERE c_nationkey = 1
             |  UNION
             |  SELECT e.dst, bfs.lvl + 1
             |  FROM bfs JOIN edges e ON e.src = bfs.node WHERE bfs.lvl < 3)
             |SELECT node, CAST(min(lvl) AS INTEGER) AS level FROM bfs
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Per-supplier triangle counts over the co-supply graph (suppliers
    // sharing an order's high-quantity lines): canonical a<b<c triangle
    // enumeration — every triangle counted exactly once, each corner
    // credited. Exact integers, so the whole per-node vector hash-matches
    // DuckDB's identical join enumeration.
    QueryDef(
      "graph_triangles",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_quantity") >= 45)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val co = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
          .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
        Graph.triangleCounts(co, "a", "b").orderBy("node")
      },
      Some("""WITH co AS (
             |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
             |  WHERE x.l_quantity >= 45 AND y.l_quantity >= 45),
             |w AS (SELECT e1.a, e1.b, e2.b AS c
             |      FROM co e1 JOIN co e2 ON e2.a = e1.b),
             |t AS (SELECT w.a, w.b, w.c
             |      FROM w JOIN co e3 ON e3.a = w.a AND e3.b = w.c)
             |SELECT node, count(*) AS n_triangles FROM (
             |  SELECT a AS node FROM t
             |  UNION ALL SELECT b FROM t
             |  UNION ALL SELECT c FROM t)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // The SAME triangle counts over a standing graph index built on the
    // co-supply edge set (VERDICT r12 #4): what the index amortizes is
    // the upstream edge DERIVATION (the lineitem self-join + distinct,
    // which dominates per-query cost); the degree-oriented enumeration
    // still runs per query — its one-shot joins deliberately stay
    // adaptive (see triangleCounts' plain-checkpoint note). Identical
    // exact integers, identical oracle.
    QueryDef(
      "graph_triangles_indexed",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, triangleIndexFor(s, dir))
        Graph.triangleCountsOnIndex(idx).orderBy("node")
      },
      Some("""WITH co AS (
             |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
             |  WHERE x.l_quantity >= 45 AND y.l_quantity >= 45),
             |w AS (SELECT e1.a, e1.b, e2.b AS c
             |      FROM co e1 JOIN co e2 ON e2.a = e1.b),
             |t AS (SELECT w.a, w.b, w.c
             |      FROM w JOIN co e3 ON e3.a = w.a AND e3.b = w.c)
             |SELECT node, count(*) AS n_triangles FROM (
             |  SELECT a AS node FROM t
             |  UNION ALL SELECT b FROM t
             |  UNION ALL SELECT c FROM t)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Triangles over the standing index UNION a fresh-edge delta — the
    // third indexed operator joins the churn pattern. The delta is the
    // co-supply pairs the q>=45 index MISSES at a q>=44 threshold (both
    // sides >=44, at least one <45): new edges among EXISTING nodes, so
    // the union's triangles genuinely need BOTH frames (index-only,
    // delta-only, and mixed triangles all occur) and the oracle is the
    // closed-form enumeration over the q>=44 union. Unlike pagerank/bfs
    // the operator recomputes the degree orientation over the union —
    // a delta edge can flip orientations far from itself.
    QueryDef(
      "graph_triangles_delta",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, triangleIndexFor(s, dir))
        Graph.triangleCountsOnIndexDelta(idx, triangleDeltaEdges(s, dir),
          "a", "b").orderBy("node")
      },
      Some("""WITH co AS (
             |  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
             |  WHERE x.l_quantity >= 44 AND y.l_quantity >= 44),
             |w AS (SELECT e1.a, e1.b, e2.b AS c
             |      FROM co e1 JOIN co e2 ON e2.a = e1.b),
             |t AS (SELECT w.a, w.b, w.c
             |      FROM w JOIN co e3 ON e3.a = w.a AND e3.b = w.c)
             |SELECT node, count(*) AS n_triangles FROM (
             |  SELECT a AS node FROM t
             |  UNION ALL SELECT b FROM t
             |  UNION ALL SELECT c FROM t)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // PageRank over the standing index UNION a small fresh-edge delta
    // (VERDICT r12 #3): the delta mixes RE-CRAWLED edges (the existing
    // high-quantity co-purchase pairs — absorbed by the dedup, proving
    // index ∪ overlapping delta ≡ rebuild on the union) with genuinely
    // NEW edges and nodes (the same pairs against a shifted +2000000
    // supplier id space). The oracle is the rebuild: the closed-form
    // 3-iteration PageRank over the UNION edge set — the delta path
    // must hash-match it bit for bit.
    QueryDef(
      "graph_pagerank_delta",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, graphIndexFor(s, dir))
        Graph.pagerankOnIndexDelta(idx, deltaSupplierEdges(s, dir),
          "src", "dst", iterations = 3).orderBy("node")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |dpairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 2000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs
             |          UNION SELECT a, b FROM dpairs
             |          UNION SELECT b, a FROM dpairs),
             |nodes AS (SELECT DISTINCT src AS node FROM edges),
             |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
             |p AS (SELECT (1000000000000 // count(*)) AS init,
             |             (15 * (1000000000000 // count(*))) // 100 AS tele
             |      FROM nodes),
             |r0 AS (SELECT node, (SELECT init FROM p) AS r FROM nodes),
             |s1 AS (SELECT e.dst AS node, sum(r0.r // deg.deg) AS s
             |       FROM edges e JOIN r0 ON r0.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r1 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s1.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s1 USING (node)),
             |s2 AS (SELECT e.dst AS node, sum(r1.r // deg.deg) AS s
             |       FROM edges e JOIN r1 ON r1.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r2 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s2.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s2 USING (node)),
             |s3 AS (SELECT e.dst AS node, sum(r2.r // deg.deg) AS s
             |       FROM edges e JOIN r2 ON r2.node = e.src
             |       JOIN deg ON deg.src = e.src GROUP BY 1),
             |r3 AS (SELECT n.node,
             |         (SELECT tele FROM p) + (85 * coalesce(s3.s, 0)) // 100 AS r
             |       FROM nodes n LEFT JOIN s3 USING (node))
             |SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3
             |ORDER BY node""".stripMargin)
    ),

    // BFS over the standing index UNION the same fresh-edge delta: the
    // min-label collapse absorbs the delta's re-crawled duplicates, so
    // the delta needs only canonicalization (no dedup pass against the
    // index). New nodes behind the +2000000 suppliers become reachable
    // one hop past their customer — the oracle is the recursive CTE
    // over the union edge set.
    QueryDef(
      "graph_bfs_delta",
      (s, dir) => {
        val idx = Graph.loadGraphIndex(s, graphIndexFor(s, dir))
        val seeds = Tables.customer(s, dir)
          .filter(col("c_nationkey") === 1).select(col("c_custkey"))
        Graph.bfsLevelsOnIndexDelta(idx, deltaSupplierEdges(s, dir),
          "src", "dst", seeds, "c_custkey", maxHops = 3)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE pairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |dpairs AS (
             |  SELECT DISTINCT o_custkey AS a, l_suppkey + 2000000 AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49),
             |edges AS (SELECT a AS src, b AS dst FROM pairs
             |          UNION SELECT b, a FROM pairs
             |          UNION SELECT a, b FROM dpairs
             |          UNION SELECT b, a FROM dpairs),
             |bfs(node, lvl) AS (
             |  SELECT DISTINCT c_custkey AS node, 0 AS lvl
             |  FROM customer WHERE c_nationkey = 1
             |  UNION
             |  SELECT e.dst, bfs.lvl + 1
             |  FROM bfs JOIN edges e ON e.src = bfs.node WHERE bfs.lvl < 3)
             |SELECT node, CAST(min(lvl) AS INTEGER) AS level FROM bfs
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )

  // One auto-IVF build + calibration per source dir per JVM — the
  // standing-artifact deployment shape (index + quantizer + calibrated
  // probe width are build-time outputs; queries pay the probe). The
  // quantizer persists next to the index so repeated invocations read
  // it back instead of re-deriving; the calibrated width is part of the
  // fixture, like the index contract says it should be.
  private val ivfAutoCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Int)]()
  private def ivfAutoFor(s: org.apache.spark.sql.SparkSession,
                         dir: String): (String, String, Int) =
    ivfAutoCache.computeIfAbsent(dir, _ => {
      val base = java.nio.file.Files.createTempDirectory("graft_ivfauto").toString
      val idx = base + "/idx"
      val e = Tables.embeddings(s, dir)
      val centsCk = Similarity.buildIvfIndexAuto(e, "vec_id", "embedding", idx)
      centsCk.write.parquet(base + "/cents")
      graft.ops.CacheControl.release(centsCk)
      val cents = s.read.parquet(base + "/cents")
      val cal = e.filter(col("vec_id") >= 8 && col("vec_id") < 40)
      // calibrate AND record: the fixture exercises the sidecar
      // round-trip the deployment contract relies on
      val nProbe = Similarity.calibrateAndRecord(s, idx, cal,
        "vec_id", "embedding", cents, k = 5,
        recallTarget = IvfAutoRecallTarget)
      require(Similarity.recordedNProbe(s, idx).contains(nProbe),
        "ivf meta sidecar round-trip failed")
      (idx, base + "/cents", nProbe)
    })

  // One graph-index build per source dir per JVM — the standing-artifact
  // deployment shape: queries pay iteration cost, the build amortizes
  // across the harness's repeated invocations (Verify dump, bench
  // warm-up + timed passes).
  private val graphIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def graphIndexFor(s: org.apache.spark.sql.SparkSession,
                            dir: String): String =
    graphIdxCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_gidx").toString + "/g"
      Graph.buildGraphIndex(orderSupplierEdges(s, dir), "src", "dst", path)
      path
    })

  // The graph_pagerank_delta fixture's fresh-edge batch: both
  // orientations of the HIGH-QUANTITY co-purchase pairs twice — once in
  // the index's id space (re-crawled edges, absorbed by the delta
  // dedup) and once against a shifted +2000000 supplier id space
  // (genuinely new edges AND nodes). STAGED to parquet once per dir
  // (the deployment shape: a fresh-edge batch is a materialized staged
  // table, not a join re-derived per query) — the delta operators
  // execute their input twice (bounded gate + canonicalization), which
  // is two cheap scans on a staged table but two join+distinct
  // executions on the raw derivation (measured: graph_pagerank_delta
  // 15.3 → the derivation dominated the delta path's setup).
  private val deltaEdgesCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def deltaSupplierEdges(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(deltaEdgesCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_delta").toString + "/d"
      deriveDeltaSupplierEdges(s, dir).write.parquet(path)
      path
    }))

  // graph_triangles_delta's staged fresh-edge batch: the co-supply pairs
  // a q>=45 index misses at a q>=44 crawl (both sides >=44, at least one
  // <45) — new edges among existing nodes. Staged like deltaEdgesCache.
  private val triDeltaCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def triangleDeltaEdges(s: org.apache.spark.sql.SparkSession,
                                 dir: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(triDeltaCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_tdelta").toString + "/d"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("l_quantity").as("q"))
        .filter(col("q") >= 44)
      li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .filter(!(col("x.q") >= 45 && col("y.q") >= 45))
        .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
        .write.parquet(path)
      path
    }))

  private def deriveDeltaSupplierEdges(s: org.apache.spark.sql.SparkSession,
                                       dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_suppkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"), col("l_suppkey").as("sk"))
      .select(explode(array(
        struct(col("a").as("src"), (col("sk") + 1000000L).as("dst")),
        struct((col("sk") + 1000000L).as("src"), col("a").as("dst")),
        struct(col("a").as("src"), (col("sk") + 2000000L).as("dst")),
        struct((col("sk") + 2000000L).as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  // Standing index for graph_triangles_indexed, built on the co-supply
  // edge set (a DIFFERENT graph than graphIndexFor's bipartite
  // co-purchase graph, which has no odd cycles and hence no triangles).
  private val triIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def triangleIndexFor(s: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    triIdxCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_tidx").toString + "/g"
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val co = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
      Graph.buildGraphIndex(co, "a", "b", path)
      path
    })

  // One manifest publish per source dir per JVM: queries must be
  // idempotent across the harness's repeated invocations (Verify dump,
  // bench warm-up + two timed passes).
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestDatasetFor(s: org.apache.spark.sql.SparkSession,
                                 dir: String): String =
    manifestCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mf").toString + "/lineitem"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .repartitionByRange(8, col("l_orderkey"))
      Manifest.appendWithStats(li, path, Seq("l_orderkey"))
      path
    })

  // orders hash-scattered across 8 files with blooms on o_orderkey: the
  // fixture where bounds-based skipping is useless and bloom skipping is
  // the only thing between a point lookup and a full scan
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestBloomFor(s: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    bloomCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfb").toString + "/orders"
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .repartition(8, col("o_orderkey"))
      Manifest.appendWithBloom(o, path, Seq("o_orderkey"))
      path
    })

  // orders split into two appends (even keys, then odd) so countRows has
  // a real multi-version history to answer from
  private val countCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestCountFor(s: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    countCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfc").toString + "/orders"
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      Manifest.append(o.filter(col("o_orderkey") % 2 === 0), path)
      Manifest.append(o.filter(col("o_orderkey") % 2 =!= 0), path)
      path
    })

  // documents clustered by (lang, doc_id) with string + numeric bounds
  // and null counts recorded — the fixture for string file skipping and
  // the metadata-only string aggregates
  private val strCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestStrFor(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    strCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mstr").toString + "/documents"
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .repartitionByRange(8, col("lang"), col("doc_id"))
      Manifest.appendWithStats(d, path, Seq("lang", "source", "doc_id"))
      path
    })

  // documents partitioned by lang, facts backfilled via analyze — the
  // fixture for partition-grouped metadata aggregation
  private val partGroupCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestPartFor(s: org.apache.spark.sql.SparkSession,
                              dir: String): String =
    partGroupCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mpart").toString + "/documents"
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      Manifest.upsert(d, path, keys = Seq("doc_id"), orderCol = "doc_id",
        partitionCols = Seq("lang"))
      Manifest.analyze(s, path, Seq("doc_id", "source"))
      path
    })

  // lineitem with two merge-on-read deletes recorded as deletion vectors
  private val morCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestMorFor(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    morCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfm").toString + "/lineitem"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .repartitionByRange(8, col("l_orderkey"))
      Manifest.appendWithStats(li, path, Seq("l_orderkey"))
      Manifest.deleteMergeOnRead(s, path,
        col("l_orderkey") >= 2000 && col("l_orderkey") <= 6000)
      Manifest.deleteMergeOnRead(s, path, col("l_orderkey") % 97 === 0)
      path
    })

  // orders range-clustered into 8 files, then a MERGE-ON-READ upsert CDC
  // batch (every 10th key replaced, two novel keys inserted): replaced
  // rows become deletion-vector pairs, the batch appends as new files —
  // no pre-existing data file rewrites
  private val morUpsertCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestMorUpsertFor(s: org.apache.spark.sql.SparkSession,
                                   dir: String): String =
    morUpsertCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfmu").toString + "/orders"
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Manifest.appendWithStats(
        base.repartitionByRange(8, col("o_orderkey")), path, Seq("o_orderkey"))
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_totalprice", col("o_totalprice") + 100000)
      val inserts = {
        import s.implicits._
        Seq((-1L, "Z", 1.5), (-2L, "Z", 2.5))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      }
      Manifest.upsertMergeOnRead(updates.unionByName(inserts), path,
        keys = Seq("o_orderkey"), orderCol = "o_orderkey")
      path
    })

  // orders split into two appends, each followed by analyzeNdv (HLL) and
  // analyzeQuantiles (KLL) — the second analyze sketches ONLY the new
  // files (incremental ANALYZE)
  private val ndvCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestNdvFor(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    ndvCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfn").toString + "/orders"
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      Manifest.append(o.filter(col("o_orderkey") % 2 === 0).repartition(4), path)
      Manifest.analyzeNdv(s, path, Seq("o_custkey"))
      Manifest.analyzeQuantiles(s, path, Seq("o_totalprice"))
      Manifest.append(o.filter(col("o_orderkey") % 2 =!= 0).repartition(4), path)
      Manifest.analyzeNdv(s, path, Seq("o_custkey"))
      Manifest.analyzeQuantiles(s, path, Seq("o_totalprice"))
      path
    })

  // orders published as a SHIFTED lineage: v1 = low-price cohort (+KLL at
  // v2), v3 = the rest appended (+KLL at v4) — versions 2 and 4 differ in
  // distribution, the drift the sketch-based PSI monitor must detect
  private val psiCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestPsiFor(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    psiCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfp").toString + "/orders"
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      Manifest.append(o.filter(col("o_totalprice") < 100000).repartition(2), path)
      Manifest.analyzeQuantiles(s, path, Seq("o_totalprice"))
      Manifest.append(o.filter(col("o_totalprice") >= 100000).repartition(2), path)
      Manifest.analyzeQuantiles(s, path, Seq("o_totalprice"))
      path
    })

  private val deleteCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestDeleteFor(s: org.apache.spark.sql.SparkSession,
                                dir: String): String =
    deleteCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfd").toString + "/lineitem"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .repartitionByRange(8, col("l_orderkey"))
      Manifest.appendWithStats(li, path, Seq("l_orderkey"))
      Manifest.delete(s, path,
        col("l_orderkey") >= 4000 && col("l_orderkey") <= 8000)
      path
    })

  // Source fixture for manifest_source_stream: events split into two
  // appends so the stream's offset log spans multiple manifest versions.
  private val streamSrcCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestStreamSrcFor(s: org.apache.spark.sql.SparkSession,
                                   dir: String): String =
    streamSrcCache.computeIfAbsent(dir, _ => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = java.nio.file.Files.createTempDirectory("graft_mfs").toString + "/events"
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
      Manifest.append(ev.filter(col("event_id") % 2 === 0), path)
      Manifest.append(ev.filter(col("event_id") % 2 =!= 0), path)
      path
    })

  // Fixture for manifest_compact_scan: orders partitioned by year, two
  // appends, then compacted into ~2 files per partition.
  private val compactCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestCompactFor(s: org.apache.spark.sql.SparkSession,
                                 dir: String): String =
    compactCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfc").toString + "/orders"
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"),
        year(col("o_orderdate")).cast("string").as("o_year"),
        lit(1L).as("seq"))
      Manifest.upsert(base.filter(col("o_orderkey") % 2 === 0), path,
        Seq("o_orderkey"), "seq", partitionCols = Seq("o_year"))
      Manifest.upsert(base.filter(col("o_orderkey") % 2 =!= 0), path,
        Seq("o_orderkey"), "seq", partitionCols = Seq("o_year"))
      Manifest.compact(s, path, targetFileBytes = 4L << 20)
      path
    })

  // Fixture for manifest_merge_scan: orders range-clustered with stats,
  // merged once with conditional update/delete/insert clauses.
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestMergeFor(s: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    mergeCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfm").toString + "/orders"
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      Manifest.appendWithStats(
        base.repartitionByRange(8, col("o_orderkey")), path, Seq("o_orderkey"))
      val upd = base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("M"))
      val ins = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
      Manifest.merge(s, path, upd.unionByName(ins), Seq("o_orderkey"),
        Manifest.MergeSpec(
          matchedUpdate = Map("o_orderstatus" -> "s.o_orderstatus"),
          matchedUpdateCondition = Some("s.o_totalprice <= 150000"),
          matchedDeleteCondition = Some("s.o_totalprice > 150000"),
          notMatchedInsertCondition = Some("s.o_totalprice < 100000")))
      path
    })

  // Fixture for manifest_incr_agg: lineitem published in three appends plus
  // a delete, with the aggregate view incrementally maintained after every
  // commit — the final state must equal one full aggregation of the final
  // table, which is exactly what the oracle asserts.
  private val ivmCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestIvmFor(s: org.apache.spark.sql.SparkSession,
                             dir: String): String =
    ivmCache.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivm").toString
      val src = tmp + "/li"
      val agg = tmp + "/agg"
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      def maintain(): Unit = Manifest.maintainAggregate(s, src, agg,
        Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"))
      Manifest.overwrite(li.filter(col("l_orderkey") % 3 === 0), src)
      maintain()
      Manifest.append(li.filter(col("l_orderkey") % 3 === 1), src)
      maintain()
      Manifest.append(li.filter(col("l_orderkey") % 3 === 2), src)
      maintain()
      Manifest.delete(s, src, col("l_orderkey") % 100 === 7)
      maintain()
      agg
    })

  private val upsertCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def manifestUpsertFor(s: org.apache.spark.sql.SparkSession,
                                dir: String): String =
    upsertCache.computeIfAbsent(dir, _ => {
      val path = java.nio.file.Files.createTempDirectory("graft_mfu").toString + "/orders"
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"),
        year(col("o_orderdate")).cast("string").as("o_year"),
        lit(1L).as("seq"))
      Manifest.upsert(base, path, Seq("o_orderkey"), "seq",
        partitionCols = Seq("o_year"))
      val upd = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("seq", lit(2L))
      Manifest.upsert(upd, path, Seq("o_orderkey"), "seq",
        partitionCols = Seq("o_year"))
      path
    })
}
