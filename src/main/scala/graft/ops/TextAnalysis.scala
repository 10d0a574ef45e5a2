package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * pure `Column` compositions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen and scale linearly with no shuffle — per-document
  * narrow transforms until the caller aggregates.
  *
  * Generalizes the reference's only text machinery — the MD5 row fingerprint
  * (`lib/etl/loading.rb:254-270`) — to document-level analysis.
  */
object TextAnalysis {

  /** Whitespace tokenization, lowercased, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Distinct token set (for set-semantics ops: Jaccard, MinHash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Characters in the raw text. */
  def charCount(text: Column): Column = length(text)

  /** Total characters across tokens (whitespace excluded) — the numerator of
    * mean token length.
    */
  def tokenChars(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t))

  /** Count of tokens found in `stopwords`. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** A BPE-ish subword proxy: tokens split further at letter/digit
    * boundaries, counting resulting sub-tokens. Deterministic and cheap —
    * the real tokenizer-cost estimator a pipeline would calibrate against.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(trim(text)), "[^a-z0-9]+"), t => length(t) > 0))

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "in", "to", "is", "it")

  /** RAG-style overlapping token chunking: each document becomes windows of
    * `size` tokens starting every `step` tokens (overlap = size − step),
    * with the chunk's token span and rejoined text. The last window is
    * short when the document doesn't divide evenly; empty documents emit
    * nothing.
    *
    * Scale: tokenize-once + per-row `explode(sequence(...))` — a narrow
    * per-document transform with NO shuffle and ~n_toks/step output rows
    * per doc. The token array materializes once per row (not per window),
    * and window slicing is `slice` on that array inside codegen.
    */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int, step: Int): DataFrame = {
    require(chunkSize > 0 && step > 0 && step <= chunkSize,
      s"need 0 < step <= chunkSize, got chunkSize=$chunkSize step=$step")
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(step))).as("start_tok"))
      .select(col(idCol),
        (col("start_tok") / step).cast("int").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(chunkSize), col("__n") - col("start_tok")).cast("long")
          .as("chunk_len"),
        array_join(slice(col("__toks"), col("start_tok") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Language marker words, checked in fixed order; ties resolve to the
    * earlier language. A real pipeline swaps in fastText — the operator
    * shape (per-doc scoring, argmax, no shuffle) is what matters at scale.
    */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "fast", "small"),
    "fr" -> Seq("le", "la", "et", "petit", "vite"),
    "es" -> Seq("el", "los", "y", "rapido"),
    "de" -> Seq("der", "die", "und", "schnell"),
    "zh" -> Seq("de", "he", "kuai")
  )

  /** N-gram-heuristic language ID: score = marker hits per language,
    * predict the argmax (first in [[LanguageMarkers]] order on ties),
    * 'und' when all scores are zero.
    */
  def languageId(text: Column): Column = {
    val toks   = tokens(text)
    val scores = LanguageMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Normalized document fingerprint: md5 over the lowercased,
    * whitespace-collapsed text — the exact-dedup key. Reference A1
    * generalized from row to document.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Polynomial ("rolling") hash parameters: h ← (h·B + v(tok)) mod M with
    * v(tok) = the first 32 bits of md5(tok). M is prime and < 2^30, so the
    * fold stays far inside Long range (h·31 + 2^32 < 2^36) on any engine.
    */
  val RollBase: Long = 31L
  val RollMod: Long  = 1000000007L

  private def tokVal(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  private def polyHash(toks: Column): Column =
    aggregate(toks, lit(0L), (h, v) => (h * RollBase + tokVal(v)) % RollMod)

  /** Order-sensitive integer document fingerprint via a polynomial hash of
    * the token sequence — the Rabin–Karp fingerprint family. Unlike
    * [[fingerprint]] (md5 string) it composes incrementally, which is what
    * makes per-window fingerprints ([[ngramHashes]]) affordable.
    */
  def rollingFingerprint(text: Column): Column = polyHash(tokens(text))

  /** Polynomial hash of every n-token window — shingle fingerprints
    * without materializing concatenated shingle strings. Empty when the
    * document has fewer than n tokens. Narrow per-row transform; pair with
    * explode + groupBy for corpus-level shingle matching.
    */
  def ngramHashes(text: Column, n: Int): Column =
    ngramHashesOfTokens(tokens(text), n)

  /** [[ngramHashes]] over a pre-projected token-array attribute — callers
    * about to walk the result with another lambda (e.g. winnowing) must
    * materialize the tokens first or the lambda re-tokenizes per window
    * (the NOTES O(tokens²) lesson).
    */
  def ngramHashesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => polyHash(slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<bigint>"))

  /** Per-token hash values ([[polyHash]]'s v(tok)) as their own array —
    * hash each token ONCE, then window folds are pure long arithmetic.
    * Inside [[ngramHashesOfTokens]] every token's md5 re-computes for
    * each of the n grams covering it; at corpus scale the md5 calls ARE
    * the fingerprint pass, so the n× matters. Values are identical.
    */
  def tokenHashValues(toks: Column): Column = transform(toks, t => tokVal(t))

  /** Gram polynomial hashes from a pre-projected [[tokenHashValues]]
    * attribute: same fold, same modulus, bit-identical to
    * [[ngramHashesOfTokens]] — minus the repeated md5s.
    */
  def ngramHashesOfValues(hvals: Column, n: Int): Column =
    when(size(hvals) >= n,
      transform(sequence(lit(1), size(hvals) - (n - 1)),
        i => aggregate(slice(hvals, i, lit(n)), lit(0L),
          (h, v) => (h * RollBase + v) % RollMod)))
      .otherwise(array().cast("array<bigint>"))

  /** Near-dup candidate pairs from shared winnowing fingerprints: ids
    * co-occurring in ≥ `minShared` fingerprint groups. The equi-join on
    * the fingerprint is the whole pair search — bucket sizes drive cost,
    * exactly like the MinHash-LSH band join; feed the survivors to an
    * exact verifier (Jaccard / edit distance) downstream.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int, w: Int, minShared: Long): DataFrame =
    winnowPairsOfTokens(
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks")),
      k, w, minShared)

  /** [[winnowPairs]] over a pre-tokenized (id, toks) multiset frame
    * ([[graft.ops.Dedup.signatures]] output) — the detector-family form
    * sharing one corpus tokenization. Output: (id1, id2, n_shared).
    */
  def winnowPairsOfTokens(tf: DataFrame, k: Int, w: Int,
                          minShared: Long): DataFrame = {
    // cached: both sides of the pair join read it, and the fingerprint
    // selection (gram-hash → windowed min) is the heavy pass. CACHED
    // ALREADY HASH-PARTITIONED ON THE JOIN KEY: both self-join sides then
    // consume the cache's partitioning directly — one exchange total for
    // the pair search instead of one per side, the same trick as the
    // graph edge layout (and unlike a collect_list-per-bucket pair
    // expansion, still skew-safe on a boilerplate fingerprint).
    // dropDuplicates guards the pair counts against duplicate-id input
    // (e.g. a union of batches sharing ids): a doc emitting each
    // fingerprint twice would double n_shared and let pairs sharing
    // minShared-1 fingerprints through. It rides the fp repartition for
    // FREE — HashPartitioning(fp) already satisfies the (id, fp)
    // aggregate's clustering requirement, so no second exchange.
    val fps = winnowFingerprintsOfTokens(tf, "id", "toks", k, w)
      .repartition(col("fp")).dropDuplicates("id", "fp").cache()
    val a = fps.select(col("fp"), col("id").as("id1"))
    val b = fps.select(col("fp"), col("id").as("id2"))
    val out = a.join(b, Seq("fp")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .localCheckpoint() // compact pair frame; lets the fp cache go
    fps.unpersist()
    out
  }

  /** Winnowing (MOSS-style) selection over a gram-hash array: the minimum
    * hash of every `w`-window of consecutive gram hashes, de-duplicated.
    * The guarantee: two documents sharing a token run of ≥ w+k−1 tokens
    * share at least one selected fingerprint, while per-doc fingerprint
    * count shrinks ~w× vs keeping every gram — the robust middle ground
    * between full shingle sets and one whole-doc hash. Shorter docs
    * (fewer than w grams) contribute their single overall minimum.
    */
  def winnowOfGramHashes(grams: Column, w: Int): Column = {
    // w = 1 degenerates to "keep every gram" — and `least()` needs > 1
    // arguments, so the windowed form below would fail analysis
    if (w <= 1) return array_distinct(grams)
    when(size(grams) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(grams) - (w - 1), lit(1))),
        // window min as least() over clamped element_at reads — same
        // value as array_min(slice(...)) (clamping repeats the last
        // element, which cannot change a min) without allocating a
        // w-element array per position; measured ~30% off the
        // winnowing pass at sf0.1
        i => least((0 until w).map(j =>
          element_at(grams, least(i + lit(j), size(grams)))): _*))))
  }

  /** Corpus-level winnowing fingerprints: (id, fp) rows — the join-ready
    * form for plagiarism/near-dup matching (group by fp, pairs within
    * groups). Tokens and gram hashes materialize as their own
    * projections so every lambda walks an attribute; the whole selection
    * is one narrow scan-side pass per document.
    *
    * PRECONDITION (both forms): one input row per id — the usual doc
    * frame shape. Rows are then distinct by construction with no
    * corpus-wide distinct (a full shuffle of every fingerprint row); a
    * duplicated id emits its fingerprints once per row. [[winnowPairs]]
    * dedups defensively (free on its existing exchange); frames that may
    * carry duplicate ids should `dropDuplicates(idCol)` first.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame =
    winnowFingerprintsOfTokens(
      df.select(col(idCol), tokens(col(textCol)).as("__toks")),
      idCol, "__toks", k, w)

  /** [[winnowFingerprints]] over a pre-tokenized multiset column. Expects
    * ONE row per id (every caller's doc-frame shape) — [[winnowOfGramHashes]]
    * already `array_distinct`s each document's selection, so the exploded
    * (id, fp) rows are distinct BY CONSTRUCTION and no corpus-wide
    * distinct (a full shuffle of every fingerprint row) is ever needed.
    */
  def winnowFingerprintsOfTokens(tf: DataFrame, idCol: String, toksCol: String,
                                 k: Int, w: Int): DataFrame =
    tf.select(col(idCol), tokenHashValues(col(toksCol)).as("__hv"))
      .select(col(idCol), ngramHashesOfValues(col("__hv"), k).as("__grams"))
      .select(col(idCol), explode(winnowOfGramHashes(col("__grams"), w)).as("fp"))

  /** Quality-feature bundle; ratios rounded to 4dp (IEEE division is
    * deterministic across engines, so rounding canonicalizes identically).
    */
  /** Redaction patterns shared verbatim with the SQL oracle generator —
    * written in the regex subset Java (Spark) and RE2 (DuckDB) interpret
    * identically: character classes, bounded/unbounded repetition,
    * alternation; no backreferences or lookaround (RE2 has neither).
    */
  val RedactionRules: Seq[(String, String)] = Seq(
    """[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}""" -> "<EMAIL>",
    """https?://[^\s]+"""                                  -> "<URL>",
    """[0-9][0-9 \-]{6,}[0-9]"""                           -> "<NUM>")

  /** Scrub identifier-like spans (emails, URLs, long digit runs) before a
    * corpus is trained on — applied in rule order so earlier placeholders
    * are not re-matched by later rules. A narrow codegen'd projection:
    * chained `regexp_replace`, no shuffle, linear scan cost.
    */
  def redact(text: Column, rules: Seq[(String, String)] = RedactionRules): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Per-document TF-IDF top terms: tf = raw in-doc term count, idf =
    * ln((N+1)/(df+1)) with add-one smoothing (never zero, never divides by
    * zero), score rounded to 9 dp so libm `log` ulps can't flip a rank
    * across engines (term text breaks residual ties).
    *
    * Scale: two hash-aggs over the exploded tokens — (doc, term) counts,
    * then per-term doc frequencies off that already-collapsed frame — one
    * broadcast of the single-row corpus count, and a per-doc rank window.
    * Map-side partial aggs collapse the explosion before either shuffle;
    * nothing is ever quadratic in corpus or vocabulary.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df_t"))
    val ndocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(ndocs))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df_t") + 1)), 9))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), col("tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("tok"), col("tf"), col("df_t"),
        col("rank"), col("score"))
  }

  /** Unigram language-model quality score: each document's mean corpus
    * frequency of its tokens, reported as ln(Σ count(tok) / (n_tokens ·
    * total_tokens)) — the cheap stand-in for perplexity-based filtering
    * when no trained LM is available: docs of rare/garbled vocabulary
    * score low, docs of common well-formed text score high.
    *
    * Determinism: everything aggregated is an INTEGER count (associative
    * — any shuffle order gives identical sums); the single ln runs once
    * per doc on identical doubles and is rounded to 9 dp so libm ulp
    * differences can't diverge engines (same convention as
    * [[tfidfTopTerms]]). A per-token Σ ln p(tok) would be a
    * floating-point sum in shuffle order — NOT reproducible — which is
    * why the score is the log of the mean, not the mean of the logs.
    *
    * Scale: one hash-agg for the frequency table, one (tok)-keyed join
    * of the exploded corpus against it (map-side combine collapses each
    * partition's token multiset first), one per-doc integer agg, one
    * 1-row broadcast. Nothing quadratic, no double summed across rows.
    */
  def unigramLogFreq(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val freq  = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(freq, "tok")
      .groupBy("id")
      .agg(sum("cnt").as("sum_cnt"), count(lit(1)).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("id"), col("n_tokens"),
        round(log(col("sum_cnt").cast("double") /
          (col("n_tokens").cast("double") * col("total").cast("double"))), 9)
          .as("mean_logfreq"))
  }

  /** Word n-gram MULTISET (no distinct-collapse — repetition measures need
    * duplicates preserved; [[Dedup.shingles]] is the set variant). Empty
    * for docs shorter than n tokens.
    */
  def ngrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** N-gram multiset over an already-computed token-array column. The
    * slice inside the lambda re-evaluates whatever `toks` is per n-gram —
    * pass a materialized attribute (see [[repetitionFeatures]]) when
    * scanning a corpus, not the raw tokenizer expression.
    */
  def ngramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** 1 − distinct/total over a materialized gram-array column. */
  def dupFracOfGrams(g: Column): Column =
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
      .otherwise(lit(0.0))

  /** Top-token fraction over a materialized token-array column. */
  def topTokenFracOfTokens(toks: Column): Column = {
    val counts = transform(array_distinct(toks), t => size(filter(toks, x => x === t)))
    when(size(toks) > 0,
      array_max(counts).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** One-pass repetition profile per document with tokens and gram arrays
    * each materialized ONCE (the Column-level wrappers re-tokenize per
    * array reference — fine for a single predicate, quadratic on a corpus
    * scan). Output: (id, n_tokens, dup_2gram_frac, dup_3gram_frac,
    * top_token_frac).
    */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        ngramsOfTokens(col("__toks"), 2).as("__g2"),
        ngramsOfTokens(col("__toks"), 3).as("__g3"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        dupFracOfGrams(col("__g2")).as("dup_2gram_frac"),
        dupFracOfGrams(col("__g3")).as("dup_3gram_frac"),
        topTokenFracOfTokens(col("__toks")).as("top_token_frac"))

  /** Gopher-style duplicate n-gram fraction: 1 − distinct/total over the
    * n-gram multiset (0 for docs shorter than n tokens). High values mark
    * boilerplate and generator loops — a standard pre-training drop rule.
    * Exact integer-derived doubles, so no rounding (NOTES.md).
    */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val g = ngrams(text, n)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens taken by the single most frequent token (the
    * "top word fraction" repetition signal). Pure column math: count each
    * distinct token inside the array — O(distinct·n) per doc, no shuffle.
    */
  def topTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    val counts = transform(array_distinct(toks), t => size(filter(toks, x => x === t)))
    when(size(toks) > 0,
      array_max(counts).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** C4-style composite quality gate: keep/drop per document with the
    * FIRST failing rule named (rules check in fixed order, so the reason is
    * deterministic). One pass of pure column math over the scan — the
    * pre-training corpus filter applied to billions of docs before any
    * expensive stage runs.
    *
    * PUSHDOWN HAZARD for batch composers: `.filter(col("keep"))` on this
    * LAZY frame lets predicate pushdown substitute the whole quality
    * expression tree (tokenizer + O(tokens²) bigram lambdas) into a
    * Filter BELOW the projection — measured 12-14 s vs ~1 s at sf0.1 for
    * one projection pass. Batch pipelines should `localCheckpoint()` the
    * result before filtering on keep/reason (Prep.prepPipeline does);
    * the frame stays lazy here because streaming callers
    * (doc_quality_stream) cannot checkpoint.
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    minTokens: Int, maxDup2Frac: Double,
                    minMeanTokenLen: Double, maxMeanTokenLen: Double,
                    minStopwordRatio: Double): DataFrame = {
    // tokens and the 2-gram array materialize once per doc; every rule
    // below reads attributes, so the scan stays linear in corpus size
    val staged = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), ngramsOfTokens(col("__toks"), 2).as("__g2"))
    val toks = col("__toks")
    val nTok = size(toks).cast("long")
    val dup2 = dupFracOfGrams(col("__g2"))
    val tchars = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val mtl = tchars.cast("double") / size(toks)
    val stopR = size(filter(toks, t => t.isInCollection(DefaultStopwords)))
      .cast("double") / size(toks)
    val reason = when(nTok < minTokens, "too_short")
      .when(dup2 > maxDup2Frac, "repetitive")
      .when(mtl < minMeanTokenLen || mtl > maxMeanTokenLen, "token_len")
      .when(stopR < minStopwordRatio, "no_stopwords")
      .otherwise("ok")
    staged.select(col(idCol), nTok.as("n_tokens"), reason.as("reason"),
      (reason === "ok").as("keep"))
  }

  def qualityFeatures(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      charCount(t).cast("long").as("n_chars"),
      tokenCount(t).cast("long").as("n_tokens"),
      size(tokenSet(t)).cast("long").as("n_distinct_tokens"),
      subwordCount(t).cast("long").as("n_subwords"),
      stopwordCount(t, DefaultStopwords).cast("long").as("n_stopwords"),
      round(tokenChars(t).cast("double") / tokenCount(t), 4).as("mean_token_len"),
      round(stopwordCount(t, DefaultStopwords).cast("double") / tokenCount(t), 4).as("stopword_ratio"),
      round(size(tokenSet(t)).cast("double") / tokenCount(t), 4).as("distinct_ratio")
    )
  }

  /** Weights for [[qualityScore]]: natural-language markers up (stopword
    * density, vocabulary diversity), run-on tokens down. Stand-ins for a
    * trained text-quality classifier's coefficients — the OPERATOR is the
    * deliverable: a model-free, engine-portable scoring pass.
    */
  val DefaultQualityWeights: Seq[(String, Double)] = Seq(
    "stopword_ratio" -> 4.0,
    "distinct_ratio" -> 2.0,
    "mean_token_len" -> -0.3)

  /** Fixed-weight logistic quality score over [[qualityFeatures]] output:
    * q_score = σ(bias + Σ wᵢ·fᵢ), folded left in declaration order so the
    * double expression tree is identical on any engine; the inputs are the
    * ROUNDED ratio features (already engine-stable) and the final round(6)
    * absorbs libm exp() ulp differences. One narrow projection — scoring a
    * 100 TB corpus is a scan.
    */
  def qualityScore(features: DataFrame,
                   weights: Seq[(String, Double)] = DefaultQualityWeights,
                   bias: Double = -1.0): DataFrame = {
    val z = weights.foldLeft(lit(bias): Column) {
      case (acc, (c, w)) => acc + col(c).cast("double") * w
    }
    features.withColumn("q_score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
  }
}
