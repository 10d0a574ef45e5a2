package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard. Generalizes the
  * reference's MD5 fingerprint CDC (`lib/etl/loading.rb:254-270`) from
  * keyed-row diff to corpus-level near-dup detection.
  *
  * Portability: every hash is md5-over-strings so the DuckDB oracle computes
  * bit-identical values; "min over hashes" uses lexicographic string order.
  *
  * Scale design:
  *  - MinHash signatures are k `array_min` projections over per-row
  *    token-set arrays — one codegen'd pass, no explode, no shuffle.
  *  - LSH banding self-joins on (band, hash) — bucket sizes, not corpus
  *    size, drive the cost. Degenerate corpora (tiny vocab → identical
  *    signatures) should collapse identical signatures to a representative
  *    before pairing; AQE skew-join splits oversized buckets.
  *  - Exact Jaccard is quadratic per shared token and exists as the
  *    verifier for LSH candidates, not the scale path.
  */
object Dedup {

  /** Exact dedup groups: normalized-text fingerprint → surviving (min) id +
    * multiplicity. `dropDuplicates` semantics, but deterministic about which
    * row survives and observable (keeps group size).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, token) pairs — the set representation for Jaccard/MinHash. */
  def tokenSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokenSet(col(textCol))).as("tok"))

  /** ONE shared signature pass for the whole detector family: the corpus
    * is scanned and tokenized exactly once into an EAGER (id, toks) frame
    * — `toks` the ordered token multiset, from which every detector
    * derives its own view (`array_distinct` for set semantics, gram
    * hashes for winnowing, `array_join` for edit-distance text) without
    * touching the source again. A real pipeline runs several detectors
    * over the SAME corpus snapshot (Jaccard + winnow + SimHash + fuzzy
    * verify); per-detector re-tokenization makes the corpus scan the
    * dominant repeated cost — this is the once-per-snapshot form.
    * Consumers: [[jaccardPairsOnSets]] (via array_distinct),
    * [[lshCandidatePairsOnSets]], [[verifyPairsEditDistanceOnTokens]],
    * [[TextAnalysis.winnowPairsOfTokens]], [[simhashOfTokens]].
    * Cache contract: the returned frame is the caller's one persistent
    * entry — release with [[CacheControl.release]] after the detectors'
    * results materialize.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .localCheckpoint()

  /** Word n-gram (shingle) array: "a b c d" with n=2 → ["a b","b c","c d"].
    * Empty when the doc has fewer than n tokens. The n-gram Jaccard unit —
    * order-sensitive where unigram sets are not.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(TextAnalysis.tokens(text), n)

  /** Shingles over an already-computed token-array column. Callers that
    * explode the result should materialize the tokens as their own
    * projection first (see [[Contamination.ngramHashes]]): the `slice`
    * inside the lambda re-evaluates whatever expression `toks` is per
    * shingle, which is O(tokens²) when it's the full tokenizer and O(1)
    * when it's a column attribute.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>")))

  /** Seeded portable token hash: md5("<seed>|<token>"). */
  def seededHash(seed: Int, tok: Column): Column =
    md5(concat(lit(s"$seed|"), tok))

  /** MinHash signatures: one row per id with columns mh0..mh{k-1}, where
    * mh_i = min over the token set of md5("i|tok") (lexicographic min ≡
    * min-hash over a random permutation).
    *
    * Shuffle-free: the k mins are `array_min` over per-row transforms of
    * the token-set ARRAY — a pure projection that stays inside
    * whole-stage codegen, where the explode + k-aggregate groupBy it
    * replaced paid a full shuffle of the exploded tokens. Expects one row
    * per id (every caller's doc-frame shape); docs with an empty token
    * set emit no signature, exactly as the grouped form (no exploded
    * rows → no group).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    minhashSignaturesOfSets(
      df.select(col(idCol), TextAnalysis.tokenSet(col(textCol)).as("__toks")),
      idCol, "__toks", k)

  /** [[minhashSignatures]] over an already-computed token-set array column —
    * the shape batch pipelines use when the same tokenization feeds
    * signatures AND exact verification (see [[gateBatchWithBands]]).
    */
  def minhashSignaturesOfSets(sets: DataFrame, idCol: String, toksCol: String,
                              k: Int): DataFrame = {
    val mhs = (0 until k).map(i =>
      array_min(transform(col(toksCol), t => seededHash(i, t))).as(s"mh$i"))
    sets.filter(size(col(toksCol)) > 0)
      .select(col(idCol) +: mhs: _*)
  }

  /** LSH band hashes from a signature frame: bands of `rowsPerBand`
    * signature entries, band hash = md5(concat(slice)). Output:
    * (id, band, band_hash), one row per band.
    */
  def lshBands(sigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into equal bands")
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(slice: _*)).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** Candidate near-dup pairs: ids sharing any LSH band bucket (id1 < id2,
    * distinct across bands).
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    lshCandidatePairsOnSets(
      df.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("toks")),
      k, rowsPerBand)

  /** [[lshCandidatePairs]] over a pre-built (id, toks) token-SET frame —
    * the [[signatures]]-fed form (pass `array_distinct(toks)` when coming
    * from the multiset snapshot) so candidate generation shares the
    * detector family's one tokenization pass. Output: (id1, id2).
    */
  def lshCandidatePairsOnSets(sets: DataFrame, k: Int = 8,
                              rowsPerBand: Int = 2): DataFrame = {
    // cached: both join sides read it; the signature projection behind it
    // is the expensive pass. Released below (cache policy): the compact
    // pair result checkpoints eagerly, the band cache drops.
    val bands = lshBands(minhashSignaturesOfSets(sets, "id", "toks", k),
        "id", k, rowsPerBand)
      .cache()
    val a = bands.select(col("band"), col("band_hash"), col("id").as("id1"))
    val b = bands.select(col("band"), col("band_hash"), col("id").as("id2"))
    val out = a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
      .localCheckpoint()
    bands.unpersist()
    out
  }

  /** Exact token-set Jaccard similarity for all pairs with jaccard ≥
    * `minJaccard`. Output: (id1, id2, jaccard) rounded to 4dp.
    *
    * Scale path: identical token sets are collapsed to one representative
    * (canonical fingerprint = md5 of the sorted set) BEFORE the quadratic
    * token self-join, then set-level pairs expand back to doc pairs and
    * within-set pairs emit jaccard=1.0 directly. On corpora with many
    * duplicates (the case where quadratic blowup bites) the join runs on
    * D distinct sets, not N docs; the expansion is linear in output size.
    * Values are identical to the naive all-pairs computation.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, minJaccard: Double): DataFrame =
    jaccardPairsOnSets(
      df.select(col(idCol).as("id"), TextAnalysis.tokenSet(col(textCol)).as("toks")),
      minJaccard)

  /** N-gram (shingle) Jaccard — same machinery over [[shingles]] sets.
    * Tokens materialize as their own projection first so the shingle
    * lambda reads an attribute (see [[shinglesOfTokens]]).
    */
  def shingleJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int, minJaccard: Double): DataFrame =
    jaccardPairsOnSets(
      df.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
        .select(col("id"), shinglesOfTokens(col("__toks"), n).as("toks")),
      minJaccard)

  /** Core pair computation over a pre-built (id, toks) set frame.
    *
    * The candidate join is PPJoin-style PREFIX-FILTERED (Xiao et al.,
    * WWW'08; Chaudhuri et al. SSJoin): tokens are globally ordered by
    * ascending document frequency (ties by token), and each set joins
    * only on its first |s| − ⌈t·|s|⌉ + 1 tokens in that order — its
    * "prefix", which by construction holds its RAREST tokens. Lossless
    * for J ≥ t: if |s1∩s2| ≥ t·max(|s1|,|s2|), the smallest shared token
    * (in the global order) provably sits inside BOTH prefixes — if it
    * sat outside s1's prefix, all shared tokens would live in s1's last
    * ⌈t·|s1|⌉ − 1 positions, capping the overlap below t·|s1|. The
    * practical effect: a stop-word that appears in half the corpus is in
    * almost nobody's prefix, so the |docs∋tok|² bucket it used to
    * generate in the token self-join never materializes — the skew bomb
    * is defused structurally, not by salting. A size filter
    * (t·|s2| ≤ |s1|) prunes candidates further before the exact overlap
    * count, which runs only on surviving candidate pairs
    * ([[verifyPairsJaccard]]'s shape). At t=0 the prefix is the whole
    * set and the join degenerates to the naive form — same results.
    *
    * Token sets ride as ARRAYS end to end: the only explode is the one
    * the candidate join needs (prefix tokens), and the exact overlap is
    * `size(array_intersect(s1, s2))` on the two attached arrays — O(|s1|
    * + |s2|) per surviving candidate, with no second explode, no
    * double-join, and no per-pair hash-agg. Prefix extraction itself is
    * window-free (one hash-agg re-collecting (df, tok) structs +
    * `array_sort` + `slice`), so the whole operator is joins and
    * hash-aggs only — roughly half the stage count of the staged
    * explode/window/agg form it replaced, which is what the fixed
    * per-query cost at small scale consists of.
    *
    * EAGER: the result (a compact pair frame) is materialized via
    * `localCheckpoint` and every intermediate cache is released before
    * returning — a long-lived session keeps exactly one persistent entry
    * per call, the returned frame, which the caller drops with
    * `.unpersist()` (see docs/SCALE.md, "cache release policy").
    */
  def jaccardPairsOnSets(input: DataFrame, minJaccard: Double): DataFrame = {
    val docs = input
      .filter(size(col("toks")) > 0)
      .withColumn("fp", md5(concat_ws(" ", array_sort(col("toks")))))
      .cache()
    val members = docs.select(col("fp"), col("id"))
    // one representative TOKEN ARRAY per distinct set (any row: the sets
    // are equal, only element order may differ — every use below is
    // order-blind). Cached: feeds the prefix build and both exact-overlap
    // attaches.
    val sets = docs.groupBy("fp").agg(first(col("toks")).as("toks"))
      .withColumn("sz", size(col("toks")))
      .cache()
    // cached: both candidate-join sides read the prefix frame
    val prefixes = prefixTokens(sets, minJaccard).cache()
    val candPairs = prefixes
      .select(col("fp").as("fp1"), col("sz").as("sz1"), col("tok"))
      .join(prefixes.select(col("fp").as("fp2"), col("sz").as("sz2"), col("tok")),
        Seq("tok"))
      .filter(col("fp1") < col("fp2"))
      // length filter BEFORE the distinct: J ≥ t forces
      // t·max(|s1|,|s2|) ≤ min(|s1|,|s2|) — sizes ride the prefix rows,
      // so no szs join is ever needed
      .filter(least(col("sz1"), col("sz2")).cast("double") >=
        lit(minJaccard) * greatest(col("sz1"), col("sz2")) - lit(1e-9))
      .select("fp1", "fp2", "sz1", "sz2").distinct()
    // exact overlap only on surviving candidates: attach both arrays and
    // intersect — |cands| × set size, never corpus × bucket²
    val setPairs = candPairs
      .join(sets.select(col("fp").as("fp1"), col("toks").as("__t1")), Seq("fp1"))
      .join(sets.select(col("fp").as("fp2"), col("toks").as("__t2")), Seq("fp2"))
      .withColumn("common", size(array_intersect(col("__t1"), col("__t2"))).cast("long"))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sz1") + col("sz2") - col("common")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("fp1", "fp2", "jaccard")
    val crossPairs = setPairs
      .join(members.select(col("fp").as("fp1"), col("id").as("ida")), Seq("fp1"))
      .join(members.select(col("fp").as("fp2"), col("id").as("idb")), Seq("fp2"))
      .select(least(col("ida"), col("idb")).as("id1"),
              greatest(col("ida"), col("idb")).as("id2"), col("jaccard"))
    val withinPairs = members.alias("x")
      .join(members.alias("y"), col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"),
              lit(1.0).as("jaccard"))
      .filter(lit(1.0) >= lit(minJaccard))
    val out = crossPairs.unionByName(withinPairs).localCheckpoint()
    prefixes.unpersist()
    sets.unpersist()
    docs.unpersist()
    out
  }

  /** The PPJoin prefix of every set: for a (fp, sz, toks) SETS frame
    * (one row per distinct set, `toks` the token array, `sz` its size),
    * the exploded (fp, sz, tok) rows of each set's |s| − ⌈t·|s|⌉ + 1
    * tokens that come FIRST in the global order (ascending document
    * frequency, ties by token — any consistent total order preserves the
    * prefix lemma; rarest-first is what shrinks stop-word fan-out).
    * Window-free: document frequency joins onto the exploded tokens, one
    * hash-agg re-collects (df, tok) structs per set, and `array_sort` +
    * `slice` take the prefix (struct order = ascending df, ties by
    * token — exactly the rank the row_number form computed, minus its
    * per-partition sort). At t ≤ 0 the prefix is provably the whole set,
    * so the frequency machinery is skipped entirely. Package-visible so
    * the skew spec can assert a corpus-wide stop-word never enters a
    * prefix.
    */
  private[ops] def prefixTokens(sets: DataFrame, minJaccard: Double): DataFrame = {
    if (minJaccard <= 0)
      return sets.select(col("fp"), col("sz"), explode(col("toks")).as("tok"))
    val freq = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__df"))
    // the −1e-9 guards the ceil against FP error pushing ⌈t·|s|⌉ one too
    // high (a too-SHORT prefix loses pairs; one too long is just slack)
    sets.select(col("fp"), col("sz"), explode(col("toks")).as("tok"))
      .join(freq, Seq("tok"))
      .groupBy(col("fp"), col("sz"))
      .agg(collect_list(struct(col("__df"), col("tok"))).as("__ranked"))
      .select(col("fp"), col("sz"),
        explode(transform(
          slice(array_sort(col("__ranked")), lit(1),
            (col("sz") - ceil(lit(minJaccard) * col("sz") - lit(1e-9)) + 1)
              .cast("int")),
          s => s.getField("tok"))).as("tok"))
  }

  /** Exact Jaccard restricted to given candidate pairs — the verification
    * stage after LSH: cost is |pairs| × shared-token joins, not all-pairs.
    * `words` is the (id, tok) set frame; `pairs` has (id1, id2).
    */
  def verifyPairsJaccard(words: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = words.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = pairs
      .join(words.select(col("id").as("id1"), col("tok")), Seq("id1"))
      .join(words.select(col("id").as("id2"), col("tok")), Seq("id2", "tok"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("common"))
    pairs
      .join(common, Seq("id1", "id2"), "left")
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), Seq("id2"))
      .withColumn("jaccard", round(
        coalesce(col("common"), lit(0L)).cast("double") /
          (col("sz1") + col("sz2") - coalesce(col("common"), lit(0L))), 4))
      .select("id1", "id2", "jaccard")
  }

  /** [[verifyPairsJaccard]] over token-set ARRAYS — `sets` is (id, toks)
    * with one row per id — instead of exploded (id, tok) rows. The overlap
    * is `size(array_intersect(t1, t2))` on the two attached arrays: two
    * id-keyed joins and a projection, versus the exploded form's two
    * joins + per-pair hash-agg + sizes join. Prefer this shape whenever
    * the arrays are already at hand (one tokenization pass feeding both
    * signatures and verification). Pairs whose id is missing from `sets`
    * or has an empty token set drop from the output, and disjoint pairs
    * emit jaccard 0.0 — both exactly as the exploded form.
    */
  def verifyPairsJaccardSets(sets: DataFrame, pairs: DataFrame): DataFrame = {
    val s = sets.filter(size(col("toks")) > 0)
    pairs
      .join(s.select(col("id").as("id1"), col("toks").as("__t1")), Seq("id1"))
      .join(s.select(col("id").as("id2"), col("toks").as("__t2")), Seq("id2"))
      .withColumn("common",
        size(array_intersect(col("__t1"), col("__t2"))).cast("long"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("__t1")) + size(col("__t2")) - col("common")), 4))
      .select("id1", "id2", "jaccard")
  }

  /** Edit-distance verification of candidate pairs: attach both texts by
    * id and keep pairs with `levenshtein ≤ maxDist` (whitespace-normalized
    * first, so reformatting noise doesn't inflate the distance). The
    * complement of set-based verifiers: Jaccard is order-blind,
    * edit distance is exactly order-sensitive — "a b c" vs "c b a" is
    * jaccard 1.0 but distance 4.
    *
    * Scale: the distance runs through the THRESHOLDED levenshtein
    * built-in — banded O(len·maxDist) with early exit instead of the full
    * O(len²) table, and it returns −1 the moment the band is exceeded, so
    * wildly-different candidate pairs cost one diagonal sweep. It still
    * only ever runs on CANDIDATE pairs (LSH/SimHash output), never the
    * corpus — the same verify-after-candidates contract as
    * [[verifyPairsJaccard]]. Two narrow id-keyed joins re-attach text.
    * For surviving pairs the emitted distance is identical to the
    * unthresholded form.
    */
  def verifyPairsEditDistance(docs: DataFrame, pairs: DataFrame,
                              idCol: String, textCol: String,
                              maxDist: Int): DataFrame =
    verifyPairsEditDistanceOnTokens(
      docs.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks")),
      pairs, maxDist)

  /** [[verifyPairsEditDistance]] over a pre-tokenized (id, toks) multiset
    * frame ([[signatures]] output): the whitespace-normalized text is
    * `concat_ws(" ", toks)` — identical to normalizing the raw text — so
    * the verify stage shares the detector family's one tokenization pass
    * instead of re-reading and re-tokenizing the corpus.
    */
  def verifyPairsEditDistanceOnTokens(toksFrame: DataFrame, pairs: DataFrame,
                                      maxDist: Int): DataFrame = {
    val t = toksFrame.select(col("id").as("__id"),
      concat_ws(" ", col("toks")).as("__t"))
    pairs
      .join(t.select(col("__id").as("id1"), col("__t").as("__t1")), Seq("id1"))
      .join(t.select(col("__id").as("id2"), col("__t").as("__t2")), Seq("id2"))
      .withColumn("edit_dist", levenshtein(col("__t1"), col("__t2"), maxDist))
      .filter(col("edit_dist") =!= -1) // -1 = band exceeded = distance > maxDist
      .select("id1", "id2", "edit_dist")
  }

  /** The full training-data dedup pipeline, composed for scale:
    *
    *  1. exact collapse — normalized fingerprint, min-id survivor per group
    *     (removes exact dups BEFORE any pairwise work);
    *  2. LSH candidate generation among the surviving representatives;
    *  3. exact-Jaccard verification of candidates only;
    *  4. decision: drop any representative with a verified near-dup of
    *     smaller id (keeps one doc per near-dup chain, deterministically,
    *     without computing connected components — the standard large-corpus
    *     compromise).
    *
    * Output: (id, status) with status ∈ exact_dup | near_dup | kept.
    */
  def dedupPipeline(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, rowsPerBand: Int = 2, minJaccard: Double = 0.7): DataFrame = {
    val fp = df.select(col(idCol).as("id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val keep = fp.groupBy("fp").agg(min(col("id")).as("keep_id"))
    val withKeep = fp.join(keep, Seq("fp")).cache()
    val repIds = withKeep.filter(col("id") === col("keep_id")).select("id")
    // ONE tokenization pass: the token-set arrays feed both the MinHash
    // projection (no explode/groupBy shuffle) and the exact verify
    val repToks = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(repIds, Seq("id"))
      .select(col("id"), TextAnalysis.tokenSet(col("__text")).as("toks"))
      .cache()
    val bands = lshBands(
      minhashSignaturesOfSets(repToks, "id", "toks", k), "id", k, rowsPerBand)
    val cands = bands.select(col("band"), col("band_hash"), col("id").as("id1"))
      .join(bands.select(col("band"), col("band_hash"), col("id").as("id2")),
        Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val nearDropped = verifyPairsJaccardSets(repToks, cands)
      .filter(col("jaccard") >= minJaccard)
      .select(col("id2").as("id")).distinct()
    val out = withKeep.select(col("id"), col("keep_id"))
      .join(nearDropped.withColumn("__near", lit(true)), Seq("id"), "left")
      .withColumn("status",
        when(col("id") =!= col("keep_id"), lit("exact_dup"))
          .when(col("__near"), lit("near_dup"))
          .otherwise(lit("kept")))
      .select("id", "status")
      .localCheckpoint()
    withKeep.unpersist()
    repToks.unpersist()
    out
  }

  /** SimHash near-dup pairs: candidates share at least one of `nBands`
    * contiguous fingerprint bands (pigeonhole: hamming ≤ maxHamming with
    * maxHamming < nBands guarantees a shared band), verified by exact
    * hamming distance. Band join cost = bucket occupancy; never all-pairs
    * — but note the occupancy knob: at FIXED `bits` the per-band bucket
    * count is 2^(bits/nBands), so once the corpus outgrows it candidate
    * volume turns quadratic (the sf1 lane measured it at the 16-bit
    * default). A corpus-scale deployment raises `bits`, it does not
    * change the operator shape.
    *
    * The fingerprint packs to ONE long before the band join (bits ≤ 32
    * by [[simhash]]'s contract): candidate rows ride the self-join
    * shuffle + distinct as (id1, id2, long, long) instead of two
    * bit-strings, and verification is a single `bit_count(xor)` instead
    * of `bits` per-pair substring comparisons — the [[
    * graft.ops.Multimodal.phashPairs]] lesson applied to its parent.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 16, nBands: Int = 4, maxHamming: Int = 2): DataFrame = {
    require(bits % nBands == 0)
    val w    = bits / nBands
    val sh   = simhash(df, idCol, textCol, bits)
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"), substring(col("simhash"), b * w + 1, w).as("bh"))
    }
    // cached: both join sides read it; the simhash aggregation behind it
    // is the expensive pass
    val bands = sh.select(col(idCol).as("id"),
      expr("cast(conv(simhash, 2, 10) as bigint)").as("__sh"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("__sh"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .cache()
    val a = bands.select(col("band"), col("bh"), col("id").as("id1"), col("__sh").as("sh1"))
    val b = bands.select(col("band"), col("bh"), col("id").as("id2"), col("__sh").as("sh2"))
    val out = a.join(b, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2")).distinct()
      .withColumn("hamming",
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
      .localCheckpoint() // compact pair frame; lets the band cache go
    bands.unpersist()
    out
  }

  val HighHexDigits: Seq[String] = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** SimHash fingerprint over token multiset: bit j (1-based hex position of
    * md5(token)) is 1 when the sum of ±1 votes (+1 if hex digit ≥ 8) is
    * ≥ 0. `bits` ≤ 32. One aggregation pass, `bits` sums — same map-side
    * collapse as MinHash.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame =
    simhashOfTokens(
      df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", bits)

  /** [[simhash]] over a pre-tokenized multiset column ([[signatures]]
    * output) — one corpus tokenization shared across the detector family.
    */
  def simhashOfTokens(tf: DataFrame, idCol: String, toksCol: String,
                      bits: Int = 16): DataFrame = {
    require(bits <= 32)
    val toks = tf.select(col(idCol), explode(col(toksCol)).as("tok"))
      .withColumn("h", md5(col("tok")))
    val sums = (1 to bits).map { j =>
      sum(when(substring(col("h"), j, 1).isInCollection(HighHexDigits), 1).otherwise(-1)).as(s"s$j")
    }
    val agged = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val bitsCols = (1 to bits).map(j => when(col(s"s$j") >= 0, lit("1")).otherwise(lit("0")))
    agged.select(col(idCol), concat(bitsCols: _*).as("simhash"))
  }

  /** Incremental ingestion dedup: rows of `incoming` whose normalized-text
    * fingerprint does not already exist in `corpus` — the content-level
    * analog of the reference's keyed CDC anti join
    * (`lib/etl/loading.rb:254-270`, J1). One anti join on the 16-byte
    * fingerprint; at 100 TB the corpus side reduces to its distinct
    * fingerprint set (and a pre-built fingerprint index or bloom filter
    * drops the corpus scan entirely — see [[graft.ops.BloomJoin]]).
    */
  def newDocuments(incoming: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    incoming.withColumn("fp", fp)
      .join(corpus.select(fp.as("fp")).distinct(), Seq("fp"), "left_anti")
  }

  /** Build a persisted MinHash-LSH band index for a corpus: one row per
    * (id, band, band_hash), written PARTITIONED BY the band hash's first
    * two hex chars (256 `organized/bh_px=…` directories). This is the
    * near-dup analog of [[graft.ops.Similarity.buildIvfIndex]]: signature
    * computation over the 100 TB corpus is paid ONCE at build time; every
    * later crawl batch probes the index instead of re-sigging the corpus.
    * The prefix partitioning means a probe reads only the directories its
    * own band hashes land in — for a small batch that is a fraction of
    * the index, pruned at the scan (assert `PartitionFilters`, no
    * full-index scan).
    */
  def buildLshIndex(corpus: DataFrame, idCol: String, textCol: String,
                    k: Int, rowsPerBand: Int, path: String): Unit =
    writeLshIndex(corpus, idCol, textCol, k, rowsPerBand, path, "overwrite")

  /** Index maintenance: append a new batch's band rows to an existing LSH
    * index — the accepted docs of each crawl batch join the index without
    * a rebuild (the signature cost is the batch's, not the corpus's).
    * Appends land in the flat `delta/` tail (no per-batch 256-way shuffle
    * or 256 file creates); probes read organized∪delta identically, and
    * [[compactLshIndex]] folds the tail in on maintenance cadence.
    * Parameters k/rowsPerBand must match the build.
    */
  def appendLshIndex(batch: DataFrame, idCol: String, textCol: String,
                     k: Int, rowsPerBand: Int, path: String): Unit =
    writeLshIndex(batch, idCol, textCol, k, rowsPerBand, path, "append")

  private def writeLshIndex(df: DataFrame, idCol: String, textCol: String,
                            k: Int, rowsPerBand: Int, path: String,
                            mode: String): Unit =
    writeLshIndexBands(
      lshBands(minhashSignatures(df, idCol, textCol, k), idCol, k, rowsPerBand),
      path, mode)

  /** LSM-style index layout: `organized/` holds the bulk of the index in
    * hive `bh_px=…` prefix directories (pruned-scan side); `delta/` holds
    * flat per-batch appends with bh_px as a DATA column (cheap-append
    * side). Probes read organized∪delta; compaction folds delta into
    * organized.
    */
  private def organizedDir(path: String): String = path + "/organized"
  private def deltaDir(path: String): String = path + "/delta"

  // ── pointer-commit (object-store-atomic) organized layout ───────────
  // Rename-based directory swaps are atomic on HDFS/local only; on
  // S3-style object stores a "rename" is copy+delete and the swap window
  // is seconds-to-minutes. The pointer layout removes the window
  // entirely: compacted generations live in immutable `organized-v<N>/`
  // dirs and a tiny `organized.current` file names the live one; commit
  // = write the new generation, then atomically replace the pointer
  // (single-file rename-overwrite — a bounded metadata op everywhere).
  // Readers NEVER observe an absent layout: the pointer always names a
  // complete generation. Consumed inputs (delta files, the previous
  // generation) are garbage-collected ONE CYCLE LATE — each generation
  // records what it consumed in `_consumed`, and the NEXT compaction
  // deletes that list — so an in-flight reader that resolved the
  // previous pointer keeps a complete, readable state for a full
  // compaction cycle (zero retries; only a reader straddling TWO
  // compactions retries). Readers EXCLUDE delta files recorded as
  // consumed by their resolved generation (or its ancestors): those rows
  // are already inside the generation, and — decisively — the next
  // compaction's GC deletes exactly those files, so a reader that listed
  // them would lose the one-cycle guarantee from the third generation
  // onward (the GC set is empty for v1→v2, which is why only a
  // steady-state test can catch it).
  private def pointerFile(path: String): String = path + "/organized.current"
  private def versionDir(path: String, v: Long): String = path + s"/organized-v$v"
  private def consumedFile(path: String, v: Long): String =
    versionDir(path, v) + "/_consumed" // underscore = invisible to parquet listing

  // Pointer read/replace semantics (race classes, retry rationale,
  // object-store fallback) live in [[AtomicPointer]] — shared with the
  // graph index's generation pointer since round 12. These are thin
  // bindings of that machinery to the band index's file layout.
  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path): String =
    AtomicPointer.readSmallFile(fs, p)

  private def readPointer(fs: org.apache.hadoop.fs.FileSystem,
                          path: String): Option[Long] =
    AtomicPointer.read(fs,
      new org.apache.hadoop.fs.Path(pointerFile(path)), _.trim.toLong)

  private def publishPointer(spark: org.apache.spark.sql.SparkSession,
                             path: String, v: Long): Unit =
    AtomicPointer.publish(spark, path,
      new org.apache.hadoop.fs.Path(pointerFile(path)), v.toString)

  private def readConsumed(fs: org.apache.hadoop.fs.FileSystem,
                           path: String, v: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(consumedFile(path, v))
    if (!fs.exists(p)) Nil
    else readSmallFile(fs, p).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def writeConsumed(fs: org.apache.hadoop.fs.FileSystem,
                            path: String, v: Long, items: Seq[String]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(consumedFile(path, v)), true)
    try out.write(items.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  // 'p' sentinel: an all-digit hex prefix (e.g. "60") would make Spark's
  // hive-partition type inference read bh_px back as a NUMBER, and a
  // later string probe ('6b') dies in an ANSI cast; a leading letter
  // pins the inferred type to string forever
  private def bandPrefix(bandHash: Column): Column =
    concat(lit("p"), substring(bandHash, 1, 2))

  /** Write ALREADY-computed band rows (id, band, band_hash) into the
    * index — the path [[gateBatchWithBands]] callers use so the batch is
    * never re-signatured for the append.
    *
    * `overwrite` (the initial corpus build) organizes on write: one
    * shuffle co-locates each prefix so every `bh_px=…` directory holds ~1
    * file. `append` (a gate/crawl batch) is the LSM fast path: the batch
    * writes FLAT files into `delta/` with bh_px as a data column, sorted
    * so parquet min/max stats prune prefixes at probe time — no 256-way
    * shuffle and no 256 per-batch file creates, which at micro-batch
    * cadence were the dominant per-batch cost. [[compactLshIndex]] folds
    * the delta tail into the organized layout on maintenance cadence.
    */
  def writeLshIndexBands(bands: DataFrame, path: String,
                         mode: String = "append"): Unit = {
    // the parameter is NOT a Spark save mode: "overwrite" rebuilds the
    // organized layout, "append" is an LSM delta append. Anything else
    // ("ignore", "errorifexists") would silently become an append — fail
    // loudly instead.
    require(mode == "append" || mode == "overwrite",
      s"unsupported LSH index write mode '$mode' (use append or overwrite)")
    val withPx = bands.withColumn("bh_px", bandPrefix(col("band_hash")))
    if (mode == "overwrite") {
      val spark = bands.sparkSession
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the old delta tail is superseded by this rebuild, and it goes
      // FIRST: deleting it after the organized write would leave a crash
      // window where probes silently union the NEW organized rows with
      // the OLD incarnation's delta rows (and the next compaction bakes
      // the stale rows in permanently). Crashing after this delete
      // instead leaves the old organized layout alone — a consistent
      // pre-rebuild state — and a rebuild is a restartable batch job.
      fs.delete(new org.apache.hadoop.fs.Path(deltaDir(path)), true): Unit
      withPx.repartition(col("bh_px"))
        .write.mode("overwrite").partitionBy("bh_px").parquet(organizedDir(path))
      // a rebuild supersedes a pointer layout too — but only AFTER the
      // fresh organized/ is fully written (readers keep resolving the old
      // pointer until it drops, then fall through to organized/; a crash
      // before the drop leaves the pointer layout intact and consistent).
      // The dead generation dirs go last; a reader that resolved the
      // pointer just before the drop rides the bounded retry.
      fs.delete(new org.apache.hadoop.fs.Path(pointerFile(path)), false): Unit
      versionDirsOnDisk(fs, path).foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(versionDir(path, v)), true): Unit)
    } else
      // each append owns a fresh UUID batch directory: Spark's output
      // committer stages under <outputDir>/_temporary/<jobId=0>, which is
      // SHARED when two writers append to the same directory — one job's
      // commit/cleanup deletes the staging tree under the other
      // (observed: FileNotFoundException on _temporary/0 under racing
      // appends). Unique dirs give every append its own staging tree, so
      // concurrent gate batches / crawlers never interfere.
      withPx.sortWithinPartitions("bh_px", "band_hash")
        .write.mode("error")
        .parquet(deltaDir(path) + "/b-" + java.util.UUID.randomUUID().toString)
  }

  /** Data files currently in the delta tail: one UUID directory per
    * append batch, files visible once the batch's committer lands them
    * (ignores _SUCCESS markers and in-flight _temporary trees).
    */
  private def deltaFiles(fs: org.apache.hadoop.fs.FileSystem,
                         path: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(deltaDir(path))
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).map(_.toString)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath.toString)
      else Nil
    }
  }

  /** Legacy (pre-LSM) layout detection: `bh_px=…` hive dirs directly
    * under the index root, from the release whose compaction rewrote the
    * root in place. Read with basePath = root so the partition column
    * resolves; never mixed with organized/delta dirs by a writer.
    */
  private def legacyDirs(fs: org.apache.hadoop.fs.FileSystem,
                         path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bh_px="))
      .map(_.getPath.toString)
  }

  /** True while a [[compactLshIndex]] directory swap is mid-flight:
    * `organized/` is absent but its `.tmp` staging or a `.retired.*`
    * copy exists. A probe in this window must NOT silently fall back to
    * a delta-only scan (every organized row would vanish from the
    * results with no error, defeating the bounded retry); it surfaces
    * the retryable missing-file signature instead.
    */
  private def organizedSwapInFlight(fs: org.apache.hadoop.fs.FileSystem,
                                    path: String): Boolean = {
    if (fs.exists(new org.apache.hadoop.fs.Path(organizedDir(path) + ".tmp")))
      return true
    val retired = fs.globStatus(
      new org.apache.hadoop.fs.Path(organizedDir(path) + ".retired.*"))
    retired != null && retired.nonEmpty
  }

  /** Heal the index after a compaction that crashed MID-SWAP (between
    * [[Maintenance.swapDirs]]' retire and move-in renames): `organized/`
    * is absent but an `organized.retired.*` copy survives. Without this
    * guard the NEXT compaction would see neither organized nor legacy
    * dirs, fold the delta tail alone into a fresh `organized/`, and
    * delete the consumed delta — silently and permanently orphaning every
    * row of the retired index; probes fail loudly only until that
    * "healing" compaction bakes the loss in. Recovery renames the NEWEST
    * retired copy back into place (the retire is rename-atomic, so the
    * copy is a complete pre-swap organized layout); older retired copies
    * — only possible from repeated crashes — are left on disk to be
    * surfaced, exactly as [[Maintenance.swapDirs]] treats pre-existing
    * ones. A leftover `organized.tmp` needs no handling here: the
    * organized rewrite below overwrites it.
    */
  private def recoverCrashedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String): Unit = {
    val orgPath = new org.apache.hadoop.fs.Path(organizedDir(path))
    if (fs.exists(orgPath)) return
    val retired = fs.globStatus(
      new org.apache.hadoop.fs.Path(organizedDir(path) + ".retired.*"))
    if (retired == null || retired.isEmpty) return
    val newest = retired.maxBy(_.getModificationTime).getPath
    if (!fs.rename(newest, orgPath))
      throw new java.io.IOException(
        s"found crashed-swap leftover $newest but could not restore it to " +
          s"$orgPath; refusing to compact over a half-swapped index")
  }

  /** The index as one frame, pruned to the given bh_px prefixes: the
    * organized side prunes at the DIRECTORY level (partition filter —
    * never scans unrelated prefixes), the delta side at the FILE level
    * (bh_px rides as a sorted data column, so parquet min/max stats skip
    * non-matching row groups), and a legacy pre-LSM root layout is read
    * as-is (no upgrade migration required; the next compaction folds it
    * into organized/). Loud when no side exists; RETRYABLY loud when the
    * organized side is mid-swap.
    */
  private[ops] def readIndexPruned(spark: org.apache.spark.sql.SparkSession,
                                   path: String, prefixes: Seq[String]): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orgPath = new org.apache.hadoop.fs.Path(organizedDir(path))
    // Side order matters. The POINTER layout wins when present (its
    // generation is complete by construction — commit is pointer-last;
    // a vanished generation dir means this reader straddled two whole
    // compactions and the retryable signature is correct). Then the
    // rename layout. Then, for LIVENESS during a legacy→LSM migration:
    // the first compaction of a pre-LSM index holds `organized.tmp` open
    // for the entire organized rewrite (minutes at scale), while the
    // legacy `bh_px=…` root dirs stay intact until AFTER the swap — so
    // legacy dirs, when present, are always a readable consistent state
    // and are preferred over throwing. The mid-swap throw remains for
    // the normal rename-compaction case (organized absent, no legacy
    // fallback): a silent delta-only scan would drop every organized row
    // from the results.
    val ptr = readPointer(fs, path)
    val orgSide = ptr match {
      case Some(v) => Seq(spark.read.parquet(versionDir(path, v)))
      case None =>
        if (fs.exists(orgPath)) Seq(spark.read.parquet(orgPath.toString))
        else legacyDirs(fs, path) match {
          case dirs if dirs.nonEmpty =>
            Seq(spark.read.option("basePath", path).parquet(dirs: _*))
          case _ if organizedSwapInFlight(fs, path) =>
            throw new java.io.FileNotFoundException(
              s"organized layout of $path is mid-swap (compaction in flight)")
          case _ => Nil
        }
    }
    // Pointer layout: delta files consumed by the resolved generation or
    // its ancestors are EXCLUDED — their rows are inside the generation
    // already (reading them only double-counts), and the next
    // compaction's deferred GC deletes exactly those files, so listing
    // them would break the "zero retries across ONE racing compaction"
    // guarantee from the third generation onward. Files consumed by
    // generations NEWER than the resolved pointer (a compaction committed
    // between our pointer read and this listing) must STAY listed: their
    // rows are only in generations this reader is not reading, and they
    // survive ≥ two further cycles.
    val deltaSide = {
      val all = deltaFiles(fs, path)
      ptr match {
        case Some(v) =>
          val folded = versionDirsOnDisk(fs, path).filter(_ <= v)
            .flatMap(w => readConsumed(fs, path, w)).toSet
          all.filterNot(folded)
        case None => all
      }
    }
    val sides = orgSide ++
      (deltaSide match {
        case Nil => Nil
        case fsq => Seq(spark.read.parquet(fsq: _*))
      })
    require(sides.nonEmpty, s"no LSH index at $path")
    sides.map(_.filter(col("bh_px").isin(prefixes: _*)).drop("bh_px"))
      .reduce(_ unionByName _)
  }

  /** Compact a persisted LSH band index: fold the flat `delta/` tail
    * (one file set per [[appendLshIndex]] / gate batch) into the
    * hive-partitioned `organized/` layout, leaving ~1 file per `bh_px=…`
    * directory — after B batches a probe otherwise opens O(B) delta
    * files, and file count, not bytes, becomes the probe cost of a
    * continuously-ingesting gate.
    *
    * Concurrency story: the delta file list is SNAPSHOTTED first, so an
    * append racing the compaction lands new files that are simply left
    * for the next run; the organized rewrite swaps directories
    * ([[Maintenance.swapWritePartitioned]]), and only then are the
    * consumed delta files deleted. A probe therefore reads either the old
    * (organized + full delta) or new (compacted + remaining delta) state,
    * never a torn mix of rows — though the swap has a short window where
    * `organized/` is absent, so a CONCURRENT probe that listed files
    * pre-swap can fail with FileNotFoundException rather than return
    * wrong rows ([[gateBatchWithBands]] and [[probeLshIndex]] both do
    * bounded internal retries on exactly that signature; each retry
    * re-lists a consistent state). A crash between the swap and the
    * delta deletes leaves rows present on BOTH sides — harmless (probes
    * `distinct` their candidates) and healed by the next compaction.
    * Schedule it like any other maintenance (e.g. nightly, or when the
    * delta file count crosses a threshold); band rows are immutable so
    * the rewrite never changes probe results. Rename-based swaps are
    * atomic on HDFS/local filesystems only — on S3-style object stores
    * route the index through a [[Manifest]]-tracked table instead (see
    * docs/SCALE.md).
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, pointerCommit: Boolean = false): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCrashedSwap(fs, path)
    // an index already on the pointer layout STAYS on it regardless of
    // the flag (mixing layouts would leave two live organized states)
    if (pointerCommit || readPointer(fs, path).nonEmpty)
      return compactLshIndexPointer(spark, path)
    val consumed = deltaFiles(fs, path) // snapshot BEFORE reading
    val orgPath = new org.apache.hadoop.fs.Path(organizedDir(path))
    // a legacy pre-LSM index (bh_px=… dirs at the root) folds into the
    // organized layout here — the upgrade migration is just the next
    // scheduled compaction; the consumed legacy dirs are dropped after
    // the swap like consumed delta files (they are immutable post-upgrade:
    // no writer targets the root layout anymore)
    val legacy = if (fs.exists(orgPath)) Nil else legacyDirs(fs, path)
    val sides =
      (if (fs.exists(orgPath)) Seq(spark.read.parquet(orgPath.toString)) else Nil) ++
      (legacy match {
        case Nil => Nil
        case dirs => Seq(spark.read.option("basePath", path).parquet(dirs: _*))
      }) ++
      (if (consumed.nonEmpty) Seq(spark.read.parquet(consumed: _*)) else Nil)
    if (sides.isEmpty) return
    val cols = sides.head.columns.map(col).toSeq
    Maintenance.swapWritePartitioned(
      sides.map(_.select(cols: _*)).reduce(_ unionByName _),
      organizedDir(path), Seq("bh_px"))
    consumed.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false): Unit)
    legacy.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true): Unit)
    // drop fully-consumed batch directories: safe because appends never
    // write into an EXISTING batch dir (each owns a fresh UUID), so a dir
    // whose remaining contents are only the _SUCCESS marker is dead. A dir
    // still carrying parquet files (landed after the snapshot) or a
    // _temporary tree (append mid-commit) is left for the next run.
    consumed.map(f => new org.apache.hadoop.fs.Path(f).getParent).distinct
      .filter(_.getName.startsWith("b-"))
      .foreach { dir =>
        val left = try fs.listStatus(dir).toSeq
        catch { case _: java.io.FileNotFoundException => Nil }
        if (left.nonEmpty && left.forall(_.getPath.getName == "_SUCCESS"))
          fs.delete(dir, true): Unit
      }
  }

  private def versionDirsOnDisk(fs: org.apache.hadoop.fs.FileSystem,
                                path: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("organized-v"))
      .flatMap(n =>
        scala.util.Try(n.stripPrefix("organized-v").toLong).toOption)
  }

  /** [[compactLshIndex]]'s POINTER-COMMIT form (see the layout comment at
    * [[pointerFile]]): fold the current generation + the unconsumed delta
    * tail into immutable `organized-v<N+1>/`, record what it consumed in
    * the generation's `_consumed`, atomically replace the pointer, then
    * garbage-collect generations superseded ≥ 2 versions ago (their
    * consumed inputs are ≥ one full compaction cycle old, so no reader
    * resolved from the previous pointer can still need them — ZERO
    * retries for probes racing one compaction). GC state is re-derived
    * from disk every run, so a crash at ANY point self-heals: before the
    * pointer publish the half-written generation dir is overwritten by
    * the next run; after it, deferred deletes simply happen a cycle
    * later. Migration in: a rename-layout `organized/` or legacy
    * `bh_px=…` root dirs fold as sides and GC like any generation.
    */
  private def compactLshIndexPointer(spark: org.apache.spark.sql.SparkSession,
                                     path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = readPointer(fs, path)
    // delta files already folded into SOME on-disk generation (their GC
    // is merely deferred) must not fold twice — organized rows would
    // silently duplicate a little more each cycle
    val alreadyConsumed = versionDirsOnDisk(fs, path)
      .flatMap(v => readConsumed(fs, path, v)).toSet
    val consumed = deltaFiles(fs, path).filterNot(alreadyConsumed)
    val orgPath = new org.apache.hadoop.fs.Path(organizedDir(path))
    val renameSide =
      if (ptr.isEmpty && fs.exists(orgPath)) Seq(organizedDir(path)) else Nil
    val legacy =
      if (ptr.isEmpty && renameSide.isEmpty) legacyDirs(fs, path) else Nil
    val sides: Seq[DataFrame] =
      ptr.map(v => spark.read.parquet(versionDir(path, v))).toSeq ++
      renameSide.map(spark.read.parquet(_)) ++
      (legacy match {
        case Nil => Nil
        case dirs => Seq(spark.read.option("basePath", path).parquet(dirs: _*))
      }) ++
      (if (consumed.nonEmpty) Seq(spark.read.parquet(consumed: _*)) else Nil)
    if (sides.isEmpty) return
    // quiescent index (nothing new to fold): do NOT rewrite the whole
    // organized generation — a nightly maintenance cron on an idle index
    // would otherwise pay a full O(index) rewrite per run. Run only the
    // deferred GC and leave the pointer alone. Generations < ptr are a
    // full maintenance interval old by the time a SECOND compaction runs
    // (the same one-cycle grace the commit path gives), so they and what
    // they consumed are collectable.
    if (ptr.nonEmpty && consumed.isEmpty && renameSide.isEmpty && legacy.isEmpty) {
      versionDirsOnDisk(fs, path).filter(_ <= ptr.get - 1).foreach { w =>
        readConsumed(fs, path, w).foreach(item =>
          fs.delete(new org.apache.hadoop.fs.Path(item), true): Unit)
        fs.delete(new org.apache.hadoop.fs.Path(versionDir(path, w)), true): Unit
      }
      dropEmptyBatchDirs(fs, path)
      return
    }
    val newV = ptr.getOrElse(0L) + 1L
    val vdir = versionDir(path, newV)
    fs.delete(new org.apache.hadoop.fs.Path(vdir), true): Unit // crashed attempt
    val cols = sides.head.columns.map(col).toSeq
    val withPx = sides.map(_.select(cols: _*)).reduce(_ unionByName _)
    (if (withPx.columns.contains("bh_px"))
       withPx.repartition(col("bh_px")).write.partitionBy("bh_px")
     else // sides read from hive layouts always carry bh_px; belt+braces
       withPx.withColumn("bh_px", bandPrefix(col("band_hash")))
         .repartition(col("bh_px")).write.partitionBy("bh_px"))
      .mode("overwrite").parquet(vdir)
    writeConsumed(fs, path, newV,
      consumed ++ renameSide ++ legacy ++ ptr.map(versionDir(path, _)).toSeq)
    publishPointer(spark, path, newV)
    // deferred GC: generations ≤ newV-2 were superseded at least one full
    // cycle ago — delete what they consumed, then the generation dirs
    versionDirsOnDisk(fs, path).filter(_ <= newV - 2).foreach { w =>
      readConsumed(fs, path, w).foreach(item =>
        fs.delete(new org.apache.hadoop.fs.Path(item), true): Unit)
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(path, w)), true): Unit
    }
    dropEmptyBatchDirs(fs, path)
  }

  /** Drop delta batch directories whose data files are all gone (safe:
    * appends never write into an existing batch dir, so a dir holding
    * only its _SUCCESS marker is dead; one still carrying parquet files
    * or a _temporary tree is left alone).
    */
  private def dropEmptyBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(deltaDir(path))
    if (!fs.exists(d)) return
    fs.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b-"))
      .foreach { st =>
        val left = try fs.listStatus(st.getPath).toSeq
        catch { case _: java.io.FileNotFoundException => Nil }
        if (left.nonEmpty && left.forall(_.getPath.getName == "_SUCCESS"))
          fs.delete(st.getPath, true): Unit
      }
  }

  /** Probe a persisted LSH index with an incoming batch: candidate
    * near-dup pairs (new_id, corpus_id) — incoming docs sharing any band
    * bucket with an indexed corpus doc. The incoming side's band table is
    * broadcast (a crawl batch is small next to the corpus), its distinct
    * hash prefixes — bounded driver-side metadata, at most 256 values —
    * become an IN partition filter on the index scan, and the join output
    * carries only id pairs. Verification (exact Jaccard on the candidate
    * pairs) joins text back by id downstream, so no text ever rides the
    * index or the probe shuffle.
    */
  def probeLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    incoming: DataFrame, idCol: String, textCol: String,
                    k: Int, rowsPerBand: Int): DataFrame = {
    val inBands = lshBands(minhashSignatures(incoming, idCol, textCol, k),
        idCol, k, rowsPerBand)
      .select(col(idCol).as("new_id"), col("band"), col("band_hash"))
    val prefixes = inBands
      .select(bandPrefix(col("band_hash")).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq // ≤256 rows: bounded
    // EAGER with bounded retry: the pruned scan can race a nightly
    // [[compactLshIndex]] (its swap window surfaces as a missing-file
    // error); each retry re-lists and reads a consistent old-or-new
    // state. Eagerness is what makes the retry possible — a lazy frame
    // would defer the racy read to the caller's action. The compact
    // candidate-pair result is the caller's one persistent entry
    // (cache policy; release with CacheControl.release when done).
    retryFileGone(3)(
      readIndexPruned(spark, path, prefixes)
        .join(broadcast(inBands), Seq("band", "band_hash"))
        .filter(col("new_id") =!= col(idCol))
        .select(col("new_id"), col(idCol).as("corpus_id"))
        .distinct()
        .localCheckpoint())
  }

  /** One step of the CONTINUOUS corpus-dedup gate — the online form of
    * [[dedupPipeline]] against a persisted index. The incoming batch is
    *  1. deduped within itself (exact fingerprint + banded-LSH candidates
    *     + exact-Jaccard verify, canonical keep = smallest id);
    *  2. probed against the persisted band index (prefix-pruned scan —
    *     the corpus is never re-signatured);
    *  3. candidate pairs verified with exact token-set Jaccard, joining
    *     ONLY the candidate corpus ids' text from `corpusText` — so the
    *     accepted-corpus side costs |candidates|, not |corpus|.
    * Returns the batch rows that survive both stages. Per-batch cost ∝
    * batch size + candidate count; ids must be globally unique across
    * batches and corpus (the verification frame unions both sides).
    */
  def gateBatch(batch: DataFrame, idCol: String, textCol: String,
                indexPath: String, corpusText: DataFrame,
                k: Int = 8, rowsPerBand: Int = 2,
                minJaccard: Double = 0.7): DataFrame = {
    val (accepted, bands) = gateBatchWithBands(batch, idCol, textCol,
      indexPath, corpusText, k, rowsPerBand, minJaccard)
    // accepted is already materialized; the band cache only exists for
    // callers that append it to the index — this caller discards it
    bands.unpersist()
    accepted
  }

  /** [[gateBatch]] that also returns the batch representatives' LSH band
    * rows (id, band, band_hash), CACHED — the batch's tokens are exploded
    * and its MinHash signatures aggregated exactly ONCE, shared by the
    * in-batch candidate join, the index probe, and (via the returned
    * frame, semi-joined to whatever ids the caller accepts) the index
    * append. The sink used to pay three signature passes per batch; at
    * crawl-ingest scale the signature pass IS the per-batch cost, so
    * computing it once is the difference between 1× and 3× ingest
    * throughput. Results are identical to the staged form.
    *
    * Cache contract: the ACCEPTED frame comes back already materialized
    * (eager local checkpoint) and every internal per-batch cache is
    * released before return; the returned BAND frame is the one cache
    * left alive — callers append it to the index and then `unpersist()`
    * it ([[graft.streaming.StreamOps.lshDedupGateSink]] does; plain
    * [[gateBatch]] releases it immediately).
    */
  def gateBatchWithBands(batch: DataFrame, idCol: String, textCol: String,
                         indexPath: String, corpusText: DataFrame,
                         k: Int = 8, rowsPerBand: Int = 2,
                         minJaccard: Double = 0.7): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    // exact collapse: smallest id survives per normalized fingerprint
    val fp = batch.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val keep = fp.groupBy("fp").agg(min(col("id")).as("keep_id"))
    val repIds = fp.join(keep, Seq("fp"))
      .filter(col("id") === col("keep_id")).select("id")
    val reps = batch.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(repIds, Seq("id"))
    // THE one tokenization pass for this batch — token-set ARRAYS,
    // shared by the MinHash projection (no explode/groupBy shuffle), the
    // in-batch verify, and the cross-batch verify below
    val repToks = reps
      .select(col("id"), TextAnalysis.tokenSet(col("__text")).as("toks"))
      .cache()
    val bands = lshBands(
      minhashSignaturesOfSets(repToks, "id", "toks", k), "id", k, rowsPerBand)
      .cache()
    // in-batch near-dups among representatives: banded candidates, exact verify
    val cands = bands.select(col("band"), col("band_hash"), col("id").as("id1"))
      .join(bands.select(col("band"), col("band_hash"), col("id").as("id2")),
        Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val nearDropped = verifyPairsJaccardSets(repToks, cands)
      .filter(col("jaccard") >= minJaccard)
      .select(col("id2").as("id")).distinct()
    // cached: the in-batch verify chain behind it is read by the kept
    // rows, the probe's band filter, and the accepted anti-join
    val keptIds = repIds.join(nearDropped, Seq("id"), "left_anti").cache()
    val kept = batch.join(keptIds.select(col("id").as(idCol)), Seq(idCol))
    val indexExists = {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    // returned band rows carry the caller's id column name — the index
    // layout stores idCol, and probes resolve it there
    def namedBands = bands.withColumnRenamed("id", idCol)
    if (!indexExists) {
      // first batch: nothing to probe. Materialize the result so this
      // batch's caches can be released now (bands stays — it's returned)
      val acceptedFirst = kept.localCheckpoint()
      repToks.unpersist()
      keptIds.unpersist()
      return (acceptedFirst, namedBands)
    }
    // probe the persisted index with the kept docs' ALREADY-computed bands
    val inBands = bands
      .join(keptIds, Seq("id"), "left_semi")
      .select(col("id").as("new_id"), col("band"), col("band_hash"))
    val prefixes = inBands
      .select(bandPrefix(col("band_hash")).as("p"))
      .distinct()
    val prefixesC = prefixes.collect().map(_.getString(0)).toSeq // ≤256 rows: bounded
    // probe result MATERIALIZES (eager local checkpoint): the verification
    // below references the candidate pairs five times through its joins —
    // without truncation each reference re-runs the pruned INDEX SCAN and
    // probe join, which at corpus scale means probing the index 5× per
    // batch. The pair set is bounded (|candidates|), so the checkpoint is
    // small by construction. Measured at sf0.1: cross-verify 7.2 s → sub-s.
    // A concurrent [[compactLshIndex]] swap can retire the files this
    // probe just listed (the rename window leaves the path briefly
    // absent) — results are never wrong, but the scan can die with a
    // FileNotFoundException mid-swap; one rebuild-and-retry reads the
    // compacted layout and rides out the maintenance window.
    def probeIndex(): DataFrame = readIndexPruned(spark, indexPath, prefixesC)
      .join(broadcast(inBands), Seq("band", "band_hash"))
      .filter(col("new_id") =!= col(idCol))
      .select(col("new_id"), col(idCol).as("corpus_id"))
      .distinct()
      .localCheckpoint()
    val candsX = retryFileGone(3)(probeIndex())
    // cross-batch verify: batch token arrays are in `repToks` already
    // (kept ⊆ reps); corpus side tokenizes the candidate ids' text only.
    // Cached — the verify joins read it twice
    val candCorpus = corpusText
      .join(candsX.select(col("corpus_id")).distinct(),
        corpusText(idCol) === col("corpus_id"))
      .select(col(idCol).as("id"), col(textCol).as("__text"))
    val vToks = repToks.unionByName(candCorpus
      .select(col("id"), TextAnalysis.tokenSet(col("__text")).as("toks")))
      .cache()
    val dupIds = verifyPairsJaccardSets(vToks,
        candsX.select(col("new_id").as("id1"), col("corpus_id").as("id2")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1").as(idCol)).distinct()
    // EAGER: the accepted frame materializes here so every per-batch
    // cache except the returned band frame is released before the gate
    // returns — a continuously-running gate (lshDedupGateSink) would
    // otherwise leak three CacheManager entries per micro-batch (vToks
    // alone holds the token arrays of batch + candidate corpus text),
    // and CacheManager holds strong references ContextCleaner never GCs.
    val accepted = kept.join(dupIds, Seq(idCol), "left_anti").localCheckpoint()
    repToks.unpersist()
    keptIds.unpersist()
    vToks.unpersist()
    CacheControl.release(candsX) // probe checkpoint is dead once accepted lands
    (accepted, namedBands)
  }

  /** True when any cause in the chain is a missing-file error — the
    * signature of a probe racing a [[compactLshIndex]] directory swap.
    * Spark surfaces it either as a wrapped FileNotFoundException or as
    * the [FAILED_READ_FILE.FILE_NOT_EXIST] SparkException (file listed
    * pre-swap, retired before the read task opened it).
    */
  private[ops] def fileGone(t: Throwable): Boolean = {
    var c = t
    var depth = 0
    while (c != null && depth < 16) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = c.getMessage
      if (m != null &&
        (m.contains("FILE_NOT_EXIST") || m.contains("FileNotFound"))) return true
      c = c.getCause
      depth += 1
    }
    false
  }

  /** Retry `f` while it dies on the missing-file signature — a probe's
    * listing AND read together can straddle a compaction's swap + retired
    * delete, so one retry is not always enough; each retry re-lists and
    * reads a consistent (old-or-new) state. A bounded exponential sleep
    * (25·4^k ms) precedes each retry: the missing-file throw is
    * driver-side microseconds, so back-to-back attempts could all land
    * inside ONE swap window on a slow object store — the backoff makes
    * the window arithmetic robust (3 attempts ride out a ~125 ms swap)
    * without adding measurable cost to the no-race path. Attempts are
    * bounded: any other failure, or `attempts` misses in a row,
    * propagates.
    */
  private[ops] def retryFileGone[A](attempts: Int)(f: => A): A = {
    var used = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if fileGone(e) && used < attempts - 1 =>
          Thread.sleep(25L << (2 * used)) // 25, 100, 400… ms
          used += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fixed-width "lines": (id, line_no, line) rows chunking each doc's
    * tokens into `tokensPerLine`-token spans (the corpus has no newline
    * structure; real pipelines split on '\n' — the operator shape is
    * identical). Ragged tails keep their short final line.
    */
  def chunkLines(df: DataFrame, idCol: String, textCol: String,
                 tokensPerLine: Int): DataFrame = {
    require(tokensPerLine > 0)
    val toks = TextAnalysis.tokens(col(textCol))
    val nLines = ceil(size(toks).cast("double") / tokensPerLine).cast("int")
    df.select(col(idCol), toks.as("__toks"), nLines.as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), explode(sequence(lit(0), col("__n") - 1)).as("line_no"),
        col("__toks"))
      .select(col(idCol), col("line_no"),
        concat_ws(" ", slice(col("__toks"),
          col("line_no") * tokensPerLine + 1, lit(tokensPerLine))).as("line"))
  }

  /** C4-style cross-document line dedup: drop every line that occurs in
    * MORE THAN ONE document (boilerplate headers/footers/navigation in a
    * web corpus), then reassemble each doc from its surviving lines in
    * order. Output: (id, n_lines, n_kept, clean_text) — one row per input
    * doc, clean_text empty when everything was boilerplate.
    *
    * Scale: lines shuffle by their md5 (16-byte key, not text) for the
    * occurrence count; the drop is an anti join on the same key; reassembly
    * is one hash-agg with an in-group sort of (line_no, line) structs —
    * no windows, no driver state, three shuffles total independent of
    * corpus size.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 tokensPerLine: Int): DataFrame = {
    // cached: the occurrence count, the anti join, and the per-doc totals
    // all read the chunked lines — three consumers, one tokenize/explode.
    // Line key = the 96-bit (xxhash64, murmur3) pair: codegen'd, no
    // per-row allocation, 12 bytes on the wire where the old md5 paid a
    // MessageDigest call + a 32-char hex string per line (see
    // Contamination.ngramHashes for the collision-budget arithmetic).
    val lines = chunkLines(df, idCol, textCol, tokensPerLine)
      .withColumn("lh1", xxhash64(col("line")))
      .withColumn("lh2", hash(col("line")))
      .cache()
    val dupes = lines.groupBy("lh1", "lh2")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select("lh1", "lh2")
    val kept = lines.join(dupes, Seq("lh1", "lh2"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    val out = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .localCheckpoint() // result is corpus-sized, but so was the cache
    lines.unpersist()
    out
  }

  /** Cross-document verbatim span REMOVAL — the ExactSubstr idea of Lee
    * et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better") at token-gram granularity: a token position is dropped when
    * any n-token gram covering it occurs MORE THAN ONCE in the corpus
    * (across documents or repeated inside one). Unlike [[dedupLines]]
    * (fixed chunk boundaries) this catches duplicated runs at ANY
    * alignment, and unlike the pair detectors it rewrites the text.
    * Output: (id, n_tokens, n_kept, clean_text), one row per input doc,
    * clean_text empty when everything was duplicated boilerplate.
    * `keepFirst = true` protects the globally FIRST occurrence (min
    * (id, pos)) of each duplicated gram — the paper's "all but one
    * occurrence" form, which preserves corpus content while still
    * removing the redundant copies; the default removes every copy.
    *
    * Scale: gram occurrence counting is one hash-agg on the 16-byte gram
    * hash (map-side combine collapses repeats before the shuffle); only
    * DUPLICATED gram starts expand n× into covered positions; the
    * position drop is one anti join on (id, pos); reassembly is one
    * hash-agg with an in-group sort — every stage linear, no windows, no
    * driver state. The suffix-array construction the paper uses is a
    * single-machine algorithm; gram-granular coverage is its standard
    * distributed approximation (choose n = the minimum duplicated run
    * worth removing; runs shorter than n survive).
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int, keepFirst: Boolean = false): DataFrame = {
    require(n > 0)
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("__toks")).cache()
    // gram start positions, 1-based; none when the doc has < n tokens.
    // The array holds the raw gram strings; hashing happens AFTER the
    // posexplode as the 96-bit (xxhash64, murmur3) codegen pair — one
    // hash per gram row with no MessageDigest call and a 12-byte wire
    // key where the old in-lambda md5 built a 32-char hex string per
    // gram (collision budget: Contamination.ngramHashes).
    val gramArr = when(size(col("__toks")) >= n,
      transform(sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val grams = toks.select(col("id"), posexplode(gramArr).as(Seq("__p0", "gram")))
      .select(col("id"), (col("__p0") + 1).as("gpos"),
        xxhash64(col("gram")).as("gh1"), hash(col("gram")).as("gh2"))
    val dup = grams.groupBy("gh1", "gh2").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("gh1", "gh2")
    val dupOcc = grams.join(dup, Seq("gh1", "gh2"), "left_semi")
    // keepFirst = Lee et al.'s "all but one occurrence": the globally
    // first copy of each duplicated gram — min (id, gpos), one struct-min
    // hash-agg per gram — is PROTECTED; only the other occurrences'
    // positions drop. Default (false) removes every copy, the more
    // aggressive boilerplate-purge form (C4-style line dedup's analog).
    val removable =
      if (!keepFirst) dupOcc
      else {
        val firsts = dupOcc.groupBy("gh1", "gh2")
          .agg(min(struct(col("id"), col("gpos"))).as("__f"))
          .select(col("gh1"), col("gh2"),
            col("__f.id").as("__fid"), col("__f.gpos").as("__fpos"))
        dupOcc.join(firsts, Seq("gh1", "gh2"))
          .filter(!(col("id") === col("__fid") && col("gpos") === col("__fpos")))
          .select("id", "gpos", "gh1", "gh2")
      }
    val covered = removable
      .select(col("id"), explode(sequence(col("gpos"), col("gpos") + (n - 1))).as("pos"))
      .distinct()
    val positions = toks.select(col("id"), posexplode(col("__toks")).as(Seq("__p0", "tok")))
      .select(col("id"), (col("__p0") + 1).as("pos"), col("tok"))
    val kept = positions.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    val out = toks.select(col("id"), size(col("__toks")).as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .localCheckpoint() // result is corpus-sized, but so was the cache
    toks.unpersist()
    out
  }

  /** Connected components over an undirected pair graph ((id1, id2) rows,
    * e.g. [[simhashPairs]]/[[lshCandidatePairs]] output) by hash-min label
    * propagation: every node repeatedly adopts the minimum label in its
    * closed neighborhood until fixpoint. Output: (id, component) where
    * component = min node id of the connected component.
    *
    * This is the dedup endgame the pair ops feed: near-dup PAIRS overcount
    * (a 5-copy cluster is 10 pairs); clustering them and keeping one
    * representative per component is what actually shrinks a corpus.
    *
    * Scale: each round is one shuffle join (messages along edges) + one
    * hash-aggregation (min per node) — no driver-side graph state; the loop
    * runs O(component diameter) rounds, and near-dup graphs are dense
    * star/clique-like clusters with tiny diameters (2–3 rounds typical).
    * Labels are checkpointed every round — iterative plans grow
    * exponentially otherwise (each round embeds the previous round's plan
    * twice), so lineage MUST be truncated, not just cached. Local
    * checkpoints suffice single-JVM; on a cluster set a reliable
    * `sparkContext.setCheckpointDir` and swap in `.checkpoint()` if
    * executor loss during the loop must be survivable. For adversarial
    * long-chain graphs use alternating large/small-star (O(log n) rounds);
    * not needed for dedup.
    */
  def connectedComponents(pairs: DataFrame, src: String = "id1",
                          dst: String = "id2", maxIter: Int = 25,
                          maxDriverPairs: Long = 200000L): DataFrame = {
    // Materialize the pair source ONCE — edges/nodes below reference it
    // four times, and candidate generation upstream (banded joins) is far
    // too expensive to recompute per branch.
    val p = pairs.select(col(src).as("src"), col(dst).as("dst")).localCheckpoint()
    // Small-graph fast path: a verified near-dup pair set is usually TINY
    // next to the corpus (it is the operator's OUTPUT, not its input), and
    // the distributed loop below costs a fixed ~2 Spark jobs per round
    // regardless of size. Up to `maxDriverPairs` edges (bounded metadata —
    // ~16 MB of ids at the default, the same class of driver-side bound
    // as the ≤256 probe prefixes) the components compute on the driver as
    // bounded MIN-LABEL RELAXATION — the exact replay of the distributed
    // loop INCLUDING its `maxIter` cap: after round k every node's label
    // is the min id within k hops, the loop stops on no-change or
    // maxIter, so even graphs whose diameter exceeds maxIter truncate
    // identically on both paths. `maxDriverPairs = 0` forces the
    // distributed path (the equivalence spec runs both).
    DriverLocal.boundedCollect(p, maxDriverPairs).foreach { rows =>
      @annotation.nowarn("msg=eliminated by erasure")
      def lt(a: Any, b: Any): Boolean = (a, b) match {
        // Strings compare as UTF-8 BYTES, matching the distributed path's
        // min() (Spark's UTF8String binary order = code-point order); java
        // String.compareTo is UTF-16 code-UNIT order, which disagrees for
        // supplementary characters and would let the two paths elect
        // different component representatives.
        case (x: String, y: String) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(x)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
        case (x: Comparable[Any] @unchecked, y) => x.compareTo(y) < 0
        case _ => a.toString < b.toString
      }
      val edges = rows.flatMap(r =>
        Seq((r.get(0), r.get(1)), (r.get(1), r.get(0))))
      var label = scala.collection.mutable.HashMap.empty[Any, Any]
      edges.foreach { case (s, _) => label(s) = s }
      var iter = 0
      var changed = label.nonEmpty
      while (changed && iter < maxIter) {
        // synchronous round: next(v) = min over v's closed neighborhood
        // of the PREVIOUS round's labels (the self-loop is label(v))
        val next = label.clone()
        edges.foreach { case (s, d) => if (lt(label(s), next(d))) next(d) = label(s) }
        changed = label.exists { case (v, l) => next(v) != l }
        label = next
        iter += 1
      }
      val spark = pairs.sparkSession
      val out = DriverLocal.twoColDF(spark,
        label.toSeq.map { case (v, l) => org.apache.spark.sql.Row(v, l) },
        "id", p.schema.head.dataType, "component", p.schema.head.dataType)
      CacheControl.release(p)
      return out
    }
    val nodes = p.select(col("src")).union(p.select(col("dst").as("src"))).distinct()
    // Self-loops make "min over closed neighborhood" a single join+agg —
    // the loop body then has no Union, so every round's plan is one flat
    // shuffle join over two checkpointed relations.
    // hash(src) layout, captured through the checkpoint (repartition
    // before distinct is free: HashPartitioning(src) satisfies the dedup
    // agg's ClusteredDistribution(src, dst)) — every round's
    // edges⋈labels join then consumes the edge side exchange-free, the
    // same iterative layout as Graph.edgeLayout. Without
    // checkpointWithLayout, AQE records UnknownPartitioning at capture
    // and each round re-shuffles the full edge list.
    val edges = CacheControl.checkpointWithLayout(pairs.sparkSession) {
      p.union(p.select(col("dst").as("src"), col("src").as("dst")))
        .union(nodes.select(col("src"), col("src").as("dst")))
        .repartition(col("src")).distinct()
        .sortWithinPartitions("src")
    }
    var labels = CacheControl.checkpointWithLayout(pairs.sparkSession) {
      nodes.select(col("src").as("id"))
        .withColumn("component", col("id"))
    }
    // Fixpoint detection: labels only ever decrease, so the label sum is
    // strictly decreasing until convergence — one scan-only aggregate on
    // the just-materialized round, no comparison join. Decimal sum cannot
    // overflow (double-width accumulator).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = prevSum == null // no pairs → no nodes
    while (!converged && iter < maxIter) {
      // layout-preserving: the round aggregation leaves next hash(dst→id)
      // partitioned — captured, the following round's join (key src =
      // renamed id) moves only the label vector, never the edges
      val next = CacheControl.checkpointWithLayout(pairs.sparkSession) {
        edges.join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy("dst").agg(min("component").as("component"))
          .withColumnRenamed("dst", "id")
      }
      val s = labelSum(next)
      CacheControl.release(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    CacheControl.release(p)
    CacheControl.release(edges)
    labels
  }

  /** Cluster assignment for a whole corpus: every id gets the min id of its
    * near-dup component (itself when unpaired); `kept` marks the one
    * representative per cluster that survives dedup.
    */
  def clusterAssign(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
    val out = df.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("component", "cluster_id"),
        Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .withColumn("kept", col("id") === col("cluster_id"))
      .localCheckpoint() // assignment materializes; the label frame drops
    CacheControl.release(labels)
    out
  }

  /** [[clusterAssign]] with QUALITY-AWARE survivor selection: per near-dup
    * cluster keep the row with the highest `score` (ties → smallest id)
    * instead of blindly the smallest id — what a real pipeline wants when
    * the copies differ (keep the cleanest / longest / best-scored
    * rendition, drop the mirror-site junk). `score` is any numeric Column
    * evaluated against `df` (token count, [[TextAnalysis.qualityScore]]
    * output, …). Output: (id, cluster_id, score, kept).
    *
    * Scale: one extra min_by hash-agg per cluster and one id-keyed join
    * over the assignment — the component labeling still dominates.
    */
  def clusterKeepBest(df: DataFrame, idCol: String, pairs: DataFrame,
                      score: Column): DataFrame = {
    val labels = connectedComponents(pairs)
    val assigned = df.select(col(idCol).as("id"), score.as("__score"))
      .join(labels.withColumnRenamed("component", "cluster_id"),
        Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .cache() // read by the per-cluster argmax AND the final join
    val best = assigned.groupBy("cluster_id")
      // lexicographic min of (−score, id): highest score, ties to min id
      .agg(min_by(col("id"),
        struct((-col("__score")).as("__ns"), col("id"))).as("keep_id"))
    val out = assigned.join(best, Seq("cluster_id"))
      .select(col("id"), col("cluster_id"), col("__score").as("score"),
        (col("id") === col("keep_id")).as("kept"))
      .localCheckpoint()
    assigned.unpersist()
    CacheControl.release(labels)
    out
  }
}
