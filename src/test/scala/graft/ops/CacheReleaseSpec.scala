package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The cache release policy (docs/SCALE.md §"Cache release policy"):
  * operators that cache intermediates materialize their compact result
  * eagerly and release every intermediate before returning — the ONLY
  * persistent entry left per call is the returned frame, which the
  * caller drops with `unpersist()`. Spark's CacheManager holds STRONG
  * references, so a leaked intermediate is never reclaimed by
  * ContextCleaner and a long-lived session (streaming gate, job server)
  * grows its block-manager footprint without bound. This sweep pins the
  * policy for every pair detector, corpus rewrite, clustering path, and
  * graph loop — the r7 ADVICE leak class, regression-tested.
  */
class CacheReleaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox leaps over the lazy dog"),
    (4L, "completely different text about other things entirely"),
    (5L, "yet another unrelated document with its own words")
  ).toDF("doc_id", "text")

  /** Run an operator, consume and release its result(s), and assert NO
    * persistent RDD created by the call survives. Compared by RDD id set
    * (not count): the shared session may hold other suites' entries, and
    * ContextCleaner may reclaim unrelated ones mid-test — only ids NEW
    * since `before` that remain after release are this operator's leak.
    */
  private def assertClean(label: String)(run: => Seq[DataFrame]): Unit =
    test(s"$label releases every cache once its result is unpersisted") {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val outs = run
      outs.foreach(_.count(): Unit)
      outs.foreach(CacheControl.release)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$label leaked persistent RDD ids $leaked")
    }

  assertClean("jaccardPairs") {
    Seq(Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.5))
  }

  assertClean("shingleJaccardPairs") {
    Seq(Dedup.shingleJaccardPairs(docs, "doc_id", "text", n = 2, minJaccard = 0.3))
  }

  assertClean("lshCandidatePairs") {
    Seq(Dedup.lshCandidatePairs(docs, "doc_id", "text"))
  }

  assertClean("simhashPairs") {
    Seq(Dedup.simhashPairs(docs, "doc_id", "text"))
  }

  assertClean("dedupPipeline") {
    Seq(Dedup.dedupPipeline(docs, "doc_id", "text"))
  }

  assertClean("dedupLines") {
    Seq(Dedup.dedupLines(docs, "doc_id", "text", tokensPerLine = 3))
  }

  assertClean("removeDuplicateSpans (both forms)") {
    Seq(Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 3),
      Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 3, keepFirst = true))
  }

  assertClean("winnowPairs") {
    Seq(TextAnalysis.winnowPairs(docs, "doc_id", "text", k = 2, w = 3, minShared = 1L))
  }

  assertClean("connectedComponents") {
    Seq(Dedup.connectedComponents(Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")))
  }

  assertClean("clusterAssign") {
    Seq(Dedup.clusterAssign(docs, "doc_id",
      Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")))
  }

  assertClean("clusterKeepBest") {
    Seq(Dedup.clusterKeepBest(docs, "doc_id",
      Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"), length(col("text"))))
  }

  assertClean("gateBatch (no index, then probed)") {
    val idx = java.nio.file.Files.createTempDirectory("crel_idx").toString + "/idx"
    val b1 = docs.filter(col("doc_id") <= 3L)
    val b2 = docs.filter(col("doc_id") > 3L)
    val first = Dedup.gateBatch(b1, "doc_id", "text", idx, b1.limit(0))
    Dedup.appendLshIndex(first, "doc_id", "text", 8, 2, idx)
    val second = Dedup.gateBatch(b2, "doc_id", "text", idx, first)
    Seq(first, second)
  }

  assertClean("gateBatchWithBands (bands are the caller's to release)") {
    val idx = java.nio.file.Files.createTempDirectory("crel_gbb").toString + "/idx"
    val (accepted, bands) = Dedup.gateBatchWithBands(
      docs, "doc_id", "text", idx, docs.limit(0))
    Seq(accepted, bands)
  }

  assertClean("pagerank") {
    Seq(Graph.pagerank(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      "src", "dst", iterations = 7, checkpointEvery = 2))
  }

  assertClean("bfsLevels") {
    Seq(Graph.bfsLevels(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst", Seq(1L).toDF("seed"), "seed", maxHops = 3))
  }

  assertClean("triangleCounts") {
    Seq(Graph.triangleCounts(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b"),
      "a", "b"))
  }
}
