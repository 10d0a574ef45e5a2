package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated anti join — the standard 100 TB CDC shape
  * (reference J1, `lib/etl/loading.rb` missing-row detection, scaled).
  *
  * A plain `left_anti` join shuffles the ENTIRE probe side on the key. At
  * 100 TB that shuffle dominates the job even when almost every row has a
  * match-status decidable locally. The fix: aggregate the build side into
  * one Bloom filter (`bloom_filter_agg` — partial sketches merge
  * map-side, so the build scan is one pass with no row shuffle),
  * broadcast the single-row sketch, and split the probe side:
  *
  *  - `might_contain` = false → DEFINITELY unmatched (Bloom has no false
  *    negatives) → emit directly, zero shuffle;
  *  - `might_contain` = true → matched OR false positive → exact
  *    `left_anti` join on just this (small) candidate slice.
  *
  * The result is EXACTLY the plain anti join — approximation affects only
  * how much data reaches the shuffle (the false-positive rate), never the
  * answer. Tune `numBits` to the build-side cardinality (~8–10 bits/item
  * for ~1–2% fpp).
  */
object BloomJoin {

  import org.apache.spark.sql.GraftShim
  import org.apache.spark.sql.catalyst.expressions.XxHash64
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

  // bloom_filter_agg / might_contain are internal expressions (used by
  // Spark's own InjectRuntimeFilter), not registered SQL functions — build
  // them directly, pairing both sides on xxhash64 of the key exactly as
  // the runtime-filter rule does.
  private def bloomAgg(key: Column, items: Long, bits: Long): Column =
    GraftShim.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftShim.expression(key))),
      org.apache.spark.sql.catalyst.expressions.Literal(items),
      org.apache.spark.sql.catalyst.expressions.Literal(bits)).toAggregateExpression())

  /** The sketch as a scalar subquery (might_contain requires a constant or
    * scalar-subquery bloom): built distributedly once, its result reused
    * as a runtime constant by every probe task.
    */
  private def bloomSketch(right: DataFrame, key: String, items: Long, bits: Long): Column = {
    val agg = right.agg(bloomAgg(col(key), items, bits).as("__bf"))
    GraftShim.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(agg.queryExecution.analyzed))
  }

  private def mightContain(bloom: Column, key: Column): Column =
    GraftShim.column(BloomFilterMightContain(
      GraftShim.expression(bloom),
      new XxHash64(Seq(GraftShim.expression(key)))))

  def bloomAntiJoin(left: DataFrame, right: DataFrame, key: String,
                    expectedItems: Long, numBits: Long): DataFrame = {
    // empty build side → null sketch → might_contain is null: that means
    // "definitely absent", not "drop the row"
    val mc = coalesce(
      mightContain(bloomSketch(right, key, expectedItems, numBits), col(key)),
      lit(false))
    val definite   = left.filter(!mc)
    val candidates = left.filter(mc)
      .join(right.select(col(key)), Seq(key), "left_anti")
    definite.unionByName(candidates)
  }
}
