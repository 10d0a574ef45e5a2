package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames.
  *
  * PageRank here runs in 64-bit FIXED-POINT arithmetic: ranks are
  * integers in units of 1/`scale`. Why fixed point: distributed
  * floating-point summation is order-dependent — the same query on the
  * same data differs in the last bits between runs, partitionings, and
  * engines, which makes results non-reproducible and unverifiable
  * against an oracle. Integer sums are associative and integer division
  * truncates identically everywhere, so iteration k's rank vector is
  * BIT-EXACT regardless of parallelism — the same trick the exact-decimal
  * aggregates use ([[Profile.regression]]).
  *
  * Scale story: each iteration is one join of the rank vector with the
  * edge list (co-locatable by pre-partitioning both on the source key)
  * plus one shuffle grouping contributions by destination — k·O(|E|)
  * total, the standard distributed PageRank shape. The rank vector is
  * |V| rows, never collected; the only driver-side scalar is |V| itself.
  * For large k, checkpoint every few rounds to bound plan depth (the
  * label-propagation loop in [[Dedup.nearDupClusters]] does the same).
  *
  * Reference scope: the reference engine ships no graph operator; this
  * extends the analytics surface with the PageRank-style quality prior
  * common in web-corpus curation (rank-weighted sampling, spam demotion).
  */
object Graph {

  /** `iterations` rounds of damped PageRank over directed `edges`
    * (`srcCol` → `dstCol`; parallel edges collapse to one). Damping is
    * the rational `dampNum/dampDen` (default 85/100). Nodes are the
    * union of edge endpoints. Dangling nodes (no out-edges) leak their
    * mass — the standard simplification; feed symmetric edges when mass
    * conservation matters.
    *
    * Update rule, all in BIGINT (init = scale div |V|):
    * {{{
    *   teleport = ((dampDen − dampNum) · init) div dampDen
    *   r₀(v)    = init
    *   rₜ₊₁(v)  = teleport + (dampNum · Σ_{u→v} (rₜ(u) div deg(u))) div dampDen
    * }}}
    * Output: (node, rank_fp) with rank_fp in 1/scale units,
    * Σ rank_fp ≤ scale. Deterministic to the bit at any parallelism.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 5): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      "damping must be a rational in [0, 1]")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nNodes = nodes.count() // the one driver-side scalar: |V|
    require(nNodes > 0, "graph has no nodes")
    val init = scale / nNodes
    val teleport = ((dampDen - dampNum) * init) / dampDen
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("rank_fp", lit(init))
    for (i <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank_fp div deg").as("c"))
      val sums = contribs.groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"), expr(
          s"$teleport + ($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen")
          .as("rank_fp"))
      // bound lineage/plan depth on long runs without changing results
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
