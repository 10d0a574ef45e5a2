package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable-sketch aggregates and the watermarked stream-stream join,
  * under the oracle gate.
  *
  * The sketch queries extend the `agg_hll_mergeable` pattern (sketch per
  * partition, merge at the top — the only aggregation shape that scales to
  * 100 TB without re-scanning) to the two other sketch families Spark 4
  * ships: KLL quantiles (`kll_sketch_agg_double` / `kll_merge_agg_double`)
  * and frequent items (`approx_top_k_accumulate` / `_combine` /
  * `_estimate`). Where the sketch's output is approximate the oracle is a
  * tolerance verdict (the guarantee the sketch actually makes); where the
  * tracked-item capacity exceeds the domain the sketch is exact and the
  * oracle is a full rows+hash match.
  */
object SketchStreamQueries {

  def all: Seq[QueryDef] = Seq(

    // Mergeable quantiles: per-month KLL sketches of o_totalprice merged
    // into one, quantile estimates checked against the sketch's RANK
    // guarantee (k=200 → normalized rank error ≈1.65%; we assert ±3%):
    // the estimate must lie between the exact p∓0.03 quantiles. This is
    // the scale path for percentiles — per-partition sketches are a few KB
    // regardless of row count, and merge is associative, so a 100 TB
    // quantile costs one scan + a tiny shuffle, unlike exact percentile
    // whose state is the full value multiset.
    QueryDef(
      "agg_kll_mergeable",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val perMonth = o
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(expr("kll_sketch_agg_double(o_totalprice, 200)").as("sk"))
        val est = perMonth.agg(
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.25)").as("e25"),
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)").as("e50"),
          expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.75)").as("e75"),
          count(lit(1)).as("n_months"))
        val bounds = o.agg(
          expr("percentile(o_totalprice, 0.22)").as("lo25"),
          expr("percentile(o_totalprice, 0.28)").as("hi25"),
          expr("percentile(o_totalprice, 0.47)").as("lo50"),
          expr("percentile(o_totalprice, 0.53)").as("hi50"),
          expr("percentile(o_totalprice, 0.72)").as("lo75"),
          expr("percentile(o_totalprice, 0.78)").as("hi75"))
        est.crossJoin(broadcast(bounds)).select(
          (col("e25") >= col("lo25") && col("e25") <= col("hi25")).as("q25_in_rank_tol"),
          (col("e50") >= col("lo50") && col("e50") <= col("hi50")).as("q50_in_rank_tol"),
          (col("e75") >= col("lo75") && col("e75") <= col("hi75")).as("q75_in_rank_tol"),
          col("n_months"))
      },
      Some("""SELECT true AS q25_in_rank_tol, true AS q50_in_rank_tol,
             |  true AS q75_in_rank_tol,
             |  count(DISTINCT date_trunc('month', o_orderdate)) AS n_months
             |FROM orders""".stripMargin)
    ),

    // Mergeable frequent-items: per-month ApproxTopK states combined into
    // one, then estimated. o_orderpriority's domain (5) is far below the
    // tracked-item capacity (64), so the sketch is in its EXACT regime —
    // counts are deterministic and the oracle is a full hash match against
    // the true group counts. At 100 TB the same plan holds with
    // maxItemsTracked sized to the error budget (count error ≤ N/capacity
    // once the domain overflows it); the exact regime is also the right
    // production setting for low-cardinality heavy-hitter columns.
    QueryDef(
      "agg_topk_mergeable",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val perMonth = o
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(expr("approx_top_k_accumulate(o_orderpriority, 64)").as("st"))
        perMonth
          .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 64), 8)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("o_orderpriority"), col("e.count").as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Sketch composition: set-intersection cardinality from HLL sketches by
    // inclusion–exclusion (|A∩B| ≈ est(A) + est(B) − est(A∪B)) — the
    // audience-overlap / cross-corpus-contamination estimator. Three
    // estimates at lgK=14 (≈0.8% standard error each) compound, so the
    // verdict asserts ±5% of the exact intersection. One scan builds both
    // sketches (conditional inputs), one more computes the exact answer
    // for the verdict; at 100 TB only the sketch scan exists and the union
    // is a byte-sized merge.
    QueryDef(
      "agg_hll_intersection",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val sk = o.agg(
          expr("hll_sketch_agg(CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END, 14)").as("ska"),
          expr("hll_sketch_agg(CASE WHEN o_orderpriority = '5-LOW' THEN o_custkey END, 14)").as("skb"))
        val est = sk.select(
          expr("hll_sketch_estimate(ska)").as("ea"),
          expr("hll_sketch_estimate(skb)").as("eb"),
          expr("hll_sketch_estimate(hll_union(ska, skb))").as("eu"))
        val exact = o.groupBy(col("o_custkey")).agg(
          max(col("o_orderpriority") === "1-URGENT").as("in_a"),
          max(col("o_orderpriority") === "5-LOW").as("in_b"))
          .agg(sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("exact_inter"),
            sum(when(col("in_a"), 1L).otherwise(0L)).as("exact_a"),
            sum(when(col("in_b"), 1L).otherwise(0L)).as("exact_b"))
        est.crossJoin(broadcast(exact)).select(
          (abs(col("ea") + col("eb") - col("eu") - col("exact_inter"))
            <= col("exact_inter") * 0.05).as("inter_within_tol"),
          col("exact_a"), col("exact_b"), col("exact_inter"))
      },
      Some("""SELECT true AS inter_within_tol,
             |  count(DISTINCT CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END) AS exact_a,
             |  count(DISTINCT CASE WHEN o_orderpriority = '5-LOW' THEN o_custkey END) AS exact_b,
             |  (SELECT count(*) FROM
             |    (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |     INTERSECT
             |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')) AS exact_inter
             |FROM orders""".stripMargin)
    ),

    // Watermarked stream-stream join under the oracle gate: view events
    // joined to the same user's purchases within the following hour — the
    // canonical click-to-conversion shape. Both sides are unbounded
    // streams; the time-bound predicate plus the 10-minute watermark is
    // what lets the engine evict buffered state, so an infinite join runs
    // in bounded memory (StreamOps.streamStreamJoin). The batch oracle is
    // the identical time-bounded self-join.
    QueryDef(
      "ev_stream_stream_join",
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/events.parquet")
        val streamDir = java.nio.file.Files.createTempDirectory("ev_ssj")
        java.nio.file.Files.createSymbolicLink(
          streamDir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$dir/events.parquet"))
        def side(evType: String, idAs: String, tsAs: String) = {
          val st = s.readStream.schema(raw.schema).parquet(streamDir.toString)
          Tables.normalizeTs(st, "ts")
            .filter(col("event_type") === evType)
            .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
        }
        val joined = graft.streaming.StreamOps.streamStreamJoin(
          side("view", "view_id", "view_ts"),
          side("purchase", "purchase_id", "purchase_ts"),
          "user_id", "view_ts", "purchase_ts",
          watermarkDelay = "10 minutes", joinWindow = "1 hour")
        val name = s"ev_ssj_${System.nanoTime()}"
        // statePartitions: a stream-stream join keeps FOUR state stores per
        // partition, so the per-micro-batch commit cost is 4× the partition
        // count no matter how small the batch — size it to the stream
        // (measured here: 6.1 s at the 32-partition session default → 2.4 s
        // at 8, identical results; see StreamOps.withStatePartitions)
        graft.streaming.StreamOps.runToMemory(joined, name,
          outputMode = "append", statePartitions = Some(8))
        s.table(name)
          .select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
          .orderBy("user_id", "view_id", "purchase_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |              CAST(ts AS TIMESTAMP) AS ts FROM events)
             |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             |  v.ts AS view_ts, p.ts AS purchase_ts
             |FROM ev v JOIN ev p
             |  ON v.user_id = p.user_id AND v.event_type = 'view'
             |  AND p.event_type = 'purchase'
             |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
             |ORDER BY 1, 2, 3""".stripMargin)
    )
  )
}
