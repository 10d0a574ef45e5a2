package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting.
  *
  * A training-data pipeline needs REPRODUCIBLE population assignment: the
  * same document must land in the same sample/split on every run, on any
  * engine, at any parallelism — `rand()` and `df.sample` give none of that.
  * We hash the stable id with md5 and take the first 3 hex digits as a
  * bucket in [0, 4096); samples and split assignments are bucket ranges.
  *
  * Scale: a narrow, codegen'd column expression — no shuffle, no state, no
  * driver round-trip. At 100 TB a hash-sample is a plain filter evaluated
  * behind the scan, and split assignment is a free projected column.
  *
  * Generalizes the reference's MD5 row fingerprint
  * (`lib/etl/loading.rb:254-270`) from change detection to population
  * assignment. Hashing is md5-over-strings like all graft dedup hashing, so
  * a SQL oracle reproduces it bit-for-bit (NOTES.md "hash portability").
  */
object Sampling {

  val Buckets: Int = 4096

  /** Hex-digit value without a 16-way CASE: ascii(d) - (48 | 87). */
  private def hexVal(d: Column): Column =
    ascii(d) - when(d >= "a", 87).otherwise(48)

  /** Bucket in [0, 4096): value of the first 3 hex digits of
    * md5(cast(id as string)). Uniform because md5 is.
    */
  def hashBucket(id: Column): Column = {
    val h = md5(id.cast("string"))
    (hexVal(substring(h, 1, 1)) * 256 +
      hexVal(substring(h, 2, 1)) * 16 +
      hexVal(substring(h, 3, 1))).cast("int")
  }

  /** Deterministic ~`fraction` sample: rows whose bucket falls below
    * `fraction * 4096`. Re-running, re-partitioning, or re-ordering the
    * input cannot change membership.
    */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    df.filter(hashBucket(col(idCol)) < threshold(fraction))
  }

  /** Stratified deterministic sampling: a different fraction per stratum
    * value (e.g. downsample dominant languages, keep rare ones whole),
    * `defaultFraction` for unlisted strata. Same md5-bucket membership as
    * [[sampleByHash]] — rerun/repartition-invariant per id, and a plain
    * codegen'd filter at any scale.
    */
  def stratifiedSampleByHash(df: DataFrame, idCol: String, strataCol: String,
                             fractions: Seq[(String, Double)],
                             defaultFraction: Double = 0.0): DataFrame = {
    (fractions.map(_._2) :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f"))
    val thr = fractions.foldRight(lit(threshold(defaultFraction)): Column) {
      case ((k, f), els) => when(col(strataCol) === k, lit(threshold(f))).otherwise(els)
    }
    df.filter(hashBucket(col(idCol)) < thr)
  }

  /** Split assignment by cumulative bucket thresholds, e.g.
    * `Seq("train" -> 0.90, "valid" -> 0.05, "test" -> 0.05)` (weights must
    * sum to 1; the last split absorbs the rounding remainder).
    */
  def splitColumn(id: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $weights")
    val b = hashBucket(id)
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(threshold)
    weights.map(_._1).zip(cum).init.foldRight(lit(weights.last._1): Column) {
      case ((name, hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
  }

  /** Bucket threshold for a cumulative fraction — shared with the SQL
    * oracle generator so both engines use identical integer cut points.
    */
  def threshold(fraction: Double): Int = math.round(fraction * Buckets).toInt

  val DefaultSplits: Seq[(String, Double)] =
    Seq("train" -> 0.90, "valid" -> 0.05, "test" -> 0.05)

  /** 16^13 = 2^52 — denominator for the 13-hex-digit md5 uniform; shared
    * with the SQL oracle generator.
    */
  val UniformDenom: Double = 4503599627370496.0

  /** Deterministic uniform in (0,1) from a stable id: the first 13 hex
    * digits of md5 (52 bits, exact in a double), offset by 0.5 so u is
    * never exactly 0 or 1.
    */
  def uniformFromId(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("double") + 0.5) /
      UniformDenom

  /** Weighted-sampling key ln(u)/w (Efraimidis–Spirakis via the log
    * transform): taking the k LARGEST keys draws a weighted sample without
    * replacement — selection probability proportional to weight, membership
    * reproducible on any engine at any parallelism. Rounded to 9 dp so
    * libm `log` ulp differences between engines cannot flip a rank; ties
    * are broken by id downstream.
    */
  def weightedKey(id: Column, weight: Column): Column =
    round(log(uniformFromId(id)) / weight.cast("double"), 9)

  /** Epoch-shuffle key: md5("<epoch>|<id>") — a different but fully
    * deterministic corpus order per training epoch, reproducible on any
    * engine at any parallelism (`rand()` with a seed is neither stable
    * across partitionings nor portable across engines).
    */
  def epochShuffleKey(id: Column, epoch: Int): Column =
    md5(concat(lit(s"$epoch|"), id.cast("string")))

  /** Total-order epoch shuffle: range-repartition + in-partition sort on
    * the epoch key — a scalable total sort (no global single-partition
    * window), so writing the result yields the epoch's corpus order.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    val keyed = df.withColumn("__ek", epochShuffleKey(col(idCol), epoch))
    keyed.repartitionByRange(col("__ek"))
      .sortWithinPartitions("__ek")
      .drop("__ek")
  }

  /** Deterministic shard assignment for training-data export: shard =
    * hashBucket(id) mod nShards. When nShards divides 4096 the shards are
    * exactly bucket-uniform; assignment is engine-portable and
    * rerun/repartition-invariant like every Sampling op, so a training
    * loader can address shard subsets stably across pipeline reruns.
    */
  def shardColumn(id: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    (hashBucket(id) % nShards).cast("int")
  }

  /** Hash-sharded export layout: `shard=<k>/` parquet directories with rows
    * co-located by shard (ONE shuffle on the shard id, then a partitioned
    * write). The layout a distributed training job reads: each data-loader
    * rank lists exactly its own shard directories.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String): Unit =
    df.withColumn("shard", shardColumn(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-source keep fractions that rebalance observed counts toward
    * `targetShares` WITHOUT upsampling: the binding source (smallest
    * count/share ratio) is kept whole and every other source is
    * downsampled to match its implied total. Pure arithmetic over the
    * bounded (source → count) map so the SQL oracle can replay it
    * term-for-term: scale = min(count/share), rate = min(1, scale·share/count).
    */
  def rebalanceRates(counts: Map[String, Long],
                     targetShares: Seq[(String, Double)]): Seq[(String, Double)] = {
    require(targetShares.forall(_._2 > 0.0), s"shares must be positive: $targetShares")
    val scale = targetShares.map { case (s, w) =>
      counts.getOrElse(s, 0L).toDouble / w
    }.min
    targetShares.map { case (s, w) =>
      val c = counts.getOrElse(s, 0L).toDouble
      s -> (if (c == 0.0) 0.0 else math.min(1.0, scale * w / c))
    }
  }

  /** Rebalance a corpus toward target source-mix shares (the domain-mixing
    * step of LM data curation: cap over-represented crawl sources, keep
    * curated sources whole). Counts are one aggregate row per source —
    * bounded metadata collected to the driver — and membership is the same
    * deterministic md5-bucket filter as every Sampling op: a codegen'd
    * scan-side predicate, no shuffle, rerun-invariant.
    */
  def rebalanceToShares(df: DataFrame, idCol: String, sourceCol: String,
                        targetShares: Seq[(String, Double)]): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stratifiedSampleByHash(df, idCol, sourceCol,
      rebalanceRates(counts, targetShares), defaultFraction = 0.0)
  }

  /** Temperature-flattened source mixing (the T5/multilingual-LM recipe):
    * target share of source i ∝ countᵢ^α — α=1 keeps natural proportions,
    * α→0 approaches uniform, and the usual α∈(0,1) upsamples low-resource
    * sources RELATIVE to their natural share. Downsample-only like
    * [[rebalanceToShares]] (rates cap at 1; the largest-excess source sets
    * the scale), membership via the deterministic md5-bucket sampler —
    * rerun-, repartition-, and engine-reproducible. Driver-side work is
    * one count row per source. NOTE on determinism: α=0.5 shares are
    * IEEE-exact (sqrt is correctly rounded everywhere); other α go
    * through `pow`, whose last-ulp rounding may differ across libm
    * implementations — fine for sampling, but pin α=0.5 when an
    * exact-match oracle is in play.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shares = counts.toSeq.sortBy(_._1).map { case (s, c) =>
      s -> (if (alpha == 0.5) math.sqrt(c.toDouble)
            else math.pow(c.toDouble, alpha))
    }
    stratifiedSampleByHash(df, idCol, sourceCol,
      rebalanceRates(counts, shares), defaultFraction = 0.0)
  }

  /** Top-k weighted sample: (id, w, skey) rows with the k largest keys.
    * Global top-k is TakeOrdered — per-partition heads then a driver merge
    * of k·partitions rows, never a full sort — so this scales to any
    * corpus a scan scales to. Non-positive weights are excluded (a
    * zero-weight row must never be drawn; ln(u)/0 would be -Inf anyway).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int): DataFrame =
    df.withColumn("w", weight.cast("double"))
      .filter(col("w") > 0)
      .select(col(idCol), col("w"), weightedKey(col(idCol), col("w")).as("skey"))
      .orderBy(desc("skey"), col(idCol))
      .limit(k)

  /** Sequence packing for pretraining: documents are concatenated in id
    * order within each shard and cut into fixed `chunkTokens` training
    * sequences; each doc reports the byte-range analog in token space —
    * its start offset, the first and last chunk it lands in, and how many
    * chunk boundaries cross it. This is the "concatenate and chunk"
    * step of every LM data loader, computed as metadata so the writer
    * can materialize sequences later.
    *
    * Scale: the running total is a window SUM over BIGINTs — exact in
    * any order — partitioned BY SHARD, so parallelism is the shard
    * count and no global single-partition window exists (the same
    * reason [[epochShuffle]] range-repartitions). Each training rank
    * packs its own shard independently, which is exactly how a
    * distributed loader consumes it.
    */
  def packChunks(df: DataFrame, idCol: String, nTokensCol: String,
                 nShards: Int, chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), col(nTokensCol).cast("long").as("n_tokens"),
        shardColumn(col(idCol), nShards).as("shard"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk_first", (col("start_tok") / chunkTokens).cast("long"))
      .withColumn("chunk_last",
        (greatest(col("start_tok") + col("n_tokens") - 1, col("start_tok")) /
          chunkTokens).cast("long"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("start_tok"),
        col("chunk_first"), col("chunk_last"))
  }
}
