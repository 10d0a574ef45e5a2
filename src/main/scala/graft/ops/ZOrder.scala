package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns'
  * normalized ranks so that range-partitioning on ONE derived value keeps
  * rows close in EVERY dimension. The payoff is multi-column file
  * skipping: with per-file min/max bounds recorded (Manifest file stats),
  * a lexicographic sort prunes only the leading column — files each span
  * the full range of the second column — while a z-ordered layout tiles
  * the space, so a narrow range on ANY of the z-columns rules out most
  * files. This is Delta/Iceberg's OPTIMIZE ZORDER idea as a plain column
  * expression: normalization and bit-interleave are codegen'd arithmetic,
  * no UDF, no shuffle beyond the one range partition the rewrite needs
  * anyway.
  */
object ZOrder {

  /** Morton value of `cols` given their [min, max] ranges: each column is
    * min/max-normalized to a `bits`-bit integer rank and the ranks' bits
    * are interleaved (col i owns bit positions j·n + i). Constant-range
    * columns collapse to rank 0 — they stop influencing placement, which
    * is the right degeneration. Up to 3 columns × 16 bits stays in a
    * long's 48 low bits.
    */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size <= 3, "z-order supports 1-3 columns")
    require(cols.size == mins.size && cols.size == maxs.size)
    val scale = (1L << bits) - 1
    val ranks = cols.zip(mins.zip(maxs)).map { case (c, (lo, hi)) =>
      val range = if (hi > lo) hi - lo else 1.0
      least(lit(scale), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) / lit(range) * lit(scale.toDouble))
          .cast("long")))
    }
    ranks.zipWithIndex.map { case (r, i) =>
      shiftleft(spread(r, bits, cols.size), i)
    }.reduce(_.bitwiseOR(_))
  }

  /** Spread the low `bits` bits of `x` to every `step`-th position:
    * bit j moves to j·step. Pure shift/mask arithmetic — codegen folds it
    * into one projection.
    */
  private def spread(x: Column, bits: Int, step: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), j * step)
    }.reduce(_.bitwiseOR(_))

  /** Rewrite `df` into `nPartitions` z-ordered partitions on `cols`:
    * one tiny min/max aggregation (single row to the driver) fixes the
    * normalization, then a range partition + in-partition sort on the
    * Morton value tiles the space. Downstream per-file stats on `cols`
    * then prune on every dimension.
    */
  def cluster(df: DataFrame, cols: Seq[String], nPartitions: Int,
              bits: Int = 16): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo__$c"),
        max(col(c).cast("double")).as(s"hi__$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = cols.map(c => Option(row.getAs[java.lang.Double](s"lo__$c"))
      .map(_.doubleValue()).getOrElse(0.0))
    val maxs = cols.map(c => Option(row.getAs[java.lang.Double](s"hi__$c"))
      .map(_.doubleValue()).getOrElse(0.0))
    val z = zValue(cols.map(col), mins, maxs, bits)
    df.withColumn("__z", z)
      .repartitionByRange(math.max(1, nPartitions), col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
