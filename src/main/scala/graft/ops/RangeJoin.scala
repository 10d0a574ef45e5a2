package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) joins that survive scale.
  *
  * A pure range predicate (`point >= start && point < end`) has no
  * equi-key, so Spark falls back to BroadcastNestedLoopJoin — every point
  * row swept against every interval. The standard fix is bucketing: derive
  * a shared integer bucket (coarse time grid) on both sides, explode each
  * interval over the buckets it overlaps, and equi-join on the bucket with
  * the range predicate left as a residual filter. The plan becomes a
  * BroadcastHashJoin (or shuffled hash join for a big interval side) whose
  * cost is points × avg-intervals-per-bucket, not points × intervals.
  */
object RangeJoin {

  private val Epoch = lit("1970-01-01").cast("date")

  /** Date-grained bucketed interval join: rows of `points` matched to every
    * row of `intervals` whose [startCol, endCol) contains `pointCol`.
    * `bucketDays` is the grid width — pick it near the typical interval
    * length so each interval explodes into ~2 bucket rows.
    *
    * The interval side is broadcast (dimension-sized by assumption); each
    * point carries exactly one bucket, so containment matches are never
    * duplicated and no post-join distinct is needed.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                   startCol: String, endCol: String, bucketDays: Int): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive: $bucketDays")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(datediff(c.cast("date"), Epoch) / bucketDays)
    val pB = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val iB = intervals
      .filter(col(startCol) < col(endCol)) // empty intervals match nothing
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol)),
        bucketOf(date_sub(col(endCol).cast("date"), 1))))) // end is exclusive
    pB.join(broadcast(iB), Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Bucketed interval-OVERLAP join: every (left, right) pair whose CLOSED
    * timestamp intervals [lStart, lEnd] and [rStart, rEnd] intersect
    * (closed ends so zero-length intervals — e.g. single-event sessions —
    * still participate). Both sides explode onto a shared `cellSeconds`
    * grid and equi-join on the cell, so the pair cost is per-cell density,
    * not |L|·|R|; the exact overlap predicate rides as a residual. Each
    * pair is emitted exactly ONCE — in the first cell the two intervals
    * share (the later of the two start cells) — so no post-join distinct
    * and its re-shuffle. Shuffled hash/SMJ on the cell handles two big
    * sides; pick `cellSeconds` near the typical interval length so each
    * interval lands in ~2 cells.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  cellSeconds: Long): DataFrame = {
    require(cellSeconds > 0, s"cellSeconds must be positive: $cellSeconds")
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c) / cellSeconds)
    def cells(s: String, e: String) =
      explode(sequence(cellOf(col(s)), cellOf(col(e))))
    val lC = left.filter(col(lStart) <= col(lEnd))
      .withColumn("__cell", cells(lStart, lEnd))
    val rC = right.filter(col(rStart) <= col(rEnd))
      .withColumn("__cell", cells(rStart, rEnd))
    lC.join(rC, Seq("__cell"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__cell") === greatest(cellOf(col(lStart)), cellOf(col(rStart))))
      .drop("__cell")
  }
}
