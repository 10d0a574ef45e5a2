package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the canonical "operator Spark lacks".
  * Implemented by COMPOSITION (builder-prompt preference (a)): tag and
  * union both sides, then carry the last right-side payload forward with a
  * window over (keys, time) — ONE shuffle on the keys, no range cross
  * product, no custom physical operator.
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN … ON key = key AND r.t <= l.t`:
  * each left row gets the latest right row with `rightTime <= leftTime`
  * (inclusive — a right row at the exact left timestamp matches; at ties
  * right sorts before left).
  *
  * At 100 TB: the union is column-aligned concatenation (no data
  * movement); the single window shuffle partitions by `keys`, so state per
  * task is one partition's timeline — same scaling shape as
  * sessionization. A sort-merge custom SparkPlan would save the
  * carried-null columns' width; measured need first (docs/SCALE.md).
  */
object AsOf {

  /** @param payload right-side columns to carry (already selected/renamed
    *                on `right`); all other right columns are dropped.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col): _*)
      .withColumn("__payload", struct(payload.map(col): _*))
      .drop(payload: _*)
      .withColumn("__is_left", lit(0))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // right (0) sorts before left (1) at equal times → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = combined.withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
    val outPayload = payload.map(p => col(s"__m.$p").as(p))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ outPayload: _*)
  }

  /** Forward as-of: each left row matched to the EARLIEST right row
    * at-or-after it per key — the mirror of [[asofJoin]] through the same
    * union-plus-window trick, with the frame flipped to
    * [current, following) and left rows ordered before right at equal
    * times so an exactly-simultaneous right row still matches. One
    * shuffle on the keys, state per task = one partition's timeline.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col): _*)
      .withColumn("__payload", struct(payload.map(col): _*))
      .drop(payload: _*)
      .withColumn("__is_left", lit(0))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // left (1) sorts BEFORE right (0) at equal times → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = combined.withColumn("__m",
      first(col("__payload"), ignoreNulls = true).over(w))
    val outPayload = payload.map(p => col(s"__m.$p").as(p))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ outPayload: _*)
  }
}
