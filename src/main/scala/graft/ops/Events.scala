package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (batch-first; the Structured Streaming variants in
  * [[graft.streaming]] reuse the same aggregation shapes). The reference has
  * no streams — its nearest analog is the cron-daily batch cycle + the
  * incremental watermark (SURVEY.md §2.10); these operators are the
  * north-star extension over the `events` table.
  */
object Events {

  /** Tumbling-window aggregation via the built-in `window()` — groups by
    * (window, event_type). Shuffles once on the grouping key; partial
    * aggregation is map-side (hash agg), so 100 TB of events reduce before
    * the exchange.
    */
  def tumblingAgg(df: DataFrame, tsCol: String, duration: String): DataFrame =
    df.groupBy(window(col(tsCol), duration).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"), col("min_value"), col("max_value"))

  /** Sliding-window aggregation (window + slide). */
  def slidingAgg(df: DataFrame, tsCol: String, duration: String, slide: String): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. lag + running sum
    * over a per-user window — one shuffle on user_id; at scale the per-user
    * event counts bound window-state memory, not total volume. Ties on ts
    * break by `tieCol` for determinism.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int, tieCol: String): DataFrame = {
    val w      = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val gapMs  = gapMinutes * 60L * 1000L
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prevTs.isNull || (unix_millis(col(tsCol)) - unix_millis(prevTs)) > gapMs, 1
    ).otherwise(0)
    df.withColumn("__new_s", newSession)
      .withColumn("session_id",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_s")
  }

  /** Per-session rollup on top of [[sessionize]]. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapMinutes: Int, tieCol: String): DataFrame =
    sessionize(df, userCol, tsCol, gapMinutes, tieCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Run duration per key — the reference's monitoring-view computation
    * `TIMEDIFF(IFNULL(end,NOW()), start)` (`install/etl_tables.mysql.sql:59`)
    * generalized: ms-exact, emitted in seconds at 3dp.
    */
  def durations(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))
      .withColumn("duration_sec",
        round((unix_millis(col("end_ts")) - unix_millis(col("start_ts"))) / lit(1000.0), 3))

  /** Time-series resample onto a dense per-key bucket grid with forward
    * fill: aggregate to `unit` buckets (date_trunc), materialize EVERY
    * bucket between the global min and max for every series key — empty
    * buckets get n_events=0, sum_value=null — then carry the last non-null
    * sum forward per key (`filled_value`).
    *
    * Scale shape: the grid is keys × buckets — the OUTPUT size, built from
    * a 1-row min/max broadcast and the (bounded) key dimension, never by
    * scanning events twice; the real aggregation shuffles once on
    * (key, bucket) with map-side combine, and the forward fill is one
    * window shuffle on the series key. Per-key window state is bounded by
    * the grid length, not event volume.
    */
  def resampleGapFill(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, unit: String = "hour"): DataFrame = {
    val mm = df.agg(date_trunc(unit, min(col(tsCol))).as("mn"),
      date_trunc(unit, max(col(tsCol))).as("mx"))
    val step = expr(s"INTERVAL 1 $unit")
    val grid = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(mm))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), step)).as("bucket_ts"))
    val agg = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, "bucket_ts"), "left_outer")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value", last(col("sum_value"), ignoreNulls = true).over(w))
  }
}
