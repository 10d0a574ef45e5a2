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

  /** Per-group z-score outliers: group mean/std from ONE aggregation pass
    * whose sums are decimal-exact (values are fixed-point in the corpus, so
    * Σv and Σv² are exact integers-in-decimal; the double arithmetic on
    * top is a fixed expression tree any engine reproduces bit-for-bit),
    * then a broadcast join of the (tiny, one row per group) stats back
    * onto the stream and a codegen'd filter on |z| ≥ threshold. The
    * anomaly-detection primitive: no window, no second scan of the data
    * per group, shuffles once for the stats and never for the scoring.
    */
  def outliers(df: DataFrame, typeCol: String, valCol: String, idCol: String,
               zThreshold: Double): DataFrame = {
    val dec = col(valCol).cast("decimal(12,4)")
    val stats = df.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum((dec * dec).cast("decimal(28,8)")).cast("double").as("ss"))
      // a single-row group has no sample variance: ANSI mode throws on ÷0
      // (even double ÷ 0.0), so guard with when() — null std → null z →
      // dropped by the filter
      .withColumn("mean", col("s") / col("n").cast("double"))
      .withColumn("std", when(col("n") > 1,
        sqrt((col("ss") - col("s") * col("s") / col("n").cast("double")) /
          (col("n") - 1).cast("double"))))
      .select(col(typeCol), col("mean"), col("std"))
    df.join(broadcast(stats), Seq(typeCol))
      .withColumn("z", round((col(valCol) - col("mean")) / col("std"), 4))
      .filter(abs(col("z")) >= zThreshold)
      .select(col(idCol), col(typeCol), col(valCol), col("z"))
  }

  /** Robust (median/MAD) outliers — the breakdown-resistant complement of
    * [[outliers]]: a mean/std detector is dragged by the very anomalies it
    * hunts; medians have a 50% breakdown point. Two aggregation passes
    * (per-group median, then the deviation median) with the tiny stats
    * frame broadcast back; robust z = 0.6745·(v − med)/MAD, the standard
    * consistency constant. Groups with MAD = 0 are dropped — when over
    * half the values are identical the MAD definition flags nothing.
    *
    * Memory plan: the DEFAULT medians use `approx_percentile` (GK sketch,
    * fixed-size buffer per group regardless of group size) — a 100×
    * skewed group costs the sketch, not the group. `exactPercentile =
    * true` switches to exact interpolated `percentile`, which buffers
    * every value of a group in its aggregation buffer: engine-portable
    * (what the DuckDB-oracled query pins) but an OOM hazard on a hot key
    * at scale — keep it for oracle-scale verification only.
    */
  def outliersRobust(df: DataFrame, typeCol: String, valCol: String,
                     idCol: String, zThreshold: Double,
                     exactPercentile: Boolean = false,
                     accuracy: Int = 10000): DataFrame = {
    def p50(c: String): Column =
      if (exactPercentile) expr(s"percentile($c, 0.5)")
      else expr(s"approx_percentile($c, 0.5, $accuracy)")
    val med = df.groupBy(col(typeCol))
      .agg(p50(valCol).as("med"))
    val mad = df.join(broadcast(med), Seq(typeCol))
      .withColumn("__ad", abs(col(valCol) - col("med")))
      .groupBy(col(typeCol))
      .agg(p50("__ad").as("mad"), first(col("med")).as("med"))
    df.join(broadcast(mad), Seq(typeCol))
      .filter(col("mad") > 0)
      .withColumn("rz", round(lit(0.6745) * (col(valCol) - col("med")) / col("mad"), 4))
      .filter(abs(col("rz")) >= zThreshold)
      .select(col(idCol), col(typeCol), col(valCol), col("rz"))
  }

  /** Ordered funnel with a per-stage conversion window: stage i+1 counts
    * only if it happens AFTER the user's stage-i time and within `maxGap`
    * of it. One left join + conditional min per stage, all keyed on the
    * user — after the first shuffle every later join reuses the same
    * hash partitioning, so an n-stage funnel is one real shuffle plus
    * n−1 co-partitioned joins. Output: per-user stage times t1..tn and
    * `reached` (how deep the user got).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String], maxGap: String): DataFrame = {
    require(stages.size >= 2, "funnel needs at least two stages")
    var cur = df.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val nxt  = s"t${i + 2}"
      val stageEv = df.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("__ts"))
      val keep = (1 to i + 1).map(j => s"t$j")
      cur = cur.join(stageEv, Seq(userCol), "left_outer")
        .groupBy(col(userCol) +: keep.map(col): _*)
        .agg(min(when(col("__ts") > col(prev) &&
          col("__ts") <= col(prev) + expr(s"INTERVAL $maxGap"), col("__ts"))).as(nxt))
    }
    val reached = stages.indices
      .map(i => col(s"t${i + 1}").isNotNull.cast("int")).reduce(_ + _)
    cur.withColumn("reached", reached)
  }

  /** Retention cohorts: users grouped by first-active day; n_users counts
    * how many of each cohort were active k days later. The (user, day)
    * de-dup means each user contributes at most one row per (cohort, k),
    * so the final count is a plain count — no count-distinct expand. Two
    * shuffles (user-day distinct, cohort-k agg) at any scale.
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    val cohort = days.groupBy(col(userCol)).agg(min("day").as("cohort_day"))
    days.join(cohort, Seq(userCol))
      .withColumn("k", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "k")
      .agg(count(lit(1)).as("n_users"))
  }

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
