package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic column profiling — the `describe`-style data-quality sweep a
  * pipeline runs before trusting a new drop of data (row counts, null
  * counts, cardinalities, ranges, exact means per column).
  *
  * Scale: ALL columns profile in ONE aggregation pass over the table —
  * the per-column metrics are parallel agg expressions collapsed map-side,
  * and the (tiny, #cols-row) result is unpivoted with `stack` AFTER the
  * aggregation, so the unpivot multiplies a handful of rows, never the
  * table.
  *
  * Cardinalities: the DEFAULT `exactDistinct = false` uses
  * `approx_count_distinct` (HLL) — a regular single-pass aggregate with a
  * fixed-size sketch per column, no row multiplication. The exact form
  * (needed for oracle parity) runs ONE SINGLE-distinct aggregate per
  * column plus the shared non-distinct pass, cross-joined as 1-row
  * frames: several narrow scans of a columnar projection instead of the
  * multi-distinct Expand that multiplies every input row #cols-fold
  * before the shuffle — cheaper at every scale for columnar sources,
  * and each single-distinct agg takes Spark's two-phase
  * partial-distinct plan with no row multiplication at all.
  *
  * Means are decimal-exact sums divided once in double, so any row order
  * (and any engine) produces identical bits.
  */
object Profile {

  def profileNumeric(df: DataFrame, cols: Seq[String],
                     sumType: String = "decimal(18,4)",
                     exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(sumType)).cast("double").as(s"${c}__sum")) ++
        (if (exactDistinct) Nil
         else Seq(approx_count_distinct(col(c)).as(s"${c}__nd")))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    // exact cardinalities: one SINGLE-distinct aggregate per column
    // (two-phase partial-distinct plan, no Expand) cross-joined as 1-row
    // frames — see the scale note above
    val one =
      if (!exactDistinct) base
      else cols.map(c => df.agg(countDistinct(col(c)).as(s"${c}__nd")))
        .foldLeft(base)(_.crossJoin(_))
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`, `${c}__sum`"
    ).mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_v, max_v, sum_v)")
      .withColumn("mean_v", col("sum_v") / (col("n") - col("n_null")).cast("double"))
      .select("col_name", "n", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
  }

  /** Pairwise Pearson correlations for every column pair in ONE
    * aggregation pass: Σx, Σx², Σxy accumulate as exact decimals (the
    * corpus' numerics are fixed-point), the r formula runs in doubles on
    * the bounded post-agg row, and the pair unpivot multiplies #pairs
    * rows, never the table — the same shape as [[profileNumeric]].
    * `built-in corr()` would be float-summed and engine-specific; this is
    * bit-portable.
    */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2)
    val dec = (c: String) => col(c).cast("decimal(15,4)")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    val aggs = cols.flatMap { c =>
      Seq(sum(dec(c)).cast("double").as(s"s__$c"),
        sum((dec(c) * dec(c)).cast("decimal(31,8)")).cast("double").as(s"ss__$c"))
    } ++ pairs.map { case (a, b) =>
      sum((dec(a) * dec(b)).cast("decimal(31,8)")).cast("double").as(s"sp__${a}__$b")
    } :+ count(lit(1)).cast("double").as("n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', `n`, `s__$a`, `s__$b`, `ss__$a`, `ss__$b`, `sp__${a}__$b`"
    }.mkString(", ")
    one.selectExpr(s"stack(${pairs.size}, $stackArgs) AS " +
        "(col_x, col_y, n, sx, sy, sxx, syy, sxy)")
      .withColumn("r", round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
      .select("col_x", "col_y", "r")
  }

  /** Per-group simple linear regression + covariance + correlation of
    * `yCol` on `xCol`, from ONE aggregation pass of exact-decimal
    * sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy). The closed-form
    * outputs (slope, intercept, r², covar_pop, covar_samp, corr) are then
    * evaluated in doubles on the bounded post-agg rows.
    *
    * Built-in `regr_slope`/`covar_samp`/`corr` stream co-moments whose
    * float result depends on partition merge order — not reproducible
    * across engines or even across partitionings. Decimal sums are exact
    * under any order, so any engine running the same closed form on them
    * produces identical bits (the [[correlations]] pattern, grouped).
    * Scale: a plain partial-aggregated groupBy — one shuffle of six
    * decimals per group.
    */
  def regression(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val dec = (c: String) => col(c).cast("decimal(15,4)")
    val prod = (a: String, b: String) => (dec(a) * dec(b)).cast("decimal(31,8)")
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(dec(xCol)).cast("double").as("sx"),
        sum(dec(yCol)).cast("double").as("sy"),
        sum(prod(xCol, xCol)).cast("double").as("sxx"),
        sum(prod(yCol, yCol)).cast("double").as("syy"),
        sum(prod(xCol, yCol)).cast("double").as("sxy"))
    val cxy = col("n") * col("sxy") - col("sx") * col("sy")
    val vx  = col("n") * col("sxx") - col("sx") * col("sx")
    val vy  = col("n") * col("syy") - col("sy") * col("sy")
    agg.select(col(groupCol),
      col("n").cast("long").as("n"),
      round(cxy / vx, 6).as("slope"),
      round((col("sy") * col("sxx") - col("sx") * col("sxy")) / vx, 6).as("intercept"),
      round(cxy * cxy / (vx * vy), 6).as("r2"),
      round(cxy / (col("n") * col("n")), 6).as("covar_pop"),
      round(cxy / (col("n") * (col("n") - lit(1.0))), 6).as("covar_samp"),
      round(cxy / (sqrt(vx) * sqrt(vy)), 6).as("corr_xy"))
  }

  /** Population-stability index between two cohorts of the same table
    * (e.g. last month's orders vs this month's) over fixed-width value
    * buckets: per-bucket shares p (cohort A) and q (cohort B) and the PSI
    * contribution (p−q)·ln(p/q). Σ psi_term > 0.2 is the conventional
    * "distribution shifted" alarm for a drift monitor.
    *
    * One aggregation pass computes BOTH cohorts' bucket counts
    * (conditional counts collapse map-side); totals divide out of the
    * bounded post-agg frame via a 1-row broadcast. Fixed bucket edges keep
    * the result engine-portable (data-derived quantile edges would make
    * the buckets themselves float-fragile). Buckets missing from either
    * cohort are excluded — the ε-free PSI needs both supports.
    */
  def driftPsi(df: DataFrame, valueCol: Column, condA: Column, condB: Column,
               bucketWidth: Double, maxBucket: Int): DataFrame = {
    val bucket = least(floor(valueCol / bucketWidth).cast("int"), lit(maxBucket))
    val b = df.groupBy(bucket.as("bucket"))
      .agg(count(when(condA, 1)).cast("double").as("na"),
        count(when(condB, 1)).cast("double").as("nb"))
    val tot = b.agg(sum("na").as("ta"), sum("nb").as("tb"))
    b.crossJoin(broadcast(tot))
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("bucket"),
        round(col("na") / col("ta"), 6).as("p"),
        round(col("nb") / col("tb"), 6).as("q"),
        round((col("na") / col("ta") - col("nb") / col("tb")) *
          log((col("na") / col("ta")) / (col("nb") / col("tb"))), 6).as("psi_term"))
  }
}
