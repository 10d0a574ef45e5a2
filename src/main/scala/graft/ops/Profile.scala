package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic column profiling — the `describe`-style data-quality sweep a
  * pipeline runs before trusting a new drop of data (row counts, null
  * counts, cardinalities, ranges, exact means per column).
  *
  * Scale: ALL columns profile in ONE aggregation pass over the table —
  * the per-column metrics are parallel agg expressions collapsed map-side,
  * and the (tiny, #cols-row) result is unpivoted with `stack` AFTER the
  * aggregation, so the unpivot multiplies a handful of rows, never the
  * table. The exact `countDistinct` per column plans as an Expand (one
  * pass, rows × #cols intermediate): fine for a profiling sweep; swap in
  * `approx_count_distinct` when an estimate is enough at 100 TB.
  *
  * Means are decimal-exact sums divided once in double, so any row order
  * (and any engine) produces identical bits.
  */
object Profile {

  def profileNumeric(df: DataFrame, cols: Seq[String],
                     sumType: String = "decimal(18,4)"): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(sumType)).cast("double").as(s"${c}__sum"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`, `${c}__sum`"
    ).mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n, n_null, n_distinct, min_v, max_v, sum_v)")
      .withColumn("mean_v", col("sum_v") / (col("n") - col("n_null")).cast("double"))
      .select("col_name", "n", "n_null", "n_distinct", "min_v", "max_v", "mean_v")
  }
}
