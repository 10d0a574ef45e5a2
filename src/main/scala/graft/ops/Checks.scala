package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate — the dbt-test / Deequ-expectation shape
  * over the reference's per-row `quality_status` idea
  * (`lib/etl/loading.rb` stamps 'ok'): a dataset-level verdict computed
  * BEFORE publishing a load.
  *
  * Every check compiles to aggregate expressions evaluated in ONE pass
  * over the table (map-side combined; `Unique` adds the usual
  * count-distinct expand), and the verdicts unpivot from the single
  * result row — the whole gate costs one scan regardless of how many
  * checks it carries. Output: (check_name, col_name, observed, passed), where
  * `observed` is the violation measure (null fraction, duplicate count,
  * out-of-bounds count, unexpected-value count).
  */
object Checks {

  sealed trait Check {
    def name: String
    def colName: String
    /** Aggregate expression producing the observed violation measure. */
    def observed: Column
    /** Pass predicate over the observed measure. */
    def passed(observed: Column): Column
  }

  /** Null fraction of `col` must not exceed `maxNullFrac`. On an EMPTY
    * input the observed fraction is defined as 1.0 (all-null-equivalent):
    * an empty load is exactly the upstream regression a gate exists to
    * catch, and must never slip through as a NULL verdict.
    */
  final case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Check {
    val name = "not_null"
    val colName = col
    def observed: Column =
      when(count(lit(1)) > 0,
        sum(expr(s"$col IS NULL").cast("long")).cast("double") /
          count(lit(1)).cast("double"))
        .otherwise(lit(1.0))
    def passed(o: Column): Column = o <= maxNullFrac
  }

  /** `cols` must be a key: zero duplicate combinations. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = "unique"
    val colName = cols.mkString(",")
    def observed: Column =
      (count(lit(1)) - countDistinct(cols.head, cols.tail: _*)).cast("double")
    def passed(o: Column): Column = o === 0.0
  }

  /** Values of `col` must lie in [lo, hi]; observed = violation count. */
  final case class Bounds(col: String, lo: Double, hi: Double) extends Check {
    val name = "bounds"
    val colName = col
    def observed: Column =
      coalesce(sum((expr(col) < lo || expr(col) > hi).cast("long")).cast("double"),
        lit(0.0))
    def passed(o: Column): Column = o === 0.0
  }

  /** `col` must only take `allowed` values (nulls don't count). */
  final case class AcceptedValues(col: String, allowed: Seq[String]) extends Check {
    val name = "accepted_values"
    val colName = col
    def observed: Column =
      coalesce(sum((expr(col).isNotNull && !expr(col).isin(allowed.map(lit): _*))
        .cast("long")).cast("double"), lit(0.0))
    def passed(o: Column): Column = o === 0.0
  }

  /** Run every check in one aggregation pass; one verdict row per check. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.zipWithIndex.map { case (c, i) => c.observed.as(s"__o$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex.map { case (c, i) =>
      s"$i, '${c.name}', '${c.colName}', `__o$i`"
    }.mkString(", ")
    val long = one.selectExpr(
      s"stack(${checks.size}, $stackArgs) AS (check_idx, check_name, col_name, observed)")
    // verdicts ride a CASE keyed by the check INDEX — two checks of the
    // same type on the same column (e.g. two Bounds ranges) must each
    // evaluate their OWN pass predicate, so (name, col) is not a key
    val verdict = checks.zipWithIndex.foldRight(lit(false)) { case ((c, i), els) =>
      when(col("check_idx") === i, c.passed(col("observed"))).otherwise(els)
    }
    long.withColumn("passed", verdict).drop("check_idx")
  }
}
