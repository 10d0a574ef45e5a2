package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship slice (SURVEY.md §7.2): mapped projection (P1/P3/F1) over
    * lineitem → CDC table diff (§2.7: A1+J1+J2) of the projection vs a
    * mutated copy → counts per diff tag. Exercises the reference `Loading`
    * core end-to-end on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import graft.ops.{Diff, Loading}
    import graft.ops.ValueSpec._
    val li = Tables.lineitem(spark, dir)
    val mapped = Loading.appendProjection(
      li,
      Seq(
        "order_id" -> col_("l_orderkey"),
        "line_no"  -> col_("l_linenumber"),
        "flag"     -> col_("l_returnflag"),
        "price"    -> Sql("round(l_extendedprice * (1.0 - l_discount), 4)")
      ),
      condition = Some("l_quantity > 10.0"))
    val mutated = mapped
      .filter(col("order_id") % 7 =!= 0)
      .withColumn("flag", when(col("order_id") % 5 === 0, lit("X")).otherwise(col("flag")))
    Diff.tableDiff(mapped, mutated, Seq("order_id", "line_no"), Seq("flag", "price"))
      .groupBy("diff").agg(count(lit(1)).as("n"))
  }

  private def allQueries: Seq[QueryDef] =
    CoreQueries.all ++ ExtendedQueries.all ++ SqlSurfaceQueries.all ++
      SketchStreamQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
