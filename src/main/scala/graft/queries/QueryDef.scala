package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation over a
  * scale-factor directory plus (when SQL-expressible) an equivalent ANSI SQL
  * statement the driver runs in DuckDB over the same parquet tables.
  *
  * Parity rules (SURVEY.md §7.4): identical output column names on both
  * sides; deterministic ORDER BY on both sides; floats only ever rounded to
  * the exact decimal precision of the true value so both engines' doubles
  * canonicalize to identical bits.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
