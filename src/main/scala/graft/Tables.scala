package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated test corpus (TESTDATA.md): one
  * parquet per table under a scale-factor directory. The reference addressed
  * `schema.table` in an RDBMS (`lib/etl/loading.rb:93-96`); here a directory
  * is the schema and parquet self-describes (SURVEY.md §1.4).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** The events table's `ts` physical type has varied across driver drops:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read nanos
    * as long via the runtime-settable legacy conf and truncate to µs, the
    * same ns→µs truncation DuckDB applies), and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark 4 infers as TIMESTAMP_NTZ —
    * normalize to TIMESTAMP; the session timezone is pinned UTC everywhere,
    * so the instant is unchanged and windows/watermarks behave identically).
    * Normalizing HERE keeps every downstream operator on plain TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"), "ts")
  }

  /** Normalize a physically-varying event-time column to plain TIMESTAMP
    * (works on batch and streaming frames alike — streaming event-time ops
    * reject TIMESTAMP_NTZ outright).
    */
  def normalizeTs(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType =>
        df.withColumn(c, df.col(c).cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
