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
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long (runtime-settable legacy
    * conf) and truncate to microseconds — the same ns→µs truncation DuckDB
    * applies when casting TIMESTAMP_NS to TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
