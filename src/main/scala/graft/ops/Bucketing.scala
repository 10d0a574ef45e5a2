package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins — the physical analog of the
  * reference's `CREATE INDEX` step after a load (`lib/etl/loading.rb:276-278`,
  * S9): pay one organize-on-write so every later read joins cheaper.
  *
  * A join between two tables bucketed by the same keys into the same bucket
  * count needs NO shuffle: rows with equal keys are already in matching
  * buckets, so SortMergeJoin runs directly over the scans (and with
  * `sortBy` on write, the per-bucket sort is free too). At 100 TB this
  * converts every repeated fact-to-fact join on the bucket keys from a
  * full-network exchange into a local merge — the single biggest recurring
  * cost a warehouse layout can delete.
  *
  * Bucket-count choice: fixed at write time, so size it for the target
  * table's lifetime (rows-per-bucket small enough to sort-merge in executor
  * memory at projected growth); both sides of a co-located join must agree
  * (Spark can coalesce mismatched counts when one divides the other via
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * in the session catalog at an explicit path (external table — data
    * outlives the in-memory catalog entry).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKeys: Seq[String], nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys — resolves
    * through the catalog so the bucketing metadata reaches the planner and
    * the exchange is elided.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
