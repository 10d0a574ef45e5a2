package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset maintenance: the operational chores a parquet-backed warehouse
  * needs that the reference delegated to its RDBMS (in-place UPDATE,
  * VACUUM-ish upkeep) — rewritten as whole-dataset transforms with an
  * atomic directory swap. A production deployment on a transactional table
  * format (Delta/Iceberg) gets the swap for free; the operator shapes are
  * identical.
  */
object Maintenance {

  /** Write `df` to `path` atomically: materialize to `path.tmp`, then swap
    * directories. Safe when `df` reads from `path` itself (the read
    * finishes into the tmp write before the swap).
    */
  def swapWrite(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(target)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(target).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target)
  }

  /** Compact a small-files dataset to `numFiles` output files. Streaming
    * sinks and per-batch upserts accrete files; scan cost at 100 TB is
    * driven by file count as much as bytes (task scheduling, footer reads,
    * no intra-file parallelism below the split size) — periodic compaction
    * is what keeps a continuously-written dataset scannable.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int): Unit =
    swapWrite(spark.read.parquet(path).coalesce(numFiles), path)

  /** Keyed upsert of `batch` into the parquet dataset at `path`:
    * last-writer-wins within the batch by `orderCol`, key matches replace
    * existing rows (anti join), everything else passes through — the
    * reference's `UPDATE … JOIN` + `INSERT INTO … SELECT` cycle
    * (`lib/etl/loading.rb:175-178,93-96`) as one dataflow.
    */
  def upsertBatch(batch: DataFrame, path: String, keys: Seq[String],
                  orderCol: String): Unit = {
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc(orderCol))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
        spark.read.parquet(path)
          .join(latest.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(latest)
      else latest
    swapWrite(merged, path)
  }
}
