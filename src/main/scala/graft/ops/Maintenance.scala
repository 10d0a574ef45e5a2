package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset maintenance: the operational chores a parquet-backed warehouse
  * needs that the reference delegated to its RDBMS (in-place UPDATE,
  * VACUUM-ish upkeep) — rewritten as whole-dataset transforms with an
  * atomic directory swap. All path manipulation goes through the Hadoop
  * `FileSystem` API resolved from the path's own scheme, so the same code
  * runs on the local FS in tests and on HDFS/S3A in production. A
  * deployment on a transactional table format (Delta/Iceberg) gets the
  * swap for free; the operator shapes are identical.
  */
object Maintenance {

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Swap `tmp` into `target`'s place via renames only: retire the current
    * dir, rename tmp in, drop the retired copy. Rename is the one mutation
    * that is atomic per-directory on HDFS (and a bounded metadata op on
    * object stores), so the window where `target` is absent is a single
    * rename — not the full delete-then-copy of the old `java.nio` version.
    * On failure the retired copy is renamed back, so the dataset is never
    * lost.
    */
  private def swapDirs(fs: FileSystem, tmp: Path, target: Path): Unit = {
    // Unique suffix per swap: a pre-existing `.retired` dir (unrelated data,
    // or the leftover of a crashed prior swap) is never silently destroyed —
    // it stays on disk to be surfaced, and this swap cannot collide with it.
    val retired = new Path(target.getParent,
      target.getName + ".retired." + java.util.UUID.randomUUID().toString)
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, retired))
      throw new java.io.IOException(s"could not retire $target")
    if (!fs.rename(tmp, target)) {
      if (hadTarget) fs.rename(retired, target) // restore — dataset intact
      throw new java.io.IOException(s"could not move $tmp into place at $target")
    }
    if (hadTarget) fs.delete(retired, true)
  }

  /** Write `df` to `path` atomically: materialize to `path.tmp`, then swap
    * directories. Safe when `df` reads from `path` itself (the read
    * finishes into the tmp write before the swap).
    */
  def swapWrite(df: DataFrame, path: String): Unit = {
    val (fs, target) = fsFor(df.sparkSession, path)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    swapDirs(fs, tmp, target)
  }

  /** [[swapWrite]] for a hive-partitioned layout: materialize to a tmp
    * dir with the SAME partitionBy columns, then swap atomically. One
    * shuffle co-locates each partition value so every partition dir ends
    * up with ~one file per owning task instead of one per task per value.
    */
  def swapWritePartitioned(df: DataFrame, path: String,
                           partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val (fs, target) = fsFor(df.sparkSession, path)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(tmp.toString)
    swapDirs(fs, tmp, target)
  }

  /** Compact a small-files dataset to `numFiles` output files. Streaming
    * sinks and per-batch upserts accrete files; scan cost at 100 TB is
    * driven by file count as much as bytes (task scheduling, footer reads,
    * no intra-file parallelism below the split size) — periodic compaction
    * is what keeps a continuously-written dataset scannable.
    */
  def compact(spark: SparkSession, path: String, numFiles: Int): Unit =
    swapWrite(spark.read.parquet(path).coalesce(numFiles), path)

  /** [[compact]] with the file count derived from the dataset's actual
    * on-disk bytes and a target file size — the form an operator actually
    * schedules ("keep files near 128 MB"), robust to dataset growth where
    * a hard-coded count is not. The size comes from one Hadoop
    * `getContentSummary` call (namenode metadata, no data read).
    */
  def compactToSize(spark: SparkSession, path: String, targetFileBytes: Long): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val (fs, target) = fsFor(spark, path)
    val bytes = fs.getContentSummary(target).getLength
    val numFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    compact(spark, path, numFiles)
  }

  /** Relative `col=value[/col=value…]` partition directories that the
    * writer ACTUALLY produced under `root`, to `depth` levels. Listing the
    * written dirs (instead of reconstructing names from partition values)
    * sidesteps every escaping/formatting divergence between this code and
    * Spark's writer — spaces, '+', ',', non-string date/timestamp
    * rendering, `__HIVE_DEFAULT_PARTITION__` for nulls — any of which
    * would otherwise make a reconstructed name miss the real directory.
    */
  private def writtenPartitionDirs(fs: FileSystem, root: Path, depth: Int): Seq[String] = {
    def walk(p: Path, d: Int): Seq[String] =
      fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap { st =>
          if (d <= 1) Seq(st.getPath.getName)
          else walk(st.getPath, d - 1).map(st.getPath.getName + "/" + _)
        }
    walk(root, depth)
  }

  /** Keyed upsert of `batch` into the parquet dataset at `path`:
    * last-writer-wins within the batch by `orderCol`, key matches replace
    * existing rows (anti join), everything else passes through — the
    * reference's `UPDATE … JOIN` + `INSERT INTO … SELECT` cycle
    * (`lib/etl/loading.rb:175-178,93-96`) as one dataflow.
    *
    * When `partitionCols` is given the dataset is hive-partitioned and the
    * upsert is PARTITION-SCOPED: only the partitions present in the batch
    * are read (partition-pruned scan), merged, and swapped; every other
    * partition's files are untouched bytes. A 100 TB date-partitioned
    * table absorbs a one-day batch at the cost of that day, not the table.
    * The set of touched partitions is collected to the driver — bounded
    * metadata (one row per partition in the batch), not data.
    *
    * CONTRACT: a key's `partitionCols` values must be immutable (or the
    * partition columns part of the key). The upsert only anti-joins within
    * the touched partitions; if a key moves partitions between batches, the
    * stale row in its old (untouched) partition is deliberately not read
    * and survives as a duplicate. Mutable placement needs a global index or
    * a table format with MERGE (Delta/Iceberg).
    */
  def upsertBatch(batch: DataFrame, path: String, keys: Seq[String],
                  orderCol: String, partitionCols: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc(orderCol))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val (fs, target) = fsFor(spark, path)

    if (!fs.exists(target)) {
      val writer = latest.write.mode("overwrite")
      (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
        .parquet(path)
    } else if (partitionCols.isEmpty) {
      // allowMissingColumns = schema evolution: a batch introducing a new
      // column back-fills null for existing rows (and vice versa), the
      // parquet-native analog of ALTER TABLE ADD COLUMN + upsert
      val merged = spark.read.parquet(path)
        .join(latest.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(latest, allowMissingColumns = true)
      swapWrite(merged, path)
    } else {
      // Partition-scoped path: bounded driver-side list of touched partitions.
      val touched = latest.select(partitionCols.map(col): _*).distinct().collect()
      if (touched.isEmpty) return // empty batch: nothing to merge or move
      val touchedPred = touched.map { row =>
        partitionCols.zipWithIndex.map { case (c, i) =>
          if (row.isNullAt(i)) col(c).isNull else col(c) === lit(row.get(i))
        }.reduce(_ && _)
      }.reduce(_ || _)
      // The filter is on partition columns only → PartitionFilters on the
      // scan; untouched partitions are never read, let alone rewritten.
      val existingTouched = spark.read.parquet(path).filter(touchedPred)
      val merged = existingTouched
        .join(latest.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(latest, allowMissingColumns = true)
      val tmp = new Path(target.getParent, target.getName + ".upsert.tmp")
      merged.write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
      // Swap the directories the writer ACTUALLY produced. merged =
      // (existing ∩ touched) ∪ latest, so tmp holds exactly one dir per
      // touched partition; fewer means a write anomaly — refuse to swap
      // rather than silently drop a partition's merged output.
      val rels = writtenPartitionDirs(fs, tmp, partitionCols.size)
      if (rels.size != touched.length) {
        fs.delete(tmp, true)
        throw new java.io.IOException(
          s"partition-scoped upsert wrote ${rels.size} partition dirs for " +
            s"${touched.length} touched partitions at $tmp; refusing to swap")
      }
      for (rel <- rels) {
        val dst = new Path(target, rel)
        if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
        swapDirs(fs, new Path(tmp, rel), dst)
      }
      fs.delete(tmp, true)
    }
  }
}
