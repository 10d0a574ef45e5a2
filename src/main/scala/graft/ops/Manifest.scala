package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned datasets: the minimal transactional-table idea
  * (Delta/Iceberg's core) in plain parquet + one JSON-lines file.
  *
  * Layout: `path/data/<uuid>.parquet` immutable data files;
  * `path/_manifest.v<N>` lists the files visible at version N, one
  * relative path per line; `path/_latest` holds the current version
  * number. A writer stages new files under `data/` (invisible — readers
  * only open manifest-listed files), writes the next manifest, then
  * publishes by swapping ONE tiny `_latest` file via rename. Readers
  * resolve `_latest` → manifest → explicit file list, so they never see
  * a half-written version and old versions stay readable (time travel)
  * until vacuumed.
  *
  * Why this beats directory swaps at 100 TB: the atomic unit is a
  * single-entry rename (bounded metadata on any store), data files never
  * move or rewrite on publish, and concurrent readers of version N are
  * undisturbed by the commit of N+1. This is exactly the gap
  * `Maintenance.swapWrite`'s directory rename leaves on object stores
  * with non-atomic directory semantics.
  */
object Manifest {

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  private def writeAtomic(fs: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp." + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not publish $p")
  }

  /** Current version, or 0 when the dataset does not exist yet. */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val (fs, root) = fsFor(spark, path)
    val latest = new Path(root, "_latest")
    if (!fs.exists(latest)) 0L else readSmall(fs, latest).trim.toLong
  }

  private def manifestFiles(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val (fs, root) = fsFor(spark, path)
    val mf = new Path(root, s"_manifest.v$version")
    if (!fs.exists(mf)) throw new java.util.NoSuchElementException(
      s"no manifest for version $version at $path")
    readSmall(fs, mf).linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Stage `df` as new immutable data files and return their relative
    * paths WITHOUT publishing them — commit() makes them visible.
    */
  private def stage(df: DataFrame, path: String): Seq[String] = {
    val (fs, root) = fsFor(df.sparkSession, path)
    val batchDir = "data/" + java.util.UUID.randomUUID().toString
    df.write.parquet(new Path(root, batchDir).toString)
    fs.listStatus(new Path(root, batchDir)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => batchDir + "/" + st.getPath.getName)
  }

  private def commit(spark: SparkSession, path: String, files: Seq[String]): Long = {
    val (fs, root) = fsFor(spark, path)
    val next = latestVersion(spark, path) + 1
    writeAtomic(fs, new Path(root, s"_manifest.v$next"), files.mkString("\n"))
    writeAtomic(fs, new Path(root, "_latest"), next.toString)
    next
  }

  /** Publish `df` as the dataset's next version, REPLACING the previous
    * contents (CTAS semantics). Old versions stay readable.
    */
  def overwrite(df: DataFrame, path: String): Long =
    commit(df.sparkSession, path, stage(df, path))

  /** Publish `df` as the next version APPENDED to the current one: the
    * new manifest is previous-files ++ new-files — no data file is read,
    * moved, or rewritten, so an append costs only the new data.
    */
  def append(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val prev = latestVersion(spark, path)
    val base = if (prev == 0) Nil else manifestFiles(spark, path, prev)
    commit(spark, path, base ++ stage(df, path))
  }

  /** Read a version (default: latest) as a DataFrame — an explicit file
    * list, so no directory listing and no visibility race with an
    * in-flight commit.
    */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val files = manifestFiles(spark, path, v).map(f => s"$path/$f")
    spark.read.parquet(files: _*)
  }

  /** Keyed upsert as a manifest commit: last-writer-wins within the batch
    * by `orderCol`, key matches replace existing rows, everything else
    * passes through — [[Maintenance.upsertBatch]]'s contract, but the
    * publish is a manifest swap instead of directory renames, so readers
    * of the previous version are never disturbed and a crashed upsert
    * leaves only invisible staged files. (The merge itself still reads
    * and rewrites the dataset — pair with hive-partitioned or
    * partition-scoped layouts when only a slice changes.)
    */
  def upsert(batch: DataFrame, path: String, keys: Seq[String],
             orderCol: String): Long = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc(orderCol))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (latestVersion(spark, path) == 0) overwrite(latest, path)
    else {
      val merged = read(spark, path)
        .join(latest.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(latest, allowMissingColumns = true)
      overwrite(merged, path)
    }
  }

  /** Drop data files no manifest ≤ the retained window references and
    * manifests older than `keepVersions` — the vacuum that bounds
    * storage; readers of retained versions are unaffected.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Unit = {
    val (fs, root) = fsFor(spark, path)
    val latest = latestVersion(spark, path)
    val keepFrom = math.max(1L, latest - keepVersions + 1)
    val live = (keepFrom to latest).flatMap(v => manifestFiles(spark, path, v)).toSet
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { d =>
      if (d.isDirectory) fs.listStatus(d.getPath).foreach { f =>
        val rel = "data/" + d.getPath.getName + "/" + f.getPath.getName
        if (f.getPath.getName.endsWith(".parquet") && !live.contains(rel))
          fs.delete(f.getPath, false)
      }
    }
    (1L until keepFrom).foreach { v =>
      fs.delete(new Path(root, s"_manifest.v$v"), false)
    }
  }
}
