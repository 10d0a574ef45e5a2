package graft.ops

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Atomic tiny-pointer-file commit + race-tolerant read — the
  * pointer-commit discipline behind every standing artifact that must
  * swap generations under live readers: the LSM band index's
  * `organized.current` ([[Dedup.compactLshIndex]]) and the graph
  * index's `index.current` ([[Graph.rebuildGraphIndex]]). Object-store
  * honest: a "rename" is copy+delete on S3-class stores, so directory
  * swaps are torn-readable there — immutable generation DIRECTORIES
  * plus a single replaced pointer FILE is the portable commit (a
  * single-file replace is a bounded metadata op everywhere; on
  * direct-PUT stores a create+close is one atomic PUT).
  */
private[graft] object AtomicPointer {

  /** Stream-to-EOF, never stat-then-readFully: the pointer file is
    * atomically REPLACED by concurrent commits, and a stat'd length can
    * belong to a different incarnation than the opened stream —
    * observed as EOFException under a commit race. An open stream reads
    * one complete incarnation.
    */
  def readSmallFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  /** Bounded-retried pointer read against the REPLACE window's transient
    * signatures: on ChecksumFs (local) the rename-overwrite is two
    * renames (data file + .crc sidecar), so a concurrent open can pair a
    * new data file with a stale checksum (ChecksumException) or catch
    * the swap itself (EOF/FileNotFound); a mid-write direct PUT on the
    * no-FileContext fallback path can briefly read empty. `parse` runs
    * INSIDE the retry loop so its rejection of a torn read
    * (NumberFormatException on an empty string) retries like the
    * FS-level races. Existence is re-checked each attempt — a rebuild
    * may legitimately DELETE the pointer, which must resolve to None,
    * not an error.
    */
  def read[A](fs: FileSystem, p: Path, parse: String => A): Option[A] = {
    var attempt = 0
    while (true) {
      if (!fs.exists(p)) return None
      try return Some(parse(readSmallFile(fs, p)))
      catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.EOFException |
                  _: java.io.FileNotFoundException |
                  _: NumberFormatException) =>
          attempt += 1
          if (attempt > 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    None // unreachable
  }

  /** Atomically publish `content` as `ptrPath`: write a uuid tmp file
    * under `dir`, rename-overwrite into place via FileContext (atomic
    * single-file replace on local/HDFS). FileContext needs an
    * `AbstractFileSystem` binding per scheme, and stock Hadoop only
    * ships them for local/hdfs/viewfs — object-store schemes (s3a, gs,
    * abfs) are typically unbound unless
    * `fs.AbstractFileSystem.<scheme>.impl` is configured. For those we
    * fall back to a direct overwrite-create: on S3-class stores a
    * create+close is ONE atomic PUT (readers see the old or the new
    * object, never a torn one — the exact property the rename gives
    * elsewhere), so the fallback is only non-atomic on filesystems that
    * would have had a FileContext binding anyway.
    */
  def publish(spark: SparkSession, dir: String, ptrPath: Path,
              content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val bytes = content.getBytes("UTF-8")
    val scheme = Option(new Path(dir).toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // LOCAL filesystem: POSIX rename(2) via nio is a true atomic
      // REPLACE. The FileContext route is NOT on local — LocalFs
      // inherits AbstractFileSystem's default overwrite-rename, which
      // DELETES the destination before renaming, leaving an
      // absent-pointer window a racing reader observes as a missing
      // file (caught by IvfIndexConcurrencySpec: recordedNProbe
      // returned None mid-publish). nio writes no checksum sidecars;
      // the stale-`.crc` cleanup below covers a destination an older
      // Hadoop-API writer created (its checksum would describe the OLD
      // content and fail every subsequent read).
      val dirP = java.nio.file.Paths.get(new Path(dir).toUri.getPath)
      java.nio.file.Files.createDirectories(dirP)
      val tmp = java.nio.file.Files.createTempFile(
        dirP, "." + ptrPath.getName + ".tmp-", "")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, dirP.resolve(ptrPath.getName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      fs.delete(new Path(ptrPath.getParent, "." + ptrPath.getName + ".crc"),
        false): Unit
      return
    }
    val fcOpt =
      try Some(FileContext.getFileContext(new Path(dir).toUri, conf))
      catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None
      }
    fcOpt match {
      case Some(fc) =>
        val tmp = new Path(
          dir + "/." + ptrPath.getName + ".tmp-" + java.util.UUID.randomUUID())
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        fc.rename(tmp, ptrPath, Options.Rename.OVERWRITE)
      case None =>
        val out = fs.create(ptrPath, true)
        try out.write(bytes) finally out.close()
    }
  }
}
