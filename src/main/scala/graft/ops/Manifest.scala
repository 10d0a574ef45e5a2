package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-versioned datasets: the minimal transactional-table idea
  * (Delta/Iceberg's core) in plain parquet + one write-once manifest file
  * per version.
  *
  * Layout: `path/data/<uuid>/…` immutable data files; `path/_manifest.v<N>`
  * lists the files visible at version N (one relative path per line)
  * between a header and a count-carrying footer line. There is no mutable
  * pointer file at all: the current version IS the largest N whose
  * manifest parses complete. A writer stages new files under `data/`
  * (invisible — readers only open manifest-listed files), renders the
  * next manifest COMPLETELY into a hidden temp file, and publishes it as
  * `_manifest.v<N+1>` in ONE atomic no-replace operation — claim of the
  * version number and visibility of the full content are the same
  * filesystem primitive, so there is no claimed-but-incomplete state.
  *
  * Correctness properties this buys:
  *  - **No absence window.** Earlier designs swapped a `_latest` pointer
  *    via delete-then-rename, so a reader racing a commit could observe
  *    "no committed version". Manifests are append-only and write-once, so
  *    every version that was ever visible stays visible until vacuumed.
  *  - **Optimistic concurrency.** The atomic no-replace publish is the
  *    claim on version N+1. A loser gets FileAlreadyExistsException,
  *    re-reads the new latest version, rebases its file list, and retries
  *    at N+2 — concurrent appends both land, neither overwrites the
  *    other. An earlier protocol claimed with `create(overwrite=false)`
  *    and wrote content afterwards; that claim is check-then-act on
  *    Hadoop's local/Checksum FS and on object stores, and an observed
  *    concurrent-writer lost update (two writers both "owning" the same
  *    version, second close clobbering the first's file list) is why the
  *    claim is now the publish itself. (Two concurrent *upserts touching
  *    the same keys* still last-writer-win at the version level, like
  *    Delta's write conflicts.)
  *  - **Torn-write safety.** A published manifest appears with its full
  *    content or not at all. The count-carrying footer is still validated
  *    on read — defense against legacy torn files and out-of-band copies
  *    — and a manifest whose footer is absent or disagrees is treated as
  *    uncommitted and skipped when resolving the latest version.
  *
  * ==Filesystem contract==
  * The commit protocol requires ONE of these primitives, asserted at
  * first commit ([[publishAtomic]]) — a store with neither fails loudly
  * instead of losing data:
  *  - atomic no-replace hard link (`link(2)`, local `file:` scheme): the
  *    rendered temp file is linked to the manifest name; EEXIST is the
  *    collision signal and the content is complete at the instant the
  *    name appears;
  *  - atomic no-replace rename (`FileContext.rename` without OVERWRITE —
  *    HDFS/viewfs, or any scheme with an `AbstractFileSystem` binding
  *    whose rename is arbitrated server-side);
  *  - S3-class stores need a conditional PUT (If-None-Match); Hadoop's
  *    `FileSystem` API does not expose one, so such schemes are refused
  *    here rather than silently falling back to check-then-act.
  *
  * Why this beats directory swaps at 100 TB: the atomic unit is one tiny
  * file rename/link (bounded metadata on any store), data files never
  * move or rewrite on publish, and concurrent readers of version N are
  * undisturbed by the commit of N+1.
  */
object Manifest {

  private val Header = "#graft-manifest 1"
  private def footer(n: Int): String = s"#end $n"
  private val MaxCommitAttempts = 50
  // test-only fault injection, run once between building a commit
  // attempt's file list and its atomic publish — simulates a writer
  // stalled (GC pause, saturated box) in exactly the window where the
  // OLD claim-then-write protocol lost updates. Thread-local so one
  // racing writer can be stalled without touching its competitors;
  // one-shot so the OCC retry after the induced collision runs clean.
  private[ops] val commitStallHook: ThreadLocal[Runnable] =
    ThreadLocal.withInitial(() => null)

  /** Parsed manifest: file list + commit properties (`#prop k=v` lines,
    * URL-encoded) + optional per-file column bounds (`#filestat` lines)
    * + per-file byte sizes (`#size` lines). Props carry e.g. the dataset
    * schema for partitioned layouts and the last streaming batch id for
    * idempotent sinks; file stats power manifest-level file skipping
    * ([[readRange]], [[table]]), Iceberg's core idea. Sizes let a reader
    * plan the scan with ZERO filesystem listing — at 100 TB the manifest
    * is the only metadata round-trip.
    */
  final case class Snapshot(files: Seq[String], props: Map[String, String],
                            stats: Map[String, Map[String, (Double, Double)]] = Map.empty,
                            sizes: Map[String, Long] = Map.empty,
                            rows: Map[String, Long] = Map.empty,
                            blooms: Map[String, Seq[String]] = Map.empty,
                            strs: Map[String, Map[String, StrBound]] = Map.empty,
                            nulls: Map[String, Map[String, Long]] = Map.empty,
                            dvs: Map[String, (String, Long)] = Map.empty,
                            ndvs: Map[String, Seq[String]] = Map.empty,
                            klls: Map[String, Seq[String]] = Map.empty)

  /** Per-file string bounds (`#filestr` lines). `lo`/`hi` are VALID bounds
    * (lo ≤ every value ≤ hi in code-point order) but possibly inexact:
    * values longer than [[StrBoundCap]] code points are truncated — the
    * lower bound by plain prefix (a prefix sorts ≤ the original), the
    * upper bound Iceberg-style (truncate, then increment the last code
    * point so the result sorts ≥ the original). `exact` is true only when
    * BOTH bounds are the untruncated min/max, which is what lets a
    * metadata-only `min(col)`/`max(col)` answer be exact.
    */
  final case class StrBound(lo: String, hi: String, exact: Boolean)

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def render(files: Seq[String], props: Map[String, String],
                     stats: Map[String, Map[String, (Double, Double)]] = Map.empty,
                     sizes: Map[String, Long] = Map.empty,
                     rows: Map[String, Long] = Map.empty,
                     blooms: Map[String, Seq[String]] = Map.empty,
                     strs: Map[String, Map[String, StrBound]] = Map.empty,
                     nulls: Map[String, Map[String, Long]] = Map.empty,
                     dvs: Map[String, (String, Long)] = Map.empty,
                     ndvs: Map[String, Seq[String]] = Map.empty,
                     klls: Map[String, Seq[String]] = Map.empty): String = {
    val propLines = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"#prop ${enc(k)}=${enc(v)}" }
    val statLines = stats.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
        s"#filestat ${enc(f)} ${enc(c)} $lo $hi"
      }
    }
    val sizeLines = sizes.toSeq.sortBy(_._1)
      .map { case (f, n) => s"#size ${enc(f)} $n" }
    val rowLines = rows.toSeq.sortBy(_._1)
      .map { case (f, n) => s"#rows ${enc(f)} $n" }
    val bloomLines = blooms.toSeq.sortBy(_._1).collect {
      case (f, cs) if cs.nonEmpty =>
        s"#bloom ${enc(f)} ${cs.map(enc).mkString(",")}"
    }
    val strLines = strs.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, b) =>
        s"#filestr ${enc(f)} ${enc(c)} ${enc(b.lo)} ${enc(b.hi)} ${if (b.exact) "e" else "t"}"
      }
    }
    val nullLines = nulls.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, n) => s"#nulls ${enc(f)} ${enc(c)} $n" }
    }
    val dvLines = dvs.toSeq.sortBy(_._1).map { case (f, (sidecar, n)) =>
      s"#dv ${enc(f)} ${enc(sidecar)} $n"
    }
    val ndvLines = ndvs.toSeq.sortBy(_._1).collect {
      case (f, cs) if cs.nonEmpty =>
        s"#ndv ${enc(f)} ${cs.map(enc).mkString(",")}"
    }
    val kllLines = klls.toSeq.sortBy(_._1).collect {
      case (f, cs) if cs.nonEmpty =>
        s"#kll ${enc(f)} ${cs.map(enc).mkString(",")}"
    }
    ((Header +: propLines) ++ statLines ++ strLines ++ nullLines ++
      sizeLines ++ rowLines ++ bloomLines ++ ndvLines ++ kllLines ++
      dvLines ++ files :+
      footer(files.size)).mkString("\n")
  }

  /** None when the text is not a complete committed manifest (in-flight or
    * crashed writer) — the torn-write guard.
    */
  private def parse(text: String): Option[Snapshot] = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (lines.isEmpty || lines.head != Header) return None
    val files = lines.filterNot(_.startsWith("#"))
    if (lines.last != footer(files.size)) return None
    val props = lines.filter(_.startsWith("#prop ")).flatMap { l =>
      val kv = l.stripPrefix("#prop ")
      val i = kv.indexOf('=')
      if (i < 0) None else Some(dec(kv.take(i)) -> dec(kv.drop(i + 1)))
    }.toMap
    val stats = lines.filter(_.startsWith("#filestat ")).flatMap { l =>
      l.stripPrefix("#filestat ").split(' ') match {
        case Array(f, c, lo, hi) =>
          scala.util.Try((dec(f), dec(c), lo.toDouble, hi.toDouble)).toOption
        case _ => None
      }
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> (r._3, r._4)).toMap
    }
    val sizes = lines.filter(_.startsWith("#size ")).flatMap { l =>
      l.stripPrefix("#size ").split(' ') match {
        case Array(f, n) => scala.util.Try(dec(f) -> n.toLong).toOption
        case _ => None
      }
    }.toMap
    val rows = lines.filter(_.startsWith("#rows ")).flatMap { l =>
      l.stripPrefix("#rows ").split(' ') match {
        case Array(f, n) => scala.util.Try(dec(f) -> n.toLong).toOption
        case _ => None
      }
    }.toMap
    val blooms = lines.filter(_.startsWith("#bloom ")).flatMap { l =>
      l.stripPrefix("#bloom ").split(' ') match {
        case Array(f, cs) =>
          Some(dec(f) -> cs.split(',').toSeq.filter(_.nonEmpty).map(dec))
        case _ => None
      }
    }.toMap
    val strs = lines.filter(_.startsWith("#filestr ")).flatMap { l =>
      l.stripPrefix("#filestr ").split(' ') match {
        case Array(f, c, lo, hi, ex) =>
          scala.util.Try(
            (dec(f), dec(c), StrBound(dec(lo), dec(hi), ex == "e"))).toOption
        case _ => None
      }
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> r._3).toMap
    }
    val nulls = lines.filter(_.startsWith("#nulls ")).flatMap { l =>
      l.stripPrefix("#nulls ").split(' ') match {
        case Array(f, c, n) =>
          scala.util.Try((dec(f), dec(c), n.toLong)).toOption
        case _ => None
      }
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> r._3).toMap
    }
    val dvs = lines.filter(_.startsWith("#dv ")).flatMap { l =>
      l.stripPrefix("#dv ").split(' ') match {
        case Array(f, sidecar, n) =>
          scala.util.Try(dec(f) -> (dec(sidecar), n.toLong)).toOption
        case _ => None
      }
    }.toMap
    val ndvs = lines.filter(_.startsWith("#ndv ")).flatMap { l =>
      l.stripPrefix("#ndv ").split(' ') match {
        case Array(f, cs) =>
          Some(dec(f) -> cs.split(',').toSeq.filter(_.nonEmpty).map(dec))
        case _ => None
      }
    }.toMap
    val klls = lines.filter(_.startsWith("#kll ")).flatMap { l =>
      l.stripPrefix("#kll ").split(' ') match {
        case Array(f, cs) =>
          Some(dec(f) -> cs.split(',').toSeq.filter(_.nonEmpty).map(dec))
        case _ => None
      }
    }.toMap
    Some(Snapshot(files, props, stats, sizes, rows, blooms, strs, nulls, dvs,
      ndvs, klls))
  }

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  private def manifestPath(root: Path, v: Long): Path =
    new Path(root, s"_manifest.v$v")

  // schemes whose atomic no-replace capability has been verified once
  // this JVM — the check is per-scheme, not per-dataset
  private val capabilityChecked: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Fail-loudly assertion of the class doc's filesystem contract:
    * local `file:` publishes via `link(2)`; every other scheme must bind
    * an `AbstractFileSystem` so `FileContext.rename` WITHOUT the
    * OVERWRITE option can arbitrate the version claim. Called before
    * STAGING as well as before commit, so a deployment on a store with
    * neither primitive (s3a-class without a binding) refuses before
    * writing any data files — not after terabytes have staged, and
    * never by silently degrading to a check-then-act claim that loses
    * concurrent commits.
    */
  private def requireAtomicPublishCapability(fs: FileSystem, dir: Path): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme != "file" && !capabilityChecked.contains(scheme)) {
      try { org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, fs.getConf); () }
      catch {
        case e: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          throw new UnsupportedOperationException(
            s"manifest commit needs an atomic no-replace publish, and scheme " +
              s"'$scheme' has no AbstractFileSystem binding for FileContext.rename " +
              s"(configure fs.AbstractFileSystem.$scheme.impl, or use a store " +
              "whose client exposes conditional PUT) — refusing to fall back to " +
              "check-then-act, which silently loses concurrent commits", e)
      }
      capabilityChecked.add(scheme): Unit
    }
  }

  /** Atomically publish `content` at `dest`, failing with a
    * FileAlreadyExistsException if `dest` exists — claim of the name and
    * visibility of the complete content are ONE filesystem primitive
    * (the class doc's filesystem contract). Local `file:` scheme: temp
    * write + hard link — `link(2)` is EEXIST-atomic in the kernel, while
    * `Files.move` without REPLACE_EXISTING is itself check-then-rename
    * (and `rename(2)` silently replaces), i.e. the very TOCTOU this
    * method removes. Other schemes: temp write + `FileContext.rename`
    * WITHOUT the OVERWRITE option (namenode-arbitrated no-replace on
    * HDFS-class stores). A scheme with no AbstractFileSystem binding
    * (s3a/gs/abfs by default) is REFUSED at first commit: Hadoop's
    * `FileSystem` API exposes no atomic no-replace primitive there, and
    * a check-then-act fallback is exactly the silent lost-update hazard
    * observed under concurrent writers on the local FS.
    */
  private def publishAtomic(fs: FileSystem, dir: Path, dest: Path,
                            content: String): Unit = {
    val bytes = content.getBytes("UTF-8")
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val dirP = java.nio.file.Paths.get(fs.makeQualified(dir).toUri.getPath)
      java.nio.file.Files.createDirectories(dirP)
      val tmp = java.nio.file.Files.createTempFile(
        dirP, "." + dest.getName + ".tmp-", "")
      try {
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.createLink(dirP.resolve(dest.getName), tmp): Unit
      } finally { java.nio.file.Files.deleteIfExists(tmp): Unit }
    } else {
      requireAtomicPublishCapability(fs, dir)
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, fs.getConf)
      val tmp = new Path(dir,
        "." + dest.getName + ".tmp-" + java.util.UUID.randomUUID())
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      try fc.rename(tmp, dest) // no OVERWRITE option: fails if dest exists
      catch { case e: Throwable => fs.delete(tmp, false); throw e }
    }
  }

  /** All manifest version numbers present on disk (complete or not). */
  private def versionsOnDisk(fs: FileSystem, root: Path): Seq[Long] = {
    val st = try fs.globStatus(new Path(root, "_manifest.v*"))
    catch { case _: java.io.FileNotFoundException => null }
    if (st == null) Nil
    else st.toSeq.flatMap(s =>
      scala.util.Try(s.getPath.getName.stripPrefix("_manifest.v").toLong).toOption)
  }

  private def loadVersion(fs: FileSystem, root: Path, v: Long): Option[Snapshot] =
    if (!fs.exists(manifestPath(root, v))) None
    else parse(readSmall(fs, manifestPath(root, v)))

  private def hintPath(root: Path): Path = new Path(root, "_latest.hint")

  /** Best-effort advertisement of a known-complete version — `_latest.hint`
    * (named OUTSIDE the `_manifest.v*` glob), replaced via
    * [[AtomicPointer.publish]] after every successful commit. Purely an
    * accelerator: correctness never depends on it (racing commits may
    * leave it LOW — a lower bound is all the read path needs — and a
    * reader tolerates it missing, torn, stale, or pointing at a vacuumed
    * version by falling back to the listing).
    */
  private def publishHint(spark: SparkSession, root: Path, v: Long): Unit =
    try AtomicPointer.publish(spark, root.toString, hintPath(root), v.toString)
    catch { case _: Exception => () } // advisory only — never fail a commit

  /** Current version: the largest N whose manifest is complete; 0 when the
    * dataset has no committed version. Incomplete manifests (legacy torn
    * files from the pre-atomic-publish protocol) are skipped, never
    * surfaced.
    *
    * Read path is LISTING-FREE in steady state — the 100 TB metadata
    * concern: resolving the version used to glob the dataset directory
    * (O(versions) listing on every read; an object-store LIST round-trip
    * per query). Now the `_latest.hint` pointer names a known-complete
    * version and the reader probes FORWARD from it with per-slot
    * existence checks: the commit protocol claims the SMALLEST free slot
    * above the latest complete version, so an ABSENT slot proves nothing
    * exists above it (files are never deleted except by vacuum below the
    * kept horizon — and a hint below that horizon fails its own
    * completeness check and falls back to the listing), while a
    * present-but-incomplete slot is a legacy squatter to skip. Steady
    * state: one hint read + one manifest parse + one miss probe,
    * regardless of history length.
    */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val (fs, root) = fsFor(spark, path)
    hintedLatest(fs, root).getOrElse(
      versionsOnDisk(fs, root).sorted(Ordering[Long].reverse)
        .find(v => loadVersion(fs, root, v).isDefined).getOrElse(0L))
  }

  /** The hint fast path: Some(latest) when the hint names a complete
    * version (probing forward past any legacy squatters), None when the
    * hint is absent/torn/vacuumed — caller falls back to the listing.
    */
  private def hintedLatest(fs: FileSystem, root: Path): Option[Long] = {
    val hinted =
      try AtomicPointer.read(fs, hintPath(root), _.trim.toLong)
      catch { case _: Exception => None } // corrupt hint = no hint
    hinted.filter(v => v > 0 && loadVersion(fs, root, v).isDefined).map { v0 =>
      var latest = v0
      var probe = v0 + 1
      var open = true
      while (open) {
        if (!fs.exists(manifestPath(root, probe))) open = false // free slot: done
        else {
          if (loadVersion(fs, root, probe).isDefined) latest = probe
          probe += 1 // occupied: complete (advance latest) or legacy squatter (skip)
        }
      }
      latest
    }
  }

  /** Commit properties of a version (default: latest); empty when none. */
  def committedProps(spark: SparkSession, path: String,
                     version: Long = -1L): Map[String, String] = {
    val (fs, root) = fsFor(spark, path)
    val v = if (version < 0) latestVersion(spark, path) else version
    if (v <= 0) Map.empty
    else loadVersion(fs, root, v).map(_.props).getOrElse(Map.empty)
  }

  /** Most recent committed value of prop `key`, scanning versions newest
    * first — robust to interleaved commits (e.g. a compaction between two
    * streaming appends) that don't carry the key.
    */
  def lastProp(spark: SparkSession, path: String, key: String): Option[String] = {
    val (fs, root) = fsFor(spark, path)
    versionsOnDisk(fs, root).sorted(Ordering[Long].reverse).iterator
      .flatMap(v => loadVersion(fs, root, v).flatMap(_.props.get(key)))
      .nextOption()
  }

  private def snapshotOf(spark: SparkSession, path: String, version: Long): Snapshot = {
    val (fs, root) = fsFor(spark, path)
    loadVersion(fs, root, version).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no manifest for version $version at $path"))
  }

  private def manifestFiles(spark: SparkSession, path: String, version: Long): Seq[String] =
    snapshotOf(spark, path, version).files

  /** Directory-column name for partition col `c`: the hive layout needs a
    * `k=v` path segment, but Spark's writer STRIPS the partitioned-by
    * column from the data files and its reader only recovers it through
    * directory inference — which rejects our `data/<uuid>/k=v` layout
    * (uuid dirs at inconsistent k=v depths → CONFLICTING_DIRECTORY_
    * STRUCTURES). So we partition by a throwaway DUPLICATE of the column:
    * the real column stays in the data files, reads are plain explicit-
    * file-list scans with zero inference, and the `__p_c=v` segment
    * exists purely for manifest-level partition pruning.
    */
  private def partDirCol(c: String): String = s"__p_$c"

  /** Stage `df` as new immutable data files and return their relative
    * paths (with byte sizes, captured off the same listing) WITHOUT
    * publishing them — commit() makes them visible. With `partitionCols`,
    * files land under `data/<uuid>/__p_c=v/…` dirs.
    */
  private def stageSized(df: DataFrame, path: String,
                         partitionCols: Seq[String] = Nil): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.col
    val (fs, root) = fsFor(df.sparkSession, path)
    requireAtomicPublishCapability(fs, root) // refuse BEFORE writing data
    val batchDir = "data/" + java.util.UUID.randomUUID().toString
    val toWrite = partitionCols.foldLeft(df)((d, c) =>
      d.withColumn(partDirCol(c), col(c).cast("string")))
    val w = toWrite.write
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols.map(partDirCol): _*) else w)
      .parquet(new Path(root, batchDir).toString)
    val it = fs.listFiles(new Path(root, batchDir), true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val prefix = fs.makeQualified(root).toString + "/"
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += (fs.makeQualified(f.getPath).toString.stripPrefix(prefix) -> f.getLen)
    }
    buf.toSeq
  }

  private def stage(df: DataFrame, path: String,
                    partitionCols: Seq[String] = Nil): Seq[String] =
    stageSized(df, path, partitionCols).map(_._1)

  /** Optimistic-concurrency commit: resolve the latest version, build the
    * next file list against it via `filesFor` (the rebase hook), claim
    * `_manifest.v<next>` atomically; on collision re-resolve and retry.
    */
  private def commit(spark: SparkSession, path: String,
                     props: Map[String, String],
                     statsFor: Long => Map[String, Map[String, (Double, Double)]] =
                       _ => Map.empty,
                     newSizes: Map[String, Long] = Map.empty,
                     newBlooms: Map[String, Seq[String]] = Map.empty,
                     newStrs: Map[String, Map[String, StrBound]] = Map.empty,
                     newNulls: Map[String, Map[String, Long]] = Map.empty,
                     newDvs: Map[String, (String, Long)] = Map.empty,
                     carryDvs: Boolean = true,
                     newNdvs: Map[String, Seq[String]] = Map.empty,
                     newKlls: Map[String, Seq[String]] = Map.empty,
                     stagedValidate: Seq[String] = Nil,
                     validateMergeSchema: Boolean = false)
                    (filesFor: Long => Seq[String]): Long = {
    val (fs, root) = fsFor(spark, path)
    requireAtomicPublishCapability(fs, root)
    if (!fs.exists(root)) fs.mkdirs(root)
    var attempts = 0
    // footer reads memoized across retry attempts: a commit collision
    // re-resolves the file LIST, but a file's row count is immutable
    val footerCache = scala.collection.mutable.HashMap.empty[String, Option[Long]]
    // CHECK validation of staged files happens INSIDE the claim loop so a
    // concurrent addConstraint landing between an external validation and
    // the version claim can't publish unchecked rows (validate/commit
    // TOCTOU): each attempt re-reads the carried constraint set and
    // validates whatever (name, predicate) pairs it hasn't already proven
    // for this staged batch — zero extra scans when nothing changed.
    val validatedCs = scala.collection.mutable.HashSet.empty[(String, String)]
    while (true) {
      // Base and claim target come from ONE directory listing. An earlier
      // shape resolved latestComplete and the on-disk max in two separate
      // listings and claimed max+1 — a competitor completing a version
      // between the listings was then rebased past WITHOUT a collision
      // (its number burned as if torn), a lost update the stress spec
      // reproduces. Invariants now: base = highest complete version in
      // the listing; claim = smallest FREE slot above base (never jump a
      // gap — only legacy torn manifests from the pre-atomic-publish
      // protocol can squat a slot, and they stay incomplete forever, so
      // any two writers racing the same base are forced onto the same
      // slot and the atomic no-replace publish arbitrates). A stalled-
      // then-waking writer simply loses that race and rebases — its
      // files are never dropped, with no in-flight wait or grace lease.
      val onDisk = versionsOnDisk(fs, root)
      val latestComplete = onDisk.sorted(Ordering[Long].reverse)
        .find(v => loadVersion(fs, root, v).isDefined).getOrElse(0L)
      val squatted = onDisk.filter(_ > latestComplete).toSet
      val next = Iterator.iterate(latestComplete + 1)(_ + 1)
        .find(v => !squatted(v)).get
      val files = filesFor(latestComplete)
      // stats only for files that made it into this version's list
      val stats = statsFor(latestComplete).view.filterKeys(files.toSet).toMap
      // sizes are per-file FACTS (not version state): carried-over files
      // keep the previous version's recorded size, staged files bring
      // their own — no call-site plumbing needed
      val prevSnap = if (latestComplete == 0) None
        else loadVersion(fs, root, latestComplete)
      val sizes = (prevSnap.map(_.sizes).getOrElse(Map.empty)
        ++ newSizes).view.filterKeys(files.toSet).toMap
      // per-file row counts are the same kind of fact: carried files keep
      // theirs, files without one (just staged, or legacy) get it from the
      // parquet footer — a driver-side metadata read bounded by the batch.
      // They make `SELECT count(*)` (countRows) a manifest-only answer.
      val prevRows = prevSnap.map(_.rows).getOrElse(Map.empty)
      val rowCounts = files.flatMap { f =>
        prevRows.get(f).orElse(footerCache.getOrElseUpdate(f,
          scala.util.Try(footerRowCount(spark, new Path(root, f))).toOption))
          .map(f -> _)
      }.toMap
      // which sidecar blooms exist is a per-file fact too: carried files
      // keep their declaration, staged files bring theirs — readers learn
      // bloom availability from the manifest, no filesystem probing
      val bloomDecls = (prevSnap.map(_.blooms).getOrElse(Map.empty)
        ++ newBlooms).view.filterKeys(files.toSet).toMap
      // string bounds and null counts are per-file facts like sizes:
      // carried files keep the previous version's, staged files bring
      // their own — no call-site plumbing for carry-over
      val strBounds = (prevSnap.map(_.strs).getOrElse(Map.empty)
        ++ newStrs).view.filterKeys(files.toSet).toMap
      val nullCounts = (prevSnap.map(_.nulls).getOrElse(Map.empty)
        ++ newNulls).view.filterKeys(files.toSet).toMap
      // a file's deletion vector is per-file state: carried files keep
      // theirs unless the call site supersedes it; rewritten files (new
      // paths) start clean — the rewrite applied the DV while reading.
      // carryDvs=false makes newDvs the COMPLETE state (restore, which
      // must resurrect rows the current version has vectored out)
      val dvState = ((if (carryDvs) prevSnap.map(_.dvs).getOrElse(Map.empty)
        else Map.empty[String, (String, Long)])
        ++ newDvs).view.filterKeys(files.toSet).toMap
      // NDV/KLL sketch availability: per-file facts like bloom
      // declarations — but MONOTONE ones (a sketch file, once written,
      // exists forever; rewritten data gets a new path), so the merge is
      // a per-file UNION against the REBASED previous snapshot, not a map
      // overwrite. An overwrite loses a concurrent analyze's declaration
      // on OCC rebase: analyze(col b) committing between our snapshot
      // read and our claim would have its declaration clobbered by our
      // pre-read-based entry, silently degrading later approxDistinct /
      // approxQuantiles calls for b to full scans.
      def unionDecls(prev: Map[String, Seq[String]],
                     add: Map[String, Seq[String]]): Map[String, Seq[String]] =
        (prev ++ add.map { case (f, cs) =>
          f -> (prev.getOrElse(f, Nil) ++ cs).distinct
        }).view.filterKeys(files.toSet).toMap
      val ndvDecls = unionDecls(prevSnap.map(_.ndvs).getOrElse(Map.empty), newNdvs)
      val kllDecls = unionDecls(prevSnap.map(_.klls).getOrElse(Map.empty), newKlls)
      // constraint props are DATASET state, not per-commit metadata: carry
      // them from the previous version into every commit unless the caller
      // explicitly clears one (empty value = drop tombstone, never written)
      val carriedConstraints = prevSnap.map(_.props).getOrElse(Map.empty)
        .filter { case (k, _) => k.startsWith("constraint.") }
      val effProps = (carriedConstraints ++ props).filter { case (k, pv) =>
        !(k.startsWith("constraint.") && pv.isEmpty)
      }
      if (stagedValidate.nonEmpty) {
        val pending = constraintsOf(effProps)
          .filter { case (k, p) => !validatedCs.contains(k -> p) }
        if (pending.nonEmpty) {
          validateStaged(spark, path, stagedValidate, pending, validateMergeSchema)
          validatedCs ++= pending.toSeq
        }
      }
      val rendered = render(files, effProps, stats, sizes, rowCounts, bloomDecls,
        strBounds, nullCounts, dvState, ndvDecls, kllDecls)
      val stall = commitStallHook.get() // test-only fault injection
      if (stall != null) { commitStallHook.set(null); stall.run() }
      try {
        publishAtomic(fs, root, manifestPath(root, next), rendered)
        publishHint(spark, root, next) // advisory read accelerator
        return next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          if (attempts >= MaxCommitAttempts) throw new java.io.IOException(
            s"could not commit to $path after $MaxCommitAttempts attempts")
      }
    }
    -1L // unreachable
  }

  /** Publish `df` as the dataset's next version, REPLACING the previous
    * contents (CTAS semantics). Old versions stay readable.
    */
  def overwrite(df: DataFrame, path: String,
                props: Map[String, String] = Map.empty): Long = {
    val staged = stageSized(df, path)
    commit(df.sparkSession, path, props, newSizes = staged.toMap,
      stagedValidate = staged.map(_._1))(_ => staged.map(_._1))
  }

  /** [[overwrite]] recording per-file min/max bounds for `statsCols` —
    * the CTAS form of [[appendWithStats]].
    */
  def overwriteWithStats(df: DataFrame, path: String, statsCols: Seq[String],
                         props: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val staged = stageSized(df, path)
    val facts = computeFacts(spark, path, staged.map(_._1), statsCols)
    commit(spark, path, props + ("stats.cols" -> statsCols.mkString(",")),
      _ => facts.nums, newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls,
      stagedValidate = staged.map(_._1))(_ => staged.map(_._1))
  }

  /** Publish `df` as the next version APPENDED to the current one: the
    * new manifest is previous-files ++ new-files — no data file is read,
    * moved, or rewritten, so an append costs only the new data. On a
    * commit collision the append REBASES onto the winner's file list, so
    * concurrent appends both land.
    */
  def append(df: DataFrame, path: String,
             props: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    // schema evolution: a batch whose columns differ from the committed
    // set flips the dataset into mergeSchema reads — without the flag a
    // plain parquet read resolves ONE footer and silently drops the new
    // column. The flag is sticky (carried in props) so later readers and
    // appends keep merging; datasets that never evolve never pay the
    // all-footers mergeSchema cost.
    val prevV = latestVersion(spark, path)
    val evolved = prevV > 0 && {
      val prevSchema = read(spark, path, prevV).schema
      // fail the INCOMPATIBLE evolution at append time: a type conflict on
      // a shared column would poison every later read (parquet schema
      // merge throws once both footers meet), which at 100 TB surfaces
      // hours later in someone else's query — reject it here, where the
      // writer can still cast
      prevSchema.fields.foreach { pf =>
        df.schema.fields.find(_.name == pf.name).foreach { nf =>
          require(nf.dataType == pf.dataType,
            s"append would change column '${pf.name}' from ${pf.dataType.sql} " +
              s"to ${nf.dataType.sql} — cast the batch to the committed type " +
              "(only ADDING columns is supported schema evolution)")
        }
      }
      val prevProps = committedProps(spark, path, prevV)
      prevProps.get("merge.schema").contains("true") ||
        prevSchema.fieldNames.toSet != df.schema.fieldNames.toSet
    }
    val allProps = if (evolved) props + ("merge.schema" -> "true") else props
    val staged = stageSized(df, path)
    // carried-over files keep their recorded bounds (commit intersects
    // the stats map with the final file list)
    commit(spark, path, allProps,
      prev => if (prev == 0) Map.empty else snapshotOf(spark, path, prev).stats,
      newSizes = staged.toMap,
      stagedValidate = staged.map(_._1), validateMergeSchema = evolved) { prev =>
      (if (prev == 0) Nil else manifestFiles(spark, path, prev)) ++ staged.map(_._1)
    }
  }

  /** [[append]] that also records per-file min/max bounds for `statsCols`
    * in the manifest — Iceberg's file-skipping idea: one small aggregation
    * over ONLY the staged batch (grouped by file) computes the bounds, and
    * [[readRange]] later drops whole files whose range can't match, before
    * any footer is opened or task scheduled. Bounds of files carried over
    * from the previous version are carried with them. `statsCols` must
    * cast to double (numerics, dates via epoch — the usual clustering
    * columns).
    */
  def appendWithStats(df: DataFrame, path: String, statsCols: Seq[String],
                      props: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val staged = stageSized(df, path)
    val facts = computeFacts(spark, path, staged.map(_._1), statsCols)
    val allProps = props + ("stats.cols" -> statsCols.mkString(","))
    commit(spark, path, allProps,
      prev => (if (prev == 0) Map.empty[String, Map[String, (Double, Double)]]
        else snapshotOf(spark, path, prev).stats) ++ facts.nums,
      newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls,
      stagedValidate = staged.map(_._1)) { prev =>
      (if (prev == 0) Nil else manifestFiles(spark, path, prev)) ++ staged.map(_._1)
    }
  }

  /** Rows of the current (or given) version with `column` in [lo, hi],
    * skipping every file whose recorded bounds can't intersect the range —
    * the file list shrinks BEFORE Spark plans the scan, so at 100 TB a
    * narrow range on the stats column costs the matching files only.
    * Files without recorded bounds are read (correctness over pruning);
    * the row-level filter still applies either way.
    */
  def readRange(spark: SparkSession, path: String, column: String,
                lo: Double, hi: Double, version: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val keep = snap.files.filter { f =>
      snap.stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    // all files pruned → nothing can match; keep the plan trivially empty
    // by scanning the (tiny) first file with an always-false residual
    val src =
      if (keep.isEmpty) spark.read.parquet(s"$path/${snap.files.head}")
      else readFilesWithDv(spark, path, snap, keep)
    val enc = statEncode(src, column)
    val pred = enc >= lo && enc <= hi
    if (keep.isEmpty) src.filter(org.apache.spark.sql.functions.lit(false) && pred)
    else src.filter(pred)
  }

  /** Exact row count of one parquet file from its footer — a driver-side
    * metadata read (no task, no data pages), the source of the manifest's
    * per-file `#rows` facts.
    */
  private def footerRowCount(spark: SparkSession, p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** `SELECT count(*)` answered from the manifest alone: every commit
    * records each file's exact row count (carried with the file across
    * appends/upserts/compactions), so counting a 100 TB dataset is one
    * small-file read — no scan, no job. Files without a recorded count
    * (manifests written before this fact existed) are counted by reading
    * just those files.
    */
  def countRows(spark: SparkSession, path: String, version: Long = -1L): Long = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val (have, missing) = snap.files.partition(snap.rows.contains)
    // merge-on-read deletes subtract exactly: each `#dv` line carries the
    // file's cumulative deleted-row count
    val deleted = have.flatMap(snap.dvs.get).map(_._2).sum
    have.map(snap.rows).sum - deleted + (if (missing.isEmpty) 0L
      else readFilesWithDv(spark, path, snap, missing).count())
  }

  // ── point lookups: per-file bloom-filter sidecars ────────────────────────

  private def bloomSidecar(f: String, c: String): String = s"$f.bloom.${enc(c)}"

  /** Load one bloom sidecar, None when absent/unreadable (internal surface
    * for the point-lookup path and the declarative FileIndex — a missing
    * or corrupt sidecar degrades to "read the file", never to wrong rows).
    */
  def readBloomSidecar(spark: SparkSession, root: Path, rel: String,
                       c: String): Option[org.apache.spark.util.sketch.BloomFilter] =
    scala.util.Try {
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new Path(root, bloomSidecar(rel, c)))
      try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
    }.toOption

  /** [[append]] that also builds a per-file Bloom filter over each of
    * `bloomCols`, written as a sidecar next to the data file. Min/max
    * bounds ([[appendWithStats]]) prune range scans on CLUSTERED columns;
    * blooms prune POINT lookups on columns the layout is not sorted by —
    * the "find one id in 100 TB" shape where every file's [min,max]
    * overlaps but almost no file actually holds the key. Sidecars are
    * immutable facts of their data file: appends and upserts carry them
    * implicitly (files never move), compaction's rewritten files simply
    * have none (read, not pruned — correctness over pruning), and vacuum
    * removes them with their file. One distributed pass over ONLY the
    * staged batch builds all blooms (capacity = the file's exact footer
    * row count, so fpp holds regardless of file sizing).
    */
  def appendWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                      fpp: Double = 0.01,
                      props: Map[String, String] = Map.empty,
                      statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val staged = stageSized(df, path)
    writeBlooms(spark, path, staged.map(_._1), bloomCols, fpp)
    val facts = computeFacts(spark, path, staged.map(_._1), statsCols)
    val allProps = props + ("bloom.cols" -> bloomCols.mkString(",")) ++
      (if (statsCols.nonEmpty) Map("stats.cols" -> statsCols.mkString(",")) else Map.empty)
    commit(spark, path, allProps,
      prev => (if (prev == 0) Map.empty[String, Map[String, (Double, Double)]]
        else snapshotOf(spark, path, prev).stats) ++ facts.nums,
      newSizes = staged.toMap,
      newBlooms = staged.map(_._1 -> bloomCols).toMap,
      newStrs = facts.strs, newNulls = facts.nulls,
      stagedValidate = staged.map(_._1)) { prev =>
      (if (prev == 0) Nil else manifestFiles(spark, path, prev)) ++ staged.map(_._1)
    }
  }

  private def writeBlooms(spark: SparkSession, path: String,
                          files: Seq[String], cols: Seq[String],
                          fpp: Double): Unit = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import org.apache.spark.sql.types._
    if (files.isEmpty || cols.isEmpty) return
    val (fs, root) = fsFor(spark, path)
    val capacity = files.map(f => f -> footerRowCount(spark, new Path(root, f))).toMap
    val src = spark.read.parquet(files.map(f => s"$path/$f"): _*)
    // integral keys hash as long, strings as UTF-8 — the two point-lookup
    // key shapes; anything else should be bucketed/sorted instead
    val isLong: Seq[Boolean] = cols.map { c =>
      src.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case StringType => false
        case dt => throw new IllegalArgumentException(
          s"bloom column '$c' must be integral or string, found ${dt.sql}")
      }
    }
    val keyed = cols.zip(isLong).map { case (c, l) =>
      if (l) col(c).cast("long") else col(c)
    }
    val filesB = spark.sparkContext.broadcast(files.toVector)
    val capB = spark.sparkContext.broadcast(capacity)
    val nCols = cols.size
    val blooms = src.select(input_file_name() +: keyed: _*).rdd
      .mapPartitions { it =>
        // per-partition builders keyed by (file, col); same capacity per
        // file on every partition, so partial blooms merge bit-for-bit
        val local = scala.collection.mutable.HashMap
          .empty[(String, Int), org.apache.spark.util.sketch.BloomFilter]
        val uriToRel = scala.collection.mutable.HashMap.empty[String, String]
        it.foreach { r =>
          val uri = r.getString(0)
          // decoded-path match (percent-encoded partition dirs); a row
          // that maps to no staged file is a bug worth failing the job
          val rel = uriToRel.getOrElseUpdate(uri,
            relFileOfUri(uri, filesB.value).getOrElse(
              throw new IllegalStateException(
                s"writeBlooms: scanned row from '$uri' maps to no staged file")))
          var i = 0
          while (i < nCols) {
            if (!r.isNullAt(i + 1)) {
              val bf = local.getOrElseUpdate((rel, i),
                org.apache.spark.util.sketch.BloomFilter.create(
                  math.max(capB.value.getOrElse(rel, 1L), 1L), fpp))
              if (isLong(i)) bf.putLong(r.getLong(i + 1))
              else bf.putString(r.getString(i + 1))
            }
            i += 1
          }
        }
        local.iterator
      }
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect()
    blooms.foreach { case ((rel, i), bf) =>
      val out = fs.create(new Path(root, bloomSidecar(rel, cols(i))), true)
      try bf.writeTo(out) finally out.close()
    }
  }

  /** The file subset a point lookup must read: min/max-pruned (when bounds
    * are recorded) then bloom-pruned (when a sidecar exists). Exposed for
    * tests; [[readPoint]] is the query-facing form.
    */
  private[graft] def pointCandidates(spark: SparkSession, path: String,
                                     column: String, value: Any,
                                     version: Long = -1L): Seq[String] = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val (_, root) = fsFor(spark, path)
    val numeric: Option[Double] = value match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    snap.files.filter { f =>
      val inRange = (snap.stats.get(f).flatMap(_.get(column)), numeric) match {
        case (Some((lo, hi)), Some(d)) => d >= lo && d <= hi
        case _ => true
      }
      inRange && {
        // the manifest says which files carry a bloom for this column —
        // no filesystem probing; undeclared files must be read
        if (!snap.blooms.get(f).exists(_.contains(column))) true
        else readBloomSidecar(spark, root, f, column) match {
          case None => true // unreadable sidecar → read the file
          case Some(bf) => value match {
            case n: java.lang.Number => bf.mightContainLong(n.longValue())
            case s: String => bf.mightContainString(s)
            case _ => true
          }
        }
      }
    }
  }

  /** Rows of the current (or given) version with `column` = `value`,
    * reading only the files whose bloom admits the key (plus any without a
    * sidecar). At 100 TB a point lookup on a bloom-indexed column opens a
    * handful of files instead of the dataset; the row-level equality
    * filter still applies, so a bloom false-positive costs one extra file
    * scan, never a wrong row.
    */
  def readPoint(spark: SparkSession, path: String, column: String,
                value: Any, version: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = if (version < 0) latestVersion(spark, path) else version
    val keep = pointCandidates(spark, path, column, value, v)
    val snap = snapshotOf(spark, path, v)
    val pred = col(column) === lit(value)
    if (keep.isEmpty)
      spark.read.parquet(s"$path/${snap.files.head}").filter(lit(false) && pred)
    else readFilesWithDv(spark, path, snap, keep).filter(pred)
  }

  // ── per-file cardinality sketches: metadata-only approximate NDV ─────────

  private[ops] def ndvSidecar(f: String, c: String): String = s"$f.ndv.${enc(c)}"

  /** Record a per-file HLL cardinality sketch for each of `cols` as
    * sidecar files (Iceberg's puffin-sketch idea, kept per DATA FILE so
    * file churn composes exactly: an append sketches only the new files,
    * a compaction drops rewritten files' sketches with the files). One
    * pass over ONLY the files missing a sketch (re-running after an
    * append analyzes just the new files); declarations (`#ndv` lines)
    * carry through commits like bloom declarations. HLL sketches are
    * union-mergeable without error growth, so [[approxDistinct]] later
    * answers "how many distinct X in 100 TB" from the sidecars alone —
    * no scan. Returns the version (new, or current when nothing was
    * missing).
    */
  def analyzeNdv(spark: SparkSession, path: String, cols: Seq[String],
                 lgK: Int = 12): Long = {
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    require(cols.nonEmpty, "analyzeNdv needs at least one column")
    val snap = snapshotOf(spark, path, v)
    val missing = snap.files.filter(f =>
      cols.exists(c => !snap.ndvs.get(f).exists(_.contains(c))))
    if (missing.isEmpty) return v
    writeNdvSketches(spark, path, missing, cols, lgK, snap.rows)
    // only the NEWLY-sketched cols are declared here; commit() UNIONS
    // declarations per file against the REBASED previous snapshot, so
    // analyzing col b after (or concurrently with) col a never drops a's
    // declaration (which would silently degrade later approxDistinct("a")
    // calls to full scans)
    commit(spark, path, snap.props + ("ndv.cols" -> cols.mkString(",")),
      prev => snapshotOf(spark, path, prev).stats,
      newNdvs = missing.map(f => f -> cols).toMap)(
      prev => manifestFiles(spark, path, prev))
  }

  /** Map an `input_file_name()` URI back to the manifest-relative path it
    * scanned. The URI is percent-ENCODED (a space in a `__p_c=v` partition
    * dir arrives as `%20`), manifest entries are raw — so match on the
    * DECODED path. Returns None when no manifest entry matches.
    */
  private def relFileOfUri(uri: String, files: Seq[String]): Option[String] = {
    val decoded = scala.util.Try(new java.net.URI(uri).getPath)
      .toOption.filter(_ != null).getOrElse(uri)
    files.find(f => decoded.endsWith("/" + f) || uri.endsWith("/" + f))
  }

  /** One distributed pass: per-(file, col) HLL sketches via Spark's own
    * `hll_sketch_agg` (DataSketches binary — driver-heapifiable), written
    * as `<file>.ndv.<col>` sidecars. An all-null file records an EMPTY
    * sketch, so its declaration is still truthful. A file that produced
    * no aggregation row gets an empty sketch ONLY when the manifest
    * confirms it zero-row — an unmappable row or an unexplained missing
    * file fails loudly rather than silently declaring an empty sketch
    * that would exclude the file's values from every later estimate.
    */
  private def writeNdvSketches(spark: SparkSession, path: String,
                               files: Seq[String], cols: Seq[String],
                               lgK: Int, knownRows: Map[String, Long]): Unit = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty || cols.isEmpty) return
    val (fs, root) = fsFor(spark, path)
    val src = spark.read.parquet(files.map(f => s"$path/$f"): _*)
    val aggs = cols.map(c => hll_sketch_agg(col(c), lit(lgK)).as(s"sk__$c"))
    val rows = src.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val seen = scala.collection.mutable.HashSet.empty[String]
    rows.foreach { r =>
      val uri = r.getString(0)
      val rel = relFileOfUri(uri, files).getOrElse(throw new IllegalStateException(
        s"analyzeNdv: aggregation row for '$uri' maps to no manifest file — " +
          "refusing to drop its values from the sketches"))
      seen += rel
      cols.zipWithIndex.foreach { case (c, i) =>
        val bytes = Option(r.getAs[Array[Byte]](i + 1)).getOrElse(
          new org.apache.datasketches.hll.HllSketch(lgK).toUpdatableByteArray)
        val out = fs.create(new Path(root, ndvSidecar(rel, c)), true)
        try out.write(bytes) finally out.close()
      }
    }
    files.filterNot(seen).foreach { rel =>
      val zeroRow = knownRows.get(rel).map(_ == 0L)
        .getOrElse(scala.util.Try(
          footerRowCount(spark, new Path(root, rel)) == 0L).getOrElse(false))
      if (!zeroRow) throw new IllegalStateException(
        s"analyzeNdv: file '$rel' is not zero-row but produced no " +
          "aggregation row — its values would be missing from the sketches")
      cols.foreach { c =>
        val out = fs.create(new Path(root, ndvSidecar(rel, c)), true)
        try out.write(
          new org.apache.datasketches.hll.HllSketch(lgK).toUpdatableByteArray)
        finally out.close()
      }
    }
  }

  /** Approximate distinct count of `column` over a version (default:
    * latest), answered from the per-file sketches: each declared sidecar
    * heapifies and unions driver-side (bounded metadata — no task, no
    * scan); files WITHOUT a sketch (staged after the last [[analyzeNdv]],
    * or compaction rewrites) are sketched on the fly in one pass over
    * just those files. HLL unions are lossless over merges, so the result
    * equals a single global sketch at the same lgK — relative standard
    * error ≈ 1.04/√(2^lgK) (±1.6% at the default lgK=12). Under
    * merge-on-read deletes the estimate ignores deletion vectors (a
    * sketch cannot subtract) — an upper bound until purge/compaction.
    */
  /** Above this many sidecars, merging goes DISTRIBUTED (binaryFile scan
    * → per-partition partial merge → driver merges one partial per
    * partition) instead of a driver-side loop of one small read per file
    * — a 100k-file dataset's NDV/quantile answer stays a short parallel
    * job rather than 100k sequential filesystem round-trips.
    */
  private val SketchMergeDistributedThreshold = 256

  /** Partial-merge sidecar byte blobs on executors: one partial per
    * partition comes back to the driver. `mergeBytes` folds a blob list
    * into one blob; runs inside executors (datasketches is on Spark's own
    * classpath) and once more on the driver over the partials.
    */
  private[ops] def mergeSidecarsDistributed(spark: SparkSession, root: Path,
                                       sidecars: Seq[String],
                                       mergeBytes: Seq[Array[Byte]] => Array[Byte])
      : Option[Array[Byte]] = {
    val paths = sidecars.map(s => new Path(root, s).toString)
    val partials = spark.read.format("binaryFile")
      .load(paths: _*)
      .select("content").rdd
      .mapPartitions { it =>
        val blobs = it.map(_.getAs[Array[Byte]](0)).toSeq
        if (blobs.isEmpty) Iterator.empty else Iterator(mergeBytes(blobs))
      }
      .collect()
    if (partials.isEmpty) None else Some(mergeBytes(partials.toSeq))
  }

  private[ops] def hllMergeBytes(lgK: Int)(blobs: Seq[Array[Byte]]): Array[Byte] = {
    val u = new org.apache.datasketches.hll.Union(lgK)
    blobs.foreach(b => u.update(org.apache.datasketches.hll.HllSketch.heapify(b)))
    u.getResult.toUpdatableByteArray
  }

  private[ops] def kllMergeBytes(k: Int)(blobs: Seq[Array[Byte]]): Array[Byte] = {
    val m = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
    blobs.foreach(b => m.merge(org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(b))))
    m.toByteArray
  }

  def approxDistinct(spark: SparkSession, path: String, column: String,
                     version: Long = -1L, lgK: Int = 12): Double = {
    // selective import: functions.version/functions.column would shadow
    // the parameters under a wildcard
    import org.apache.spark.sql.functions.{col, hll_sketch_agg, lit}
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val (fs, root) = fsFor(spark, path)
    val union = new org.apache.datasketches.hll.Union(lgK)
    val (declared, undeclared) = snap.files.partition(f =>
      snap.ndvs.get(f).exists(_.contains(column)))
    val unreadable: Seq[String] =
      if (declared.size > SketchMergeDistributedThreshold) {
        mergeSidecarsDistributed(spark, root,
          declared.map(ndvSidecar(_, column)), hllMergeBytes(lgK))
          .foreach(b => union.update(
            org.apache.datasketches.hll.HllSketch.heapify(b)))
        Nil // a missing/corrupt sidecar fails the job loudly at this scale
      } else declared.filterNot { f =>
        scala.util.Try {
          val in = fs.open(new Path(root, ndvSidecar(f, column)))
          val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
            finally in.close()
          union.update(org.apache.datasketches.hll.HllSketch.heapify(bytes))
        }.isSuccess
      }
    val fallback = undeclared ++ unreadable
    if (fallback.nonEmpty) {
      val bytes = spark.read.parquet(fallback.map(f => s"$path/$f"): _*)
        .agg(hll_sketch_agg(col(column), lit(lgK)).as("sk"))
        .head.getAs[Array[Byte]](0)
      if (bytes != null)
        union.update(org.apache.datasketches.hll.HllSketch.heapify(bytes))
    }
    union.getResult.getEstimate
  }

  // ── per-file quantile sketches: metadata-only approximate percentiles ────

  private[ops] def kllSidecar(f: String, c: String): String = s"$f.kll.${enc(c)}"

  /** Record a per-file KLL quantile sketch for each numeric column in
    * `cols` — the quantile sibling of [[analyzeNdv]]: with count/min/max
    * exact from the manifest and NDV from HLL sidecars, KLL completes the
    * metadata-only profile (percentiles for monitoring/drift dashboards
    * without scanning 100 TB). One pass over only the files missing a
    * sketch; declarations (`#kll` lines) carry like bloom/ndv facts. KLL
    * sketches merge with bounded rank error (~1.65% at the default
    * k=200), independent of file count.
    */
  def analyzeQuantiles(spark: SparkSession, path: String, cols: Seq[String],
                       k: Int = 200): Long = {
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    require(cols.nonEmpty, "analyzeQuantiles needs at least one column")
    val snap = snapshotOf(spark, path, v)
    val missing = snap.files.filter(f =>
      cols.exists(c => !snap.klls.get(f).exists(_.contains(c))))
    if (missing.isEmpty) return v
    writeKllSketches(spark, path, missing, cols, k, snap.rows)
    // new cols only; commit() unions against the rebased snapshot (same
    // rationale as analyzeNdv)
    commit(spark, path, snap.props + ("kll.cols" -> cols.mkString(",")),
      prev => snapshotOf(spark, path, prev).stats,
      newKlls = missing.map(f => f -> cols).toMap)(
      prev => manifestFiles(spark, path, prev))
  }

  /** One distributed pass: per-(file, col) KLL doubles sketches via
    * Spark's `kll_sketch_agg_double` (DataSketches binary), written as
    * `<file>.kll.<col>` sidecars. Zero-row/all-null files record an
    * empty sketch so their declaration stays truthful.
    */
  private def writeKllSketches(spark: SparkSession, path: String,
                               files: Seq[String], cols: Seq[String],
                               k: Int, knownRows: Map[String, Long]): Unit = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty || cols.isEmpty) return
    val (fs, root) = fsFor(spark, path)
    val src = spark.read.parquet(files.map(f => s"$path/$f"): _*)
    // SQL-only surface in Spark 4.1 (no functions._ wrapper for KLL)
    val aggs = cols.map(c =>
      expr(s"kll_sketch_agg_double(CAST(`$c` AS DOUBLE), $k)").as(s"sk__$c"))
    val rows = src.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    def emptySketch: Array[Byte] =
      org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k).toByteArray
    val seen = scala.collection.mutable.HashSet.empty[String]
    rows.foreach { r =>
      val uri = r.getString(0)
      // decoded-path match + fail-loud, same contract as writeNdvSketches
      val rel = relFileOfUri(uri, files).getOrElse(throw new IllegalStateException(
        s"analyzeQuantiles: aggregation row for '$uri' maps to no manifest " +
          "file — refusing to drop its values from the sketches"))
      seen += rel
      cols.zipWithIndex.foreach { case (c, i) =>
        val bytes = Option(r.getAs[Array[Byte]](i + 1)).getOrElse(emptySketch)
        val out = fs.create(new Path(root, kllSidecar(rel, c)), true)
        try out.write(bytes) finally out.close()
      }
    }
    files.filterNot(seen).foreach { rel =>
      val zeroRow = knownRows.get(rel).map(_ == 0L)
        .getOrElse(scala.util.Try(
          footerRowCount(spark, new Path(root, rel)) == 0L).getOrElse(false))
      if (!zeroRow) throw new IllegalStateException(
        s"analyzeQuantiles: file '$rel' is not zero-row but produced no " +
          "aggregation row — its values would be missing from the sketches")
      cols.foreach { c =>
        val out = fs.create(new Path(root, kllSidecar(rel, c)), true)
        try out.write(emptySketch) finally out.close()
      }
    }
  }

  /** Approximate quantiles of `column` at ranks `probs` over a version
    * (default: latest), answered from the per-file KLL sketches: declared
    * sidecars heapify and merge driver-side (bounded metadata, no scan);
    * files without a sketch are sketched on the fly in one pass over just
    * those files. Merged rank error stays ~1.65% at k=200 regardless of
    * file count. Under merge-on-read deletes the estimate ignores
    * deletion vectors (sketches cannot subtract) until purge/compaction.
    */
  def approxQuantiles(spark: SparkSession, path: String, column: String,
                      probs: Seq[Double], version: Long = -1L,
                      k: Int = 200): Seq[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be ranks in [0, 1]")
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val merged = mergedKll(spark, path, column, v, k)
    require(!merged.isEmpty,
      s"no non-null values of '$column' at $path v$v — no quantiles")
    probs.map(merged.getQuantile)
  }

  /** The version's merged KLL sketch of `column`: declared sidecars
    * heapify+merge driver-side; files without one (or unreadable) fall
    * back to one sketch pass over just those files.
    */
  private def mergedKll(spark: SparkSession, path: String, column: String,
                        v: Long, k: Int)
      : org.apache.datasketches.kll.KllDoublesSketch = {
    // selective import: functions.column would shadow the parameter
    import org.apache.spark.sql.functions.expr
    val snap = snapshotOf(spark, path, v)
    val (fs, root) = fsFor(spark, path)
    val merged = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
    val (declared, undeclared) = snap.files.partition(f =>
      snap.klls.get(f).exists(_.contains(column)))
    val unreadable: Seq[String] =
      if (declared.size > SketchMergeDistributedThreshold) {
        mergeSidecarsDistributed(spark, root,
          declared.map(kllSidecar(_, column)), kllMergeBytes(k))
          .foreach(b => merged.merge(
            org.apache.datasketches.kll.KllDoublesSketch.heapify(
              org.apache.datasketches.memory.Memory.wrap(b))))
        Nil // a missing/corrupt sidecar fails the job loudly at this scale
      } else declared.filterNot { f =>
        scala.util.Try {
          val in = fs.open(new Path(root, kllSidecar(f, column)))
          val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
            finally in.close()
          merged.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(bytes)))
        }.isSuccess
      }
    val fallback = undeclared ++ unreadable
    if (fallback.nonEmpty) {
      val bytes = spark.read.parquet(fallback.map(f => s"$path/$f"): _*)
        .agg(expr(s"kll_sketch_agg_double(CAST(`$column` AS DOUBLE), $k)").as("sk"))
        .head.getAs[Array[Byte]](0)
      if (bytes != null)
        merged.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bytes)))
    }
    merged
  }

  /** Metadata-only drift: PSI between two VERSIONS' distributions of
    * `column`, estimated from their KLL sketches alone (equal-width bins
    * spanning the union range; KLL tracks exact min/max, so the edges are
    * exact). The 100 TB drift-monitor shape: after each publish, one
    * manifest read + sidecar merge answers "did the distribution move?"
    * without scanning either version. Same ε-free convention as
    * [[Profile.driftPsi]]: bins where either cohort has no estimated mass
    * are excluded. Estimate error follows KLL rank error (~±1.65% mass
    * per bin at k=200) — use it as an ALARM (PSI > 0.2 ⇒ shifted), not a
    * precise statistic; verify an alarm with the exact scan if it
    * matters.
    */
  final case class PsiEstimate(psi: Double, lo: Double, hi: Double, nBins: Int)

  def psiFromSketches(spark: SparkSession, path: String, column: String,
                      versionA: Long, versionB: Long, nBins: Int = 10,
                      k: Int = 200): PsiEstimate = {
    require(nBins >= 2, "need at least 2 bins")
    val a = mergedKll(spark, path, column, versionA, k)
    val b = mergedKll(spark, path, column, versionB, k)
    require(!a.isEmpty && !b.isEmpty,
      s"both versions need non-null values of '$column'")
    val lo = math.min(a.getMinItem, b.getMinItem)
    val hi = math.max(a.getMaxItem, b.getMaxItem)
    require(hi > lo, s"'$column' is constant across both versions — no bins")
    val edges = (1 until nBins).map(i => lo + (hi - lo) * i / nBins).toArray
    val pa = a.getPMF(edges)
    val pb = b.getPMF(edges)
    val psi = pa.zip(pb).collect {
      case (p, q) if p > 0 && q > 0 => (p - q) * math.log(p / q)
    }.sum
    PsiEstimate(psi, lo, hi, nBins)
  }

  /** The numeric encoding a column's bounds are recorded in: dates as
    * epoch DAYS (`unix_date` — a plain numeric cast is not defined for
    * dates), timestamps as fractional epoch seconds (Spark's own
    * timestamp→double cast), everything else as its double cast. The
    * filter-literal side of the encoding lives in
    * `ManifestFileIndex.numeric` and MUST stay in sync.
    */
  private[graft] def statEncode(df: DataFrame,
                                c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** Longest string bound recorded verbatim; longer values are truncated
    * (Iceberg's binary-truncate idea, at code-point granularity).
    */
  private[graft] val StrBoundCap = 64

  /** Compare two strings in CODE POINT order — the order Spark's own
    * min/max uses (UTF8String comparison is unsigned byte order over
    * UTF-8, which coincides with code-point lexicographic order). Java's
    * `String.compareTo` does NOT (UTF-16 code units put U+E000..U+FFFF
    * above supplementary characters), so pruning decisions against
    * recorded string bounds must go through this.
    */
  def cpCompare(a: String, b: String): Int = {
    val ai = a.codePoints().iterator(); val bi = b.codePoints().iterator()
    while (ai.hasNext && bi.hasNext) {
      val x = ai.nextInt(); val y = bi.nextInt()
      if (x != y) return Integer.compare(x, y)
    }
    java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }

  /** Smallest string strictly greater than every string with prefix `s`:
    * increment the last incrementable code point (skipping the surrogate
    * hole). None when no position can be incremented — the caller must
    * then treat the upper side as unbounded.
    */
  def cpSuccessor(s: String): Option[String] = {
    var i = s.codePointCount(0, s.length) - 1
    while (i >= 0) {
      val off = s.offsetByCodePoints(0, i)
      val cp = s.codePointAt(off)
      if (cp < Character.MAX_CODE_POINT && !Character.isSurrogate(s.charAt(off))) {
        val next = if (cp == 0xD7FF) 0xE000 else cp + 1
        return Some(s.substring(0, off) + new String(Character.toChars(next)))
      }
      i -= 1
    }
    None
  }

  /** Truncate to a LOWER bound: a strict prefix sorts ≤ the original. */
  private def truncLo(s: String): (String, Boolean) =
    if (s.codePointCount(0, s.length) <= StrBoundCap) (s, true)
    else (s.substring(0, s.offsetByCodePoints(0, StrBoundCap)), false)

  /** Truncate to an UPPER bound: cut to the cap, then take the successor
    * of the prefix so the result sorts ≥ every string it bounded. None
    * when no valid successor exists (give up — record no bound).
    */
  private def truncHi(s: String): Option[(String, Boolean)] =
    if (s.codePointCount(0, s.length) <= StrBoundCap) Some((s, true))
    else cpSuccessor(s.substring(0, s.offsetByCodePoints(0, StrBoundCap)))
      .map(h => (h, false))

  private[ops] final case class FileFacts(
      nums: Map[String, Map[String, (Double, Double)]] = Map.empty,
      strs: Map[String, Map[String, StrBound]] = Map.empty,
      nulls: Map[String, Map[String, Long]] = Map.empty)

  /** Per-file facts for `cols` over exactly the given files — min/max
    * bounds (numeric encoding for numerics/dates, code-point-ordered
    * truncated bounds for strings) and a null count per column — from ONE
    * aggregation grouped by `input_file_name()`: cost bounded by the
    * batch being committed, never the dataset.
    */
  private def computeFacts(spark: SparkSession, path: String, files: Seq[String],
                           cols: Seq[String]): FileFacts = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty || cols.isEmpty) return FileFacts()
    val src = spark.read.parquet(files.map(f => s"$path/$f"): _*)
    val isStr = cols.map(c =>
      c -> (src.schema(c).dataType == org.apache.spark.sql.types.StringType)).toMap
    val aggs = cols.flatMap { c =>
      val bound = if (isStr(c)) col(c) else statEncode(src, c)
      Seq(min(bound).as(s"lo__$c"), max(bound).as(s"hi__$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn__$c"))
    }
    val rows = src
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val perFile = rows.toSeq.flatMap { r =>
      val uri = r.getString(0)
      // decoded-path match: a fact row that maps to no staged file would
      // silently strip that file's min/max/null-count pruning facts
      val rel = relFileOfUri(uri, files).getOrElse(throw new IllegalStateException(
        s"computeFacts: aggregation row for '$uri' maps to no staged file"))
      Some(rel).map { rel =>
        val nums = cols.filterNot(isStr).flatMap { c =>
          val lo = r.getAs[java.lang.Double](s"lo__$c")
          val hi = r.getAs[java.lang.Double](s"hi__$c")
          if (lo == null || hi == null) None
          else Some(c -> (lo.doubleValue(), hi.doubleValue()))
        }.toMap
        val strBounds = cols.filter(isStr).flatMap { c =>
          val lo = r.getAs[String](s"lo__$c")
          val hi = r.getAs[String](s"hi__$c")
          if (lo == null || hi == null) None
          else {
            val (l, le) = truncLo(lo)
            truncHi(hi).map { case (h, he) => c -> StrBound(l, h, le && he) }
          }
        }.toMap
        val nullCounts = cols.flatMap { c =>
          Option(r.getAs[java.lang.Long](s"nn__$c")).map(c -> _.longValue())
        }.toMap
        (rel, nums, strBounds, nullCounts)
      }
    }
    FileFacts(
      perFile.map(p => p._1 -> p._2).filter(_._2.nonEmpty).toMap,
      perFile.map(p => p._1 -> p._3).filter(_._2.nonEmpty).toMap,
      perFile.map(p => p._1 -> p._4).filter(_._2.nonEmpty).toMap)
  }

  /** Read a version (default: latest) as a DataFrame — an explicit file
    * list, so no directory listing, no visibility race with an in-flight
    * commit, and no partition-schema inference (partition columns live in
    * the data files themselves; see [[partDirCol]]).
    */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val reader =
      if (snap.props.get("merge.schema").contains("true"))
        spark.read.option("mergeSchema", "true")
      else spark.read
    val base = reader.parquet(snap.files.map(f => s"$path/$f"): _*)
    if (!snap.files.exists(snap.dvs.contains)) base
    else {
      import org.apache.spark.sql.functions._
      val prefix = qualifiedPrefix(spark, path)
      val dv = dvPairs(spark, path, snap, snap.files).get
        .withColumnRenamed("file", "__gf").withColumnRenamed("row_index", "__gri")
      base
        .withColumn("__gf",
          expr(s"substring(_metadata.file_path, ${prefix.length + 1})"))
        .withColumn("__gri", col("_metadata.row_index"))
        .join(dv, Seq("__gf", "__gri"), "left_anti")
        .drop("__gf", "__gri")
    }
  }

  /** Read a version (default: latest) through a manifest-backed
    * [[org.apache.spark.sql.graft.ManifestFileIndex]] — the DECLARATIVE
    * form of [[readRange]]/[[readPartitions]]: a plain `.filter(...)` on
    * the returned DataFrame is pushed down by Catalyst into manifest-level
    * file skipping (recorded min/max bounds) and partition pruning
    * (`__p_c=v` dirs), with zero filesystem listing — file paths and sizes
    * come from the manifest, so at 100 TB planning costs one small
    * manifest read plus one schema footer. Equivalent rows to [[read]];
    * prefer this for analytical scans with selective predicates.
    */
  def table(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val base = org.apache.spark.sql.graft.ManifestFileIndex
      .dataFrame(spark, tableInfo(spark, path, version))
    val v = if (version < 0) latestVersion(spark, path) else version
    val snap = snapshotOf(spark, path, v)
    if (snap.dvs.isEmpty) base
    else {
      // merge-on-read: anti-join the deletion vectors on (file, row
      // index). Filters on data columns still push through the join's
      // left side into manifest-level pruning; metadata-only rewrites
      // correctly decline (the aggregate no longer sits on a bare
      // relation, and DV counts would falsify the facts).
      import org.apache.spark.sql.functions._
      val prefix = qualifiedPrefix(spark, path)
      val dv = dvPairs(spark, path, snap, snap.files).get
        .withColumnRenamed("file", "__gf").withColumnRenamed("row_index", "__gri")
      base
        .withColumn("__gf",
          expr(s"substring(_metadata.file_path, ${prefix.length + 1})"))
        .withColumn("__gri", col("_metadata.row_index"))
        .join(dv, Seq("__gf", "__gri"), "left_anti")
        .drop("__gf", "__gri")
    }
  }

  /** Everything a relation over a manifest snapshot needs — shared by
    * [[table]] and the `graft-manifest` data source format
    * ([[org.apache.spark.sql.graft.ManifestDataSource]]), which makes
    * these datasets addressable from pure SQL (`CREATE ... USING`).
    */
  final case class TableInfo(
      root: Path,
      entries: Seq[(String, org.apache.hadoop.fs.FileStatus)],
      stats: Map[String, Map[String, (Double, Double)]],
      partCols: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType,
      options: Map[String, String],
      blooms: Map[String, Seq[String]] = Map.empty,
      rows: Map[String, Long] = Map.empty,
      strs: Map[String, Map[String, StrBound]] = Map.empty,
      nulls: Map[String, Map[String, Long]] = Map.empty) {
    /** Exact table row count, known iff every file has a recorded count —
      * what lets `SELECT count(*)` skip the scan entirely.
      */
    def knownRowCount: Option[Long] =
      if (entries.forall { case (rel, _) => rows.contains(rel) })
        Some(entries.map { case (rel, _) => rows(rel) }.sum)
      else None
  }

  def tableInfo(spark: SparkSession, path: String, version: Long = -1L): TableInfo = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    require(snap.files.nonEmpty, s"version $v at $path lists no files")
    val (fs, root) = fsFor(spark, path)
    val qroot = fs.makeQualified(root)
    val entries = snap.files.map { rel =>
      val p = new Path(qroot, rel)
      // pre-size-recording manifests fall back to one status call per file
      val len = snap.sizes.getOrElse(rel, fs.getFileStatus(p).getLen)
      rel -> new org.apache.hadoop.fs.FileStatus(len, false, 1, 0L, 0L, p)
    }
    val merge = snap.props.get("merge.schema").contains("true")
    val dataSchema =
      if (merge)
        spark.read.option("mergeSchema", "true")
          .parquet(snap.files.map(f => s"$path/$f"): _*).schema
      else spark.read.parquet(s"$path/${snap.files.head}").schema
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    TableInfo(qroot, entries, snap.stats, partCols, dataSchema,
      if (merge) Map("mergeSchema" -> "true") else Map.empty,
      snap.blooms, snap.rows, snap.strs, snap.nulls)
  }

  /** Read only the files of the partitions matching `values` (col→value,
    * string-rendered) — manifest-level partition pruning: file selection
    * happens on the tiny manifest list, so unmatched files are never
    * opened, listed, or scheduled.
    */
  def readPartitions(spark: SparkSession, path: String,
                     values: Map[String, String], version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"dataset at $path has no committed version")
    val spec = values.toSeq.map { case (c, x) =>
      s"${partDirCol(c)}=${escapePathSegment(x)}" }
    val snap = snapshotOf(spark, path, v)
    val files = snap.files.filter(f => fileInSpec(f, spec))
    require(files.nonEmpty, s"no files match partition spec $values at $path v$v")
    readFilesWithDv(spark, path, snap, files)
  }

  /** Keyed upsert as a manifest commit: last-writer-wins within the batch
    * by `orderCol`, key matches replace existing rows, everything else
    * passes through. With `partitionCols` the merge is PARTITION-SCOPED:
    * only files in partitions the batch touches are read and rewritten;
    * untouched partitions' manifest entries carry over byte-identical
    * (same relative paths). Without `partitionCols` the whole dataset is
    * rewritten (fine for small dimensions; pair big facts with a
    * partitioned layout).
    */
  def upsert(batch: DataFrame, path: String, keys: Seq[String],
             orderCol: String, partitionCols: Seq[String] = Nil,
             extraProps: Map[String, String] = Map.empty): Long = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc(orderCol))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val props = extraProps ++
      (if (partitionCols.isEmpty) Map.empty[String, String]
       else Map("part.cols" -> partitionCols.mkString(",")))
    val prevV = latestVersion(spark, path)
    if (prevV == 0) {
      val staged = stageSized(latest, path, partitionCols)
      commit(spark, path, props, newSizes = staged.toMap)(_ => staged.map(_._1))
    } else if (partitionCols.isEmpty) {
      val merged = read(spark, path)
        .join(latest.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(latest, allowMissingColumns = true)
      overwrite(merged, path, props)
    } else {
      // touched partition specs, serialized the way the parquet writer
      // names partition directories (bounded driver-side metadata: one
      // row per touched partition, not per data row)
      val touched = touchedSpecs(latest, partitionCols)
      val prevSnap = snapshotOf(spark, path, prevV)
      val prevFiles = prevSnap.files
      val (touchedFiles, untouchedFiles) =
        prevFiles.partition(f => touched.exists(spec => fileInSpec(f, spec)))
      val merged =
        if (touchedFiles.isEmpty) latest
        else readFilesWithDv(spark, path, prevSnap, touchedFiles)
          .join(latest.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(latest, allowMissingColumns = true)
      val staged = stageSized(merged, path, partitionCols)
      commit(spark, path, props,
        prev => snapshotOf(spark, path, prev).stats,
        newSizes = staged.toMap,
        stagedValidate = staged.map(_._1)) { prev =>
        if (prev == prevV) untouchedFiles ++ staged.map(_._1)
        else { // rebase: keep the WINNER's untouched entries
          val rebased = manifestFiles(spark, path, prev)
            .filterNot(f => touched.exists(spec => fileInSpec(f, spec)))
          rebased ++ staged.map(_._1)
        }
      }
    }
  }

  /** Clauses of a [[merge]], Delta's MERGE INTO semantics. Conditions and
    * update expressions are SQL strings over aliases `t` (target row) and
    * `s` (matching source row). Clause precedence on a matched pair:
    * update (when its condition holds) wins over delete; a matched row
    * hitting neither clause carries over unchanged.
    */
  final case class MergeSpec(
      matchedUpdate: Map[String, String] = Map.empty,
      matchedUpdateCondition: Option[String] = None,
      matchedDeleteCondition: Option[String] = None,
      notMatchedInsert: Boolean = true,
      notMatchedInsertCondition: Option[String] = None)

  /** MERGE `source` into the dataset on `keys` as one manifest commit —
    * the general conditional upsert/update/delete/insert primitive
    * (Delta/Iceberg MERGE INTO), file-scoped like [[delete]]:
    *
    *  - only target files CONTAINING a matched key are rewritten (found by
    *    a stats-pruned semi-join probe, so at 100 TB a merge against a
    *    clustered key range touches the intersecting files, not the
    *    dataset);
    *  - inserts stage as NEW files — they rewrite nothing;
    *  - unmatched target files carry over path-identical with their
    *    recorded bounds and sizes.
    *
    * The source must be key-unique (dedup upstream — [[upsert]]'s
    * `orderCol` pattern); multiple matches per target row would make the
    * merge non-deterministic, so it is rejected. Returns the new version
    * (or the current one when the merge is a complete no-op).
    */
  def merge(spark: SparkSession, path: String, source: DataFrame,
            keys: Seq[String], spec: MergeSpec): Long = {
    import org.apache.spark.sql.functions._
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    require(source.groupBy(keys.map(col): _*).count().filter(col("count") > 1).isEmpty,
      s"merge source must be unique on ${keys.mkString(",")}")
    val snap = snapshotOf(spark, path, v)
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val statsCols = snap.props.get("stats.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val targetCols = read(spark, path, v).columns.toSeq

    // files holding at least one matched key — the only rewrite set; the
    // probe scan is pruned by the manifest's recorded bounds
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    // project the file identity BEFORE the join (from `_metadata`, which
    // stays defined under the DV anti-join; deleted rows can't drag
    // their file into the rewrite set)
    val hit = liveWithFileId(spark, path, v, snap)
      .select((keys.map(col) :+ col("__gf")): _*).alias("t")
      .join(source.select(keys.map(col): _*).alias("s"), keyCond, "left_semi")
      .select("__gf").distinct()
      .collect().map(_.getString(0)).toSet
    val touched = snap.files.filter(hit.contains)

    val rewritten: Option[DataFrame] = if (touched.isEmpty) None else {
      val t = readFilesWithDv(spark, path, snap, touched).alias("t")
      val joined = t.join(source.alias("s"), keyCond, "left")
      val matched = col(s"s.${keys.head}").isNotNull
      val updCond = matched &&
        spec.matchedUpdateCondition.map(expr).getOrElse(lit(spec.matchedUpdate.nonEmpty))
      val delCond = matched &&
        spec.matchedDeleteCondition.map(expr).getOrElse(lit(false))
      val updated = joined
        .filter(updCond || !delCond) // delete loses to update, else drops
        .select(targetCols.map { c =>
          spec.matchedUpdate.get(c) match {
            case Some(e) => when(updCond, expr(e)).otherwise(col(s"t.$c")).as(c)
            case None => col(s"t.$c").as(c)
          }
        }: _*)
      Some(updated)
    }

    val inserts: Option[DataFrame] = if (!spec.notMatchedInsert) None else {
      val all = read(spark, path, v)
      val novel = source.alias("s")
        .join(all.select(keys.map(col): _*).alias("t"), keyCond, "left_anti")
      val filtered = spec.notMatchedInsertCondition.map(c => novel.filter(expr(c)))
        .getOrElse(novel)
      if (filtered.isEmpty) None
      else Some(filtered.select(
        targetCols.filter(filtered.columns.contains).map(col): _*))
    }

    val toStage = (rewritten, inserts) match {
      case (Some(r), Some(i)) => Some(r.unionByName(i, allowMissingColumns = true))
      case (r, i) => r.orElse(i)
    }
    if (toStage.isEmpty) return v
    val staged = stageSized(toStage.get, path, partCols)
    val facts =
      if (statsCols.isEmpty) FileFacts()
      else computeFacts(spark, path, staged.map(_._1), statsCols)
    commit(spark, path, snap.props,
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls,
      stagedValidate = staged.map(_._1)) { prev =>
      manifestFiles(spark, path, prev).filterNot(touched.toSet) ++ staged.map(_._1)
    }
  }

  /** Delete rows matching `condition` as a manifest commit — Delta's
    * copy-on-write DELETE: only files that actually CONTAIN matching rows
    * are rewritten (found by running the stats-pruned [[table]] scan over
    * the predicate, so at 100 TB a selective delete on a clustered column
    * reads and rewrites the intersecting files, not the dataset); every
    * other manifest entry carries over path-identical, keeping its
    * recorded bounds and size. Partitioned layouts restage into their
    * `__p_c=v` dirs; stats-carrying datasets get bounds recomputed for
    * the rewritten files. Returns the new version, or the current one
    * when nothing matches (no empty commit).
    */
  def delete(spark: SparkSession, path: String,
             condition: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    // files with at least one matching row — the scan itself is pruned by
    // the manifest's bounds, and returns one row per FILE, not per match.
    // Row identity comes from the `_metadata` column (not
    // input_file_name(), which is undefined over the DV anti-join), and
    // existing deletion vectors are applied so a fully-deleted row can't
    // drag its file into the rewrite set.
    val hit = liveWithFileId(spark, path, v, snap).filter(condition)
      .select("__gf").distinct()
      .collect().map(_.getString(0)).toSet
    val touched = snap.files.filter(hit.contains)
    if (touched.isEmpty) return v
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val statsCols = snap.props.get("stats.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val kept = readFilesWithDv(spark, path, snap, touched)
      .filter(!condition)
    val staged = stageSized(kept, path, partCols)
    val facts =
      if (statsCols.isEmpty) FileFacts()
      else computeFacts(spark, path, staged.map(_._1), statsCols)
    commit(spark, path, snap.props,
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls) { prev =>
      // rebase-safe: a concurrent append's files aren't in `touched` and
      // survive; concurrent writers of the SAME files last-writer-win at
      // the version level (the documented upsert semantics)
      manifestFiles(spark, path, prev).filterNot(touched.toSet) ++ staged.map(_._1)
    }
  }

  /** Row-level CHANGES between two committed versions — the CDC feed of
    * the manifest layer (Delta's Change Data Feed idea, computed rather
    * than stored). Because data files are immutable, every row-level
    * difference between `fromV` and `toV` lives in the files ADDED or
    * REMOVED between the two manifests; files common to both versions
    * are skipped wholesale, so the diff costs the churned files, not the
    * dataset. The comparison itself is the reference's fingerprint CDC
    * ([[Diff.tableDiffRows]], SURVEY §2.7) keyed by `keys` over `fields`:
    * output rows carry `diff` = 'n' (key added), 'c' (key present in both
    * but fields changed; the NEW row is emitted), or 'd' (key removed).
    */
  def changes(spark: SparkSession, path: String, fromV: Long, toV: Long,
              keys: Seq[String], fields: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV > 0 && toV > 0, "versions must be committed (≥ 1)")
    val snapFrom = snapshotOf(spark, path, fromV)
    val snapTo = snapshotOf(spark, path, toV)
    val (added, removed) = churnedFiles(spark, path, fromV, toV)
    // LIMIT 0 keeps union schemas aligned when one side had no churn;
    // each side reads under ITS version's deletion vectors
    def side(files: Seq[String], snap: Snapshot, v: Long): DataFrame =
      if (files.isEmpty) read(spark, path, v).limit(0)
      else readFilesWithDv(spark, path, snap, files)
    val newRows = side(added, snapTo, toV)
    val oldRows = side(removed, snapFrom, fromV)
    val addedOrChanged = Diff.tableDiffRows(newRows, oldRows, keys, fields)
    val deleted = oldRows
      .join(newRows.select(keys.map(col): _*), keys, "left_anti")
      .withColumn("diff", lit("d"))
    // merge-on-read deletes change rows WITHOUT changing the file list:
    // the delta of deletion-vector pairs on files common to both
    // versions is deletions (pairs added) and — after a restore —
    // resurrections (pairs removed)
    val (dvDeleted, dvRestored) = dvDeltaRows(spark, path, snapFrom, snapTo)
    val base = addedOrChanged.unionByName(deleted)
    val withDel = dvDeleted.map(d => base.unionByName(
      d.withColumn("diff", lit("d")))).getOrElse(base)
    dvRestored.map(r => withDel.unionByName(
      r.withColumn("diff", lit("n")))).getOrElse(withDel)
  }

  /** Rows whose liveness changed between two versions through DELETION
    * VECTORS alone (files present in both manifests, vectors differing):
    * (_1 = newly deleted rows, _2 = resurrected rows — possible after a
    * [[restore]]). Cost ∝ the pair deltas plus a scan of only the
    * affected files.
    */
  private def dvDeltaRows(spark: SparkSession, path: String,
                          snapFrom: Snapshot, snapTo: Snapshot)
      : (Option[DataFrame], Option[DataFrame]) = {
    val fromSet = snapFrom.files.toSet
    val changed = snapTo.files.filter(f =>
      fromSet(f) && snapTo.dvs.get(f) != snapFrom.dvs.get(f))
    if (changed.isEmpty) return (None, None)
    val toPairs = dvPairs(spark, path, snapTo, changed)
    val fromPairs = dvPairs(spark, path, snapFrom, changed)
    def minus(a: Option[DataFrame], b: Option[DataFrame]): Option[DataFrame] =
      (a, b) match {
        case (None, _) => None
        case (Some(x), None) => Some(x)
        case (Some(x), Some(y)) =>
          Some(x.join(y, Seq("file", "row_index"), "left_anti"))
      }
    def rowsOf(delta: Option[DataFrame]): Option[DataFrame] = delta.map { d =>
      readWithRowId(spark, path, changed)
        .join(d.withColumnRenamed("file", "__gf")
          .withColumnRenamed("row_index", "__gri"),
          Seq("__gf", "__gri"), "left_semi")
        .drop("__gf", "__gri")
    }
    (rowsOf(minus(toPairs, fromPairs)), rowsOf(minus(fromPairs, toPairs)))
  }

  /** Relative data paths ADDED and REMOVED between two committed versions.
    * Because data files are immutable, this pair is the complete row-level
    * delta between the versions — the primitive under [[changes]] and
    * [[maintainAggregate]].
    */
  private[ops] def churnedFiles(spark: SparkSession, path: String,
                                fromV: Long, toV: Long): (Seq[String], Seq[String]) = {
    val fromFiles = manifestFiles(spark, path, fromV)
    val toFiles = manifestFiles(spark, path, toV)
    (toFiles.filterNot(fromFiles.toSet), fromFiles.filterNot(toFiles.toSet))
  }

  /** Incrementally-maintained aggregate view (count + exact-decimal sums
    * per group) of a manifest dataset — the materialized-view refresh that
    * makes a 100 TB dashboard query O(churn), not O(dataset).
    *
    * The state at `aggPath` is itself a manifest dataset whose commit
    * props record the last folded source version. Each call folds ONLY
    * the files added/removed since then ([[churnedFiles]] — immutable data
    * files make the churn set exact): added rows aggregate with sign +1,
    * removed rows with −1, and the signed delta merges into the state by
    * one more aggregation. Counts and decimal sums are additive and exact,
    * so removal cancels bit-perfectly and any fold order yields the state
    * a full recompute would — groups whose count reaches 0 drop out.
    *
    * Cost model at scale: an append folds just the appended files; an
    * upsert/delete folds the rewritten files twice (old −, new +); a
    * COMPACTION churns every file, so the fold degenerates to a full
    * re-aggregation — maintain before compacting, or accept a refresh that
    * costs what the compaction itself already paid to read. The state
    * rewrite is bounded by the group cardinality, never the source.
    *
    * Returns the state's committed version (unchanged when the source
    * hasn't moved or moved without churn).
    */
  def maintainAggregate(spark: SparkSession, srcPath: String, aggPath: String,
                        groupCols: Seq[String], sumCols: Seq[String],
                        sumType: String = "decimal(18,4)"): Long = {
    import org.apache.spark.sql.functions._
    require(groupCols.nonEmpty, "need at least one group column")
    val stateType = "decimal(38,6)"
    val srcV = latestVersion(spark, srcPath)
    require(srcV > 0, s"source at $srcPath has no committed version")
    val lastV = lastProp(spark, aggPath, "agg.src.version").map(_.toLong)
      .getOrElse(0L)
    if (lastV == srcV) return latestVersion(spark, aggPath)
    val props = Map("agg.src.version" -> srcV.toString)
    def aggOf(df: DataFrame, sign: Int): DataFrame = {
      val aggs = (count(lit(1)) * sign).as("n_rows") +:
        sumCols.map(c =>
          (sum(col(c).cast(sumType)) * sign).cast(stateType).as(s"sum_$c"))
      df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    if (lastV == 0L) {
      overwrite(aggOf(read(spark, srcPath), 1), aggPath, props)
    } else {
      val snapFrom = snapshotOf(spark, srcPath, lastV)
      val snapTo = snapshotOf(spark, srcPath, srcV)
      val (added, removed) = churnedFiles(spark, srcPath, lastV, srcV)
      // merge-on-read deletes churn ROWS without churning files: fold
      // the deletion-vector delta too (deleted −1, restored +1)
      val (dvDeleted, dvRestored) = dvDeltaRows(spark, srcPath, snapFrom, snapTo)
      if (added.isEmpty && removed.isEmpty
          && dvDeleted.isEmpty && dvRestored.isEmpty)
        return latestVersion(spark, aggPath)
      def side(files: Seq[String], snap: Snapshot, sign: Int): Option[DataFrame] =
        if (files.isEmpty) None
        else Some(aggOf(readFilesWithDv(spark, srcPath, snap, files), sign))
      val delta = (side(added, snapTo, 1).toSeq ++ side(removed, snapFrom, -1)
        ++ dvDeleted.map(aggOf(_, -1)) ++ dvRestored.map(aggOf(_, 1)))
        .reduce(_ unionByName _)
      val mergeAggs = sum(col("n_rows")).cast("long").as("n_rows") +:
        sumCols.map(c => sum(col(s"sum_$c")).cast(stateType).as(s"sum_$c"))
      val merged = read(spark, aggPath).unionByName(delta)
        .groupBy(groupCols.map(col): _*)
        .agg(mergeAggs.head, mergeAggs.tail: _*)
        .filter(col("n_rows") > 0)
      overwrite(merged, aggPath, props)
    }
  }

  /** Path segments (`__p_c=v`, writer-escaped) for each touched partition. */
  private def touchedSpecs(latest: DataFrame,
                           partitionCols: Seq[String]): Seq[Seq[String]] = {
    import org.apache.spark.sql.functions._
    latest.select(partitionCols.map(c => col(c).cast("string")): _*)
      .distinct().collect().toSeq.map { row =>
        partitionCols.zipWithIndex.map { case (c, i) =>
          require(!row.isNullAt(i),
            s"partition column $c has a null value — null partitions unsupported")
          s"${partDirCol(c)}=${escapePathSegment(row.getString(i))}"
        }
      }
  }

  /** Does relative path `f` (e.g. `data/<uuid>/__p_c=v/part-….parquet`)
    * sit in the partition described by `spec` (every segment present)?
    */
  private def fileInSpec(f: String, spec: Seq[String]): Boolean = {
    val segs = f.split('/').toSet
    spec.forall(segs.contains)
  }

  /** The parquet writer's own partition-directory escaping — using Spark's
    * util guarantees the spec strings match the directories the writer
    * actually produced, byte for byte.
    */
  private def escapePathSegment(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(v)

  /** Rewrite the current version into ~`targetFileBytes`-sized files and
    * publish the result as the NEXT version — compaction as just another
    * committed version: readers of the small-file version are undisturbed,
    * time travel still reaches it, and vacuum reclaims the small files
    * once the version ages out of retention. The many-small-files problem
    * is the manifest layout's main tax at stream-append rates; this is
    * the periodic remedy.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, root) = fsFor(spark, path)
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val files = manifestFiles(spark, path, v)
    val totalBytes = files.map(f =>
      fs.getFileStatus(new Path(root, f)).getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    // a stats-carrying dataset compacts RANGE-CLUSTERED on its stats
    // columns — plain round-robin repartition would smear every file
    // across the whole value range and nullify file skipping
    val src = read(spark, path, v)
    // carry the source version's props forward (e.g. streaming.batchId) so
    // a compaction never erases the idempotence watermark
    val props = committedProps(spark, path, v) + ("compacted.from" -> v.toString)
    val compacted = props.get("stats.cols") match {
      case Some(cs) if cs.nonEmpty =>
        import org.apache.spark.sql.functions.col
        src.repartitionByRange(nFiles, cs.split(',').map(col).toSeq: _*)
      case _ => src.repartition(nFiles)
    }
    // a partitioned dataset restages INTO its `__p_c=v` layout — the
    // part.cols prop promises those dirs to partition pruning, so a flat
    // rewrite would silently prune the compacted files out of every
    // partition-equality query
    val partCols = props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val staged = stageSized(compacted, path, partCols)
    // a stats-carrying dataset keeps its file-skipping power through the
    // rewrite: recompute bounds for the compacted files
    val facts = props.get("stats.cols") match {
      case Some(cs) if cs.nonEmpty =>
        computeFacts(spark, path, staged.map(_._1), cs.split(',').toSeq)
      case _ => FileFacts()
    }
    // a bloom-indexed dataset keeps its point-lookup power too: rebuild
    // sidecars for the rewritten files (cost bounded by the rewrite batch,
    // which the compaction already paid to write)
    val bloomCols = props.get("bloom.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (bloomCols.nonEmpty)
      writeBlooms(spark, path, staged.map(_._1), bloomCols, fpp = 0.01)
    commit(spark, path, props, prev =>
      (if (prev == v) Map.empty[String, Map[String, (Double, Double)]]
       else snapshotOf(spark, path, prev).stats) ++ facts.nums,
      newSizes = staged.toMap,
      newBlooms = staged.map(_._1 -> bloomCols).toMap.filter(_ => bloomCols.nonEmpty),
      newStrs = facts.strs, newNulls = facts.nulls) { prev =>
      if (prev == v) staged.map(_._1)
      else {
        // an append landed while we compacted: keep its files alongside
        // the compacted rewrite of OUR baseline — no lost update
        val baseline = files.toSet
        staged.map(_._1) ++ manifestFiles(spark, path, prev).filterNot(baseline)
      }
    }
  }

  /** Backfill per-file facts (min/max bounds, string bounds, null
    * counts) for `cols` — ANALYZE TABLE for the manifest layer: a
    * dataset created by plain appends (or before stats existed) gains
    * file skipping and metadata-only aggregates retroactively, in ONE
    * commit, without rewriting a byte of data. Costs one scan of only
    * the files MISSING facts (the null-count fact is the completeness
    * marker: [[computeFacts]] always records one per column), so
    * re-running after an append analyzes just the new files. Returns the
    * current version unchanged when nothing is missing.
    */
  def analyze(spark: SparkSession, path: String, cols: Seq[String]): Long = {
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    require(cols.nonEmpty, "analyze needs at least one column")
    val snap = snapshotOf(spark, path, v)
    val missing = snap.files.filter(f =>
      cols.exists(c => !snap.nulls.get(f).exists(_.contains(c))))
    if (missing.isEmpty) return v
    val facts = computeFacts(spark, path, missing, cols)
    commit(spark, path, snap.props + ("stats.cols" -> cols.mkString(",")),
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newStrs = facts.strs, newNulls = facts.nulls)(
      prev => manifestFiles(spark, path, prev))
  }

  // ── CHECK constraints: writer-enforced data-quality invariants ───────────

  /** Add a named CHECK constraint (Delta's `ALTER TABLE ADD CONSTRAINT`)
    * as one metadata-only commit. Existing data is validated first with
    * one scan — a dataset that already violates the predicate rejects it.
    * From then on every append/overwrite/upsert/merge validates its
    * staged rows (ONE extra aggregation over only the staged files, all
    * constraints together) and refuses to commit on violation: the staged
    * files stay invisible and age into vacuum, so a bad batch can never
    * publish — the transactional form of the quality gate ([[Checks]]).
    * SQL CHECK semantics: a row violates only when the predicate is FALSE
    * (NULL passes). Constraints are dataset state: they carry through
    * every later commit (including compactions and restores) until
    * [[dropConstraint]].
    */
  def addConstraint(spark: SparkSession, path: String, name: String,
                    predicateSql: String): Long = {
    import org.apache.spark.sql.functions._
    require(name.nonEmpty && !name.exists(c => c == '=' || c.isWhitespace),
      s"constraint name '$name' must be non-empty without '=' or whitespace")
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    def requireClean(version: Long): Unit = {
      val bad = read(spark, path, version)
        .filter(not(coalesce(expr(predicateSql), lit(true)))).count()
      require(bad == 0,
        s"cannot add constraint '$name': $bad existing row(s) violate ($predicateSql)")
    }
    requireClean(v)
    commit(spark, path, snap.props + (s"constraint.$name" -> predicateSql),
      prev => snapshotOf(spark, path, prev).stats) { prev =>
      // OCC rebase closes the validate/claim TOCTOU from THIS side: a
      // commit landing after the validation above (e.g. an append whose
      // own claim-loop validation ran before this constraint existed)
      // must be re-validated before the constraint claims its version —
      // otherwise the head would declare a CHECK its data violates.
      if (prev != v) requireClean(prev)
      manifestFiles(spark, path, prev)
    }
  }

  /** Remove a CHECK constraint (metadata-only commit; the empty value is
    * the drop tombstone commit() honors against its auto-carry).
    */
  def dropConstraint(spark: SparkSession, path: String, name: String): Long = {
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    commit(spark, path, snap.props + (s"constraint.$name" -> ""),
      prev => snapshotOf(spark, path, prev).stats)(
      prev => manifestFiles(spark, path, prev))
  }

  /** The dataset's CHECK constraints (name → predicate SQL) at a version. */
  def constraints(spark: SparkSession, path: String,
                  version: Long = -1L): Map[String, String] =
    constraintsOf(committedProps(spark, path, version))

  private def constraintsOf(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith("constraint.") && v.nonEmpty =>
        k.stripPrefix("constraint.") -> v
    }

  /** Count violations of the given CHECK constraints over `src` in one
    * aggregation and throw on the first non-zero — shared by staged-file
    * validation (inside [[commit]]'s claim loop) and [[restore]]'s
    * DV-aware re-validation.
    */
  private def requireConstraintsOn(src: DataFrame, cs: Map[String, String],
                                   what: String): Unit = {
    import org.apache.spark.sql.functions._
    if (cs.isEmpty) return
    val names = cs.keys.toSeq.sorted
    val aggs = names.map(n =>
      sum(when(not(coalesce(expr(cs(n)), lit(true))), 1L).otherwise(0L)).as(n))
    val row = src.agg(aggs.head, aggs.tail: _*).collect()(0)
    names.zipWithIndex.foreach { case (n, i) =>
      val bad = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (bad != 0) throw new IllegalArgumentException(
        s"CHECK constraint '$n' (${cs(n)}) violated by $bad $what row(s) — " +
          "commit refused; staged files remain uncommitted")
    }
  }

  /** Validate just-staged (not yet committed) files against the given
    * CHECK constraints: one aggregation over ONLY the staged files counts
    * violations of every constraint together. Throws before any version
    * is claimed — the staged files stay invisible and vacuumable. Reading
    * the staged parquet back (instead of re-evaluating the input frame)
    * means the upstream plan is never recomputed and the validated bytes
    * are exactly the bytes that would publish. Called from [[commit]]'s
    * claim loop with the constraint set carried into THIS attempt.
    */
  private def validateStaged(spark: SparkSession, path: String,
                             stagedFiles: Seq[String],
                             cs: Map[String, String],
                             mergeSchema: Boolean = false): Unit = {
    if (cs.isEmpty || stagedFiles.isEmpty) return
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    requireConstraintsOn(
      reader.parquet(stagedFiles.map(f => s"$path/$f"): _*), cs, "staged")
  }

  // ── merge-on-read deletes: per-file deletion-vector sidecars ─────────────

  private def qualifiedPrefix(spark: SparkSession, path: String): String = {
    val (fs, root) = fsFor(spark, path)
    fs.makeQualified(root).toString + "/"
  }

  /** Union of `(file, row_index)` pairs from the DV sidecars of whichever
    * of `files` carry one; None when none do. Each sidecar is a small
    * parquet dir, so this is a metadata-bounded read — the pairs scale
    * with DELETED rows, never the dataset.
    */
  private def dvPairs(spark: SparkSession, path: String, snap: Snapshot,
                      files: Seq[String]): Option[DataFrame] = {
    val dirs = files.flatMap(f => snap.dvs.get(f).map(_._1)).distinct
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(d => s"$path/$d"): _*)
      .select("file", "row_index"))
  }

  /** Scan of `files` with each row tagged `__gf` (manifest-relative data
    * file) and `__gri` (row index within it) from the parquet reader's
    * `_metadata` column — the row identity DV semantics key on.
    */
  private def readWithRowId(spark: SparkSession, path: String,
                            files: Seq[String],
                            mergeSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val prefix = qualifiedPrefix(spark, path)
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    reader.parquet(files.map(f => s"$path/$f"): _*)
      .withColumn("__gf",
        expr(s"substring(_metadata.file_path, ${prefix.length + 1})"))
      .withColumn("__gri", col("_metadata.row_index"))
  }

  /** Rows of `files` under snapshot `snap` with MERGE-ON-READ deletes
    * applied: when any of the files carries a deletion vector, the scan
    * anti-joins its DV pairs on (file, row_index) — Delta's deletion-
    * vector read path. Files without DVs cost nothing extra (the common
    * case short-circuits to a plain scan), and Catalyst still pushes
    * data-column filters into the left side of the anti-join, so file
    * skipping and footer pushdown survive.
    */
  private[ops] def readFilesWithDv(spark: SparkSession, path: String,
                                   snap: Snapshot, files: Seq[String],
                                   mergeSchema: Boolean = false): DataFrame = {
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    if (!files.exists(snap.dvs.contains))
      return reader.parquet(files.map(f => s"$path/$f"): _*)
    val dv = dvPairs(spark, path, snap, files).get
      .withColumnRenamed("file", "__gf").withColumnRenamed("row_index", "__gri")
    val keep = readWithRowId(spark, path, files, mergeSchema)
      .join(dv, Seq("__gf", "__gri"), "left_anti")
    keep.drop("__gf", "__gri")
  }

  /** The declarative (manifest-pruned) scan of version `v` with each row
    * tagged `__gf` (its manifest-relative data file) and existing
    * deletion vectors applied — the probe shape [[merge]] and [[delete]]
    * use to find their rewrite sets.
    */
  private def liveWithFileId(spark: SparkSession, path: String, v: Long,
                             snap: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions._
    val prefix = qualifiedPrefix(spark, path)
    val base = org.apache.spark.sql.graft.ManifestFileIndex
      .dataFrame(spark, tableInfo(spark, path, v))
      .withColumn("__gf",
        expr(s"substring(_metadata.file_path, ${prefix.length + 1})"))
      .withColumn("__gri", col("_metadata.row_index"))
    val live =
      if (snap.dvs.isEmpty) base
      else base.join(
        dvPairs(spark, path, snap, snap.files).get
          .withColumnRenamed("file", "__gf").withColumnRenamed("row_index", "__gri"),
        Seq("__gf", "__gri"), "left_anti")
    live.drop("__gri")
  }

  /** Delete rows matching `condition` WITHOUT rewriting any data file —
    * Delta's merge-on-read DELETE via deletion vectors: matched rows'
    * (file, row index) pairs are written as per-file sidecars (one
    * distributed partitioned write, cost ∝ matched rows), and the commit
    * just points each touched file at its vector. At 100 TB a delete
    * touching half the files costs the matched row IDs, not a rewrite of
    * half the table; the price is a small anti-join at read time, paid
    * until [[purgeDeletes]] or a compaction folds the vectors in. Returns
    * the current version when nothing matches.
    *
    * Reads through [[read]]/[[table]]/[[readRange]]/[[readPartitions]]
    * and every rewrite path (upsert, merge, COW delete, compaction)
    * apply vectors transparently. The `graft-manifest` SQL relation and
    * streaming source cannot — they fail loudly on a vectored dataset
    * rather than resurrect deleted rows.
    */
  def deleteMergeOnRead(spark: SparkSession, path: String,
                        condition: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val hits = liveRowIds(spark, path, snap).filter(condition)
      .select(col("__gf").as("file"), col("__gri").as("row_index"))
    val newDvs = stageDvSidecars(spark, path, snap, hits)
    if (newDvs.isEmpty) return v
    commit(spark, path, snap.props + ("dv.delete.from" -> v.toString),
      prev => snapshotOf(spark, path, prev).stats,
      newDvs = newDvs)(prev => manifestFiles(spark, path, prev))
  }

  /** Scan of the snapshot's files with `__gf`/`__gri` row identities and
    * EXISTING deletion vectors applied — an already-deleted row can never
    * re-match a delete or upsert, so new pairs stay disjoint from old ones
    * and cumulative counts stay exact.
    */
  private def liveRowIds(spark: SparkSession, path: String,
                         snap: Snapshot): DataFrame = {
    val live = readWithRowId(spark, path, snap.files,
      mergeSchema = snap.props.get("merge.schema").contains("true"))
    dvPairs(spark, path, snap, snap.files) match {
      case Some(dv) => live.join(
        dv.withColumnRenamed("file", "__gf").withColumnRenamed("row_index", "__gri"),
        Seq("__gf", "__gri"), "left_anti")
      case None => live
    }
  }

  /** Write `hits` (live `(file, row_index)` pairs) as per-file deletion-
    * vector sidecars, folding in the old pairs of each touched file (a
    * file's new sidecar SUPERSEDES its old one; untouched files keep
    * theirs via commit()'s carry). One distributed partitioned write, cost
    * ∝ the cumulative deleted rows of touched files. Returns the per-file
    * dv state to commit — empty when nothing matched.
    */
  private def stageDvSidecars(spark: SparkSession, path: String,
                              snap: Snapshot,
                              hits: DataFrame): Map[String, (String, Long)] = {
    import org.apache.spark.sql.functions._
    val (_, root) = fsFor(spark, path)
    // per-file counts: bounded by the number of touched FILES
    val freshCounts = hits.groupBy("file").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (freshCounts.isEmpty) return Map.empty
    val touched = snap.files.filter(freshCounts.contains)
    val oldPairs = dvPairs(spark, path, snap, touched)
    val allPairs = oldPairs.map(p => hits.unionByName(p)).getOrElse(hits)
    val setDir = "dv/" + java.util.UUID.randomUUID().toString
    allPairs.withColumn("__pf", col("file"))
      .repartition(col("__pf"))
      .write.partitionBy("__pf").parquet(new Path(root, setDir).toString)
    touched.map { f =>
      val cumulative = freshCounts(f) + snap.dvs.get(f).map(_._2).getOrElse(0L)
      f -> (s"$setDir/__pf=${escapePathSegment(f)}", cumulative)
    }.toMap
  }

  /** Keyed upsert WITHOUT rewriting any data file — the merge-on-read form
    * of [[upsert]]: rows whose keys match the batch are vectored out
    * (per-file deletion-vector sidecars, exactly [[deleteMergeOnRead]]'s
    * mechanism) and the batch stages as NEW files in the same commit. At
    * 100 TB an upsert touching keys scattered across every file costs the
    * matched row IDs plus the batch — never a rewrite of the touched
    * files, which is what makes high-frequency CDC apply affordable; the
    * price is the read-time anti-join until a compaction or
    * [[purgeDeletes]] folds the vectors in. Within the batch, last writer
    * wins by `orderCol` (the [[upsert]] contract). Stats-carrying datasets
    * get bounds for the new files; partitioned layouts stage into their
    * `__p_c=v` dirs.
    */
  def upsertMergeOnRead(batch: DataFrame, path: String, keys: Seq[String],
                        orderCol: String,
                        extraProps: Map[String, String] = Map.empty): Long = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val v = latestVersion(spark, path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc(orderCol))
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    if (v == 0) { // first publish: nothing to vector out, just stage
      val staged = stageSized(latest, path)
      return commit(spark, path, extraProps, newSizes = staged.toMap,
        stagedValidate = staged.map(_._1))(_ => staged.map(_._1))
    }
    val snap = snapshotOf(spark, path, v)
    // the batch stages as plain data files the committed reader must
    // resolve, so its schema must MATCH the committed one (the orderCol
    // is therefore a real data column, like upsert's) — a mismatch would
    // silently drop or smear columns depending on footer resolution order
    val committed = read(spark, path, v).schema
    require(latest.schema.fieldNames.sorted.toSeq == committed.fieldNames.sorted.toSeq,
      s"upsertMergeOnRead batch columns ${latest.schema.fieldNames.sorted.mkString(",")} " +
        s"must equal the committed schema ${committed.fieldNames.sorted.mkString(",")}")
    committed.fields.foreach { pf =>
      val nf = latest.schema(pf.name)
      require(nf.dataType == pf.dataType,
        s"upsertMergeOnRead would change column '${pf.name}' from " +
          s"${pf.dataType.sql} to ${nf.dataType.sql} — cast the batch")
    }
    // replaced rows' identities: a semi-join of the live scan against the
    // batch keys (the batch is the small side at CDC rates — broadcast)
    val hits = liveRowIds(spark, path, snap)
      .join(broadcast(latest.select(keys.map(col): _*)), keys, "left_semi")
      .select(col("__gf").as("file"), col("__gri").as("row_index"))
    val newDvs = stageDvSidecars(spark, path, snap, hits)
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val statsCols = snap.props.get("stats.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val staged = stageSized(latest, path, partCols)
    val facts =
      if (statsCols.isEmpty) FileFacts()
      else computeFacts(spark, path, staged.map(_._1), statsCols)
    commit(spark, path, snap.props + ("dv.upsert.from" -> v.toString) ++ extraProps,
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls,
      newDvs = newDvs,
      stagedValidate = staged.map(_._1)) { prev =>
      manifestFiles(spark, path, prev) ++ staged.map(_._1)
    }
  }

  /** Fold every deletion vector into its data file — file-scoped
    * copy-on-write limited to EXACTLY the vectored files: each is
    * rewritten without its deleted rows (fresh facts recomputed when the
    * dataset records stats), every clean file carries over
    * path-identical, and the new version has no vectors — restoring SQL
    * relation and streaming-source eligibility. No-op without vectors.
    */
  def purgeDeletes(spark: SparkSession, path: String): Long = {
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    val touched = snap.files.filter(snap.dvs.contains)
    if (touched.isEmpty) return v
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val kept = readFilesWithDv(spark, path, snap, touched)
    val staged = stageSized(kept, path, partCols)
    val facts = snap.props.get("stats.cols") match {
      case Some(cs) if cs.nonEmpty =>
        computeFacts(spark, path, staged.map(_._1), cs.split(',').toSeq)
      case _ => FileFacts()
    }
    val touchedSet = touched.toSet
    commit(spark, path, snap.props + ("dv.purged.from" -> v.toString),
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newSizes = staged.toMap,
      newStrs = facts.strs, newNulls = facts.nulls) { prev =>
      manifestFiles(spark, path, prev).filterNot(touchedSet) ++ staged.map(_._1)
    }
  }

  /** Bin-packing compaction (Delta OPTIMIZE's file-selection semantics):
    * coalesce only files SMALLER than `minFileBytes` into
    * ~`targetFileBytes` outputs, leaving every right-sized file untouched
    * — path-identical manifest entries keep their recorded bounds, null
    * counts, row counts, and bloom sidecars. This, not [[compact]]'s full
    * rewrite, is the steady-state maintenance op at 100 TB: streaming
    * appends leave a small-file tail, and picking up ONLY that tail costs
    * the tail, never the table. Partitioned layouts restage through the
    * partitioned writer, so packed rows land back in their `__p_c=v`
    * dirs (files of different partitions merge only at the task level,
    * never in one output file). Returns the current version unchanged
    * when fewer than two small files exist — nothing worth packing.
    */
  def compactSmallFiles(spark: SparkSession, path: String,
                        minFileBytes: Long = 32L * 1024 * 1024,
                        targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, root) = fsFor(spark, path)
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val snap = snapshotOf(spark, path, v)
    def sizeOf(f: String): Long =
      snap.sizes.getOrElse(f, fs.getFileStatus(new Path(root, f)).getLen)
    val small = snap.files.filter(f => sizeOf(f) < minFileBytes)
    if (small.size < 2) return v
    val smallBytes = small.map(sizeOf).sum
    val nFiles = math.max(1, math.ceil(smallBytes.toDouble / targetFileBytes).toInt)
    val src = readFilesWithDv(spark, path, snap, small,
      mergeSchema = snap.props.get("merge.schema").contains("true"))
    // keep the dataset's clustering discipline for the packed outputs:
    // range on the stats columns when declared, plain coalesce otherwise
    val packed = snap.props.get("stats.cols") match {
      case Some(cs) if cs.nonEmpty =>
        import org.apache.spark.sql.functions.col
        src.repartitionByRange(nFiles, cs.split(',').map(col).toSeq: _*)
      case _ => src.repartition(nFiles)
    }
    val partCols = snap.props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val staged = stageSized(packed, path, partCols)
    val facts = snap.props.get("stats.cols") match {
      case Some(cs) if cs.nonEmpty =>
        computeFacts(spark, path, staged.map(_._1), cs.split(',').toSeq)
      case _ => FileFacts()
    }
    val bloomCols = snap.props.get("bloom.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (bloomCols.nonEmpty)
      writeBlooms(spark, path, staged.map(_._1), bloomCols, fpp = 0.01)
    val smallSet = small.toSet
    commit(spark, path, snap.props + ("packed.from" -> v.toString),
      prev => snapshotOf(spark, path, prev).stats ++ facts.nums,
      newSizes = staged.toMap,
      newBlooms = staged.map(_._1 -> bloomCols).toMap.filter(_ => bloomCols.nonEmpty),
      newStrs = facts.strs, newNulls = facts.nulls) { prev =>
      // rebase-safe: a concurrent append's files aren't in smallSet and
      // carry over untouched
      manifestFiles(spark, path, prev).filterNot(smallSet) ++ staged.map(_._1)
    }
  }

  /** [[compact]] with Z-ORDER clustering on `zCols`: the rewrite tiles
    * the value space ([[ZOrder.cluster]]) instead of sorting
    * lexicographically, and records per-file bounds for every z-column —
    * so [[readRange]] prunes files on ANY of them, not just the leading
    * sort column. The multi-dimensional complement of [[compact]]'s 1-D
    * range clustering.
    */
  def compactZOrder(spark: SparkSession, path: String, zCols: Seq[String],
                    targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, root) = fsFor(spark, path)
    val v = latestVersion(spark, path)
    require(v > 0, s"dataset at $path has no committed version")
    val files = manifestFiles(spark, path, v)
    val totalBytes = files.map(f =>
      fs.getFileStatus(new Path(root, f)).getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val props = committedProps(spark, path, v) +
      ("compacted.from" -> v.toString) + ("stats.cols" -> zCols.mkString(","))
    // same partition-layout preservation as compact()
    val zPartCols = props.get("part.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val staged = stageSized(
      ZOrder.cluster(read(spark, path, v), zCols, nFiles), path, zPartCols)
    val zFacts = computeFacts(spark, path, staged.map(_._1), zCols)
    // same bloom preservation as compact()
    val zBloomCols = props.get("bloom.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (zBloomCols.nonEmpty)
      writeBlooms(spark, path, staged.map(_._1), zBloomCols, fpp = 0.01)
    commit(spark, path, props, prev =>
      (if (prev == v) Map.empty[String, Map[String, (Double, Double)]]
       else snapshotOf(spark, path, prev).stats) ++ zFacts.nums,
      newSizes = staged.toMap,
      newBlooms = staged.map(_._1 -> zBloomCols).toMap.filter(_ => zBloomCols.nonEmpty),
      newStrs = zFacts.strs, newNulls = zFacts.nulls) { prev =>
      if (prev == v) staged.map(_._1)
      else staged.map(_._1) ++ manifestFiles(spark, path, prev).filterNot(files.toSet)
    }
  }

  /** Roll the dataset back to `version` by RE-COMMITTING its file list as
    * the next version (Delta RESTORE): nothing moves or rewrites — the old
    * version's entries, stats, sizes, and props become the new head, and
    * the rolled-back versions stay readable for audit until vacuumed.
    * Requires the restored version's files to still exist (i.e. within
    * vacuum retention).
    */
  def restore(spark: SparkSession, path: String, version: Long): Long = {
    val snap = snapshotOf(spark, path, version)
    // The restored head carries the CURRENT constraints (commit auto-carry,
    // overridden by any constraint props the restored version itself had).
    // Restoring to a version that predates addConstraint must not publish
    // data violating the carried CHECK — re-validate the DV-aware read of
    // the target version against the constraint set the new head will
    // declare. (The raw staged-file path inside commit() would resurrect
    // vectored-out rows; restore is the one commit where validation must
    // see deletion vectors, so it runs here instead.)
    def effCsAt(head: Long): Map[String, String] = constraintsOf(
      committedProps(spark, path, head) ++
        snap.props.filter(_._1.startsWith("constraint.")))
    var validated = effCsAt(-1L)
    if (validated.nonEmpty)
      requireConstraintsOn(read(spark, path, version), validated, "restored")
    commit(spark, path, snap.props + ("restored.from" -> version.toString),
      _ => snap.stats, newSizes = snap.sizes,
      newBlooms = snap.blooms,
      newStrs = snap.strs, newNulls = snap.nulls,
      newDvs = snap.dvs, carryDvs = false,
      newNdvs = snap.ndvs, newKlls = snap.klls) { prev =>
      // OCC rebase: a constraint added between validation and the claim
      // must re-check the restored data (same TOCTOU close as addConstraint)
      val pending = effCsAt(prev).filterNot { case (k, p) =>
        validated.get(k).contains(p) }
      if (pending.nonEmpty) {
        requireConstraintsOn(read(spark, path, version), pending, "restored")
        validated ++= pending
      }
      snap.files
    }
  }

  /** The version that was current at `tsMillis` — the largest committed
    * version whose manifest file is not newer than the timestamp
    * (timestamp-based time travel; commit time = manifest mtime, the same
    * clock [[history]] reports). 0 when the dataset didn't exist yet.
    */
  def versionAsOf(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val (fs, root) = fsFor(spark, path)
    versionsOnDisk(fs, root).sorted(Ordering[Long].reverse)
      .find(v => loadVersion(fs, root, v).isDefined &&
        fs.getFileStatus(manifestPath(root, v)).getModificationTime <= tsMillis)
      .getOrElse(0L)
  }

  /** Commit history of a dataset, newest first — Delta's DESCRIBE HISTORY:
    * one row per committed version with its file count, total bytes, file
    * churn vs the previous version, commit timestamp (manifest file
    * mtime), and commit properties. Driver-side work is bounded by the
    * number of versions (each manifest is one small file), never by data.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (fs, root) = fsFor(spark, path)
    val committed = versionsOnDisk(fs, root).sorted
      .flatMap(v => loadVersion(fs, root, v).map(v -> _))
    val rows = committed.zipWithIndex.map { case ((v, snap), i) =>
      val prevFiles = if (i == 0) Set.empty[String]
        else committed(i - 1)._2.files.toSet
      val files = snap.files.toSet
      val bytes = snap.files.map(f => snap.sizes.getOrElse(f, 0L)).sum
      (v, snap.files.size.toLong, bytes,
        (files -- prevFiles).size.toLong, (prevFiles -- files).size.toLong,
        new java.sql.Timestamp(fs.getFileStatus(manifestPath(root, v)).getModificationTime),
        snap.props)
    }
    rows.toDF("version", "n_files", "total_bytes", "n_added_files",
        "n_removed_files", "committed_at", "props")
      .orderBy(org.apache.spark.sql.functions.desc("version"))
  }

  /** True when the dataset carries merge-on-read deletion vectors at the
    * given version (default: latest) — surfaces that cannot apply them
    * (the SQL relation, the streaming source) use this to fail loudly
    * instead of silently resurrecting deleted rows.
    */
  def hasDeletionVectors(spark: SparkSession, path: String,
                         version: Long = -1L): Boolean = {
    val v = if (version < 0) latestVersion(spark, path) else version
    v > 0 && snapshotOf(spark, path, v).dvs.nonEmpty
  }

  /** Total rows vectored out at a version (Σ per-file `#dv` counts) — a
    * manifest-only scalar; the maintenance trigger for [[purgeDeletes]].
    */
  def dvRowCount(spark: SparkSession, path: String,
                 version: Long = -1L): Long = {
    val v = if (version < 0) latestVersion(spark, path) else version
    if (v <= 0) 0L
    else snapshotOf(spark, path, v).dvs.values.map(_._2).sum
  }

  /** True when per-file deletion-vector state differs between two
    * versions (version 0 = no vectors) — a row-level change the
    * streaming source's file-set diff cannot see.
    */
  def dvStateDiffers(spark: SparkSession, path: String,
                     fromV: Long, toV: Long): Boolean = {
    def dvOf(v: Long): Map[String, (String, Long)] =
      if (v <= 0) Map.empty else snapshotOf(spark, path, v).dvs
    dvOf(fromV) != dvOf(toV)
  }

  /** Drop data files no retained manifest references, and manifests older
    * than `keepVersions` — the vacuum that bounds storage. Safety rails:
    *  - readers of any RETAINED version are unaffected (their files stay);
    *  - staged-but-uncommitted data dirs younger than `graceMs` are
    *    skipped, so an in-flight writer's staged files survive until it
    *    commits (default 1 h, Delta's tombstone-retention idea);
    *  - `keepVersions` < 1 is rejected — the latest version is never
    *    collectable.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1,
             graceMs: Long = 3600L * 1000): Unit = {
    require(keepVersions >= 1, "vacuum must retain at least the latest version")
    val (fs, root) = fsFor(spark, path)
    val latest = latestVersion(spark, path)
    if (latest == 0) return
    val keepFrom = math.max(1L, latest - keepVersions + 1)
    val retained = (keepFrom to latest)
      .flatMap(v => loadVersion(fs, root, v).map(_.files).getOrElse(Nil)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).foreach { d =>
      // a staged dir an in-flight writer just wrote is younger than the
      // grace window — leave it; it becomes live on commit or collectable
      // once stale
      if (d.isDirectory && d.getModificationTime <= cutoff) {
        val it = fs.listFiles(d.getPath, true)
        val prefix = fs.makeQualified(root).toString + "/"
        while (it.hasNext) {
          val f = it.next()
          val rel = fs.makeQualified(f.getPath).toString.stripPrefix(prefix)
          // a bloom/ndv sidecar lives and dies with its data file: it is
          // deletable exactly when `<file>.parquet` is not retained
          val sidecarKinds = Seq(".parquet.bloom.", ".parquet.ndv.", ".parquet.kll.")
          val dataRel = sidecarKinds.find(rel.contains) match {
            case Some(kind) => rel.substring(0, rel.indexOf(kind)) + ".parquet"
            case None => rel
          }
          val deletable = (f.getPath.getName.endsWith(".parquet") ||
            sidecarKinds.exists(f.getPath.getName.contains)) &&
            !retained.contains(dataRel)
          if (deletable) fs.delete(f.getPath, false)
        }
      }
    }
    // deletion-vector sets: a dv/<uuid> dir is collectable when no
    // RETAINED version references a sidecar under it (superseded by a
    // later delete, purged, or aged out with its versions) and it is
    // older than the grace window (an in-flight deleteMergeOnRead's
    // just-written set survives until its commit)
    val retainedSets = (keepFrom to latest)
      .flatMap(v => loadVersion(fs, root, v).map(_.dvs.values.map(_._1)).getOrElse(Nil))
      .map(_.split('/').take(2).mkString("/")).toSet
    val dvRoot = new Path(root, "dv")
    if (fs.exists(dvRoot)) fs.listStatus(dvRoot).foreach { d =>
      if (d.isDirectory && d.getModificationTime <= cutoff &&
          !retainedSets.contains("dv/" + d.getPath.getName))
        fs.delete(d.getPath, true): Unit
    }
    versionsOnDisk(fs, root).filter(_ < keepFrom).foreach { v =>
      fs.delete(manifestPath(root, v), false)
    }
    // orphaned publish temps: a writer that crashed between rendering
    // its manifest and the atomic link/rename leaves a
    // `._manifest.v<N>.tmp-<uuid>` dot-file nothing else reclaims
    // (invisible to readers — the `_manifest.v*` glob skips dot names).
    // A LIVE writer's temp exists for milliseconds, so the same grace
    // window that protects staged data protects it
    val tmps = try fs.globStatus(new Path(root, "._manifest.*.tmp-*"))
    catch { case _: java.io.FileNotFoundException => null }
    if (tmps != null) tmps.foreach { t =>
      if (t.getModificationTime <= cutoff) fs.delete(t.getPath, false): Unit
    }
  }
}
