package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{
  DataSourceStrategy, FileIndex, FileStatusWithMetadata, HadoopFsRelation,
  LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over a graft manifest snapshot — the Delta/Iceberg
  * architecture (cf. Delta's `TahoeFileIndex`): the table's file list,
  * sizes, per-file column bounds, and partition layout all come from the
  * committed manifest, so planning a scan costs ZERO filesystem listing,
  * and Catalyst's ordinary pushdown becomes manifest-level pruning.
  *
  * `listFiles` receives the query's pushed data filters (Spark's
  * `FileSourceStrategy` forwards them to every FileIndex) and drops:
  *  - files whose recorded min/max bounds cannot intersect the predicate
  *    (Iceberg file skipping, now DECLARATIVE — a plain `.filter` prunes,
  *    no bespoke readRange call needed);
  *  - files outside `__p_c=v` partition directories excluded by equality/
  *    IN predicates on partition columns (manifest-level partition
  *    pruning without directory inference).
  *
  * Pruning is strictly conservative: a file survives unless the predicate
  * PROVABLY cannot match it, and the row-level filter still runs on every
  * surviving file, so results are identical with or without stats.
  *
  * Lives under `org.apache.spark.sql` for the same reason Delta does:
  * `FileIndex`/`HadoopFsRelation` are `private[sql]` extension points.
  */
final class ManifestFileIndex(
    spark: classic.SparkSession,
    root: Path,
    entries: Seq[(String, FileStatus)],
    stats: Map[String, Map[String, (Double, Double)]],
    partCols: Seq[String],
    blooms: Map[String, Seq[String]] = Map.empty,
    val knownRowCount: Option[Long] = None,
    strs: Map[String, Map[String, graft.ops.Manifest.StrBound]] = Map.empty,
    nulls: Map[String, Map[String, Long]] = Map.empty,
    rowsPerFile: Map[String, Long] = Map.empty) extends FileIndex {

  import graft.ops.Manifest.{cpCompare, cpSuccessor}

  override def rootPaths: Seq[Path] = Seq(root)

  // partition values live IN the data files (the `__p_c=v` dirs hold a
  // throwaway duplicate — see Manifest.partDirCol), so to Spark this is a
  // non-partitioned relation; pruning happens here, not in the planner.
  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = entries.map(_._2.getLen).sum

  override def inputFiles: Array[String] =
    entries.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val translated = (partitionFilters ++ dataFilters)
      .flatMap(e => DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true))
    val kept = entries.filter { case (rel, _) =>
      translated.forall(f => mayMatch(rel, f))
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map { case (_, st) => FileStatusWithMetadata(st) }))
  }

  /** Every file of the snapshot, by manifest-relative path. */
  def relFiles: Seq[String] = entries.map(_._1)

  /** [min, max] of `c` in the stats encoding over a file subset, known
    * iff EVERY file records bounds for it (a file whose column is
    * all-null records none, which soundly disables the metadata answer —
    * min/max ignore nulls only when at least one value exists per file).
    */
  def knownBoundsOf(files: Seq[String], c: String): Option[(Double, Double)] = {
    if (files.isEmpty) return None
    val bs = files.map(rel => stats.get(rel).flatMap(_.get(c)))
    if (bs.exists(_.isEmpty)) None
    else Some((bs.map(_.get._1).min, bs.map(_.get._2).max))
  }

  def knownBounds(c: String): Option[(Double, Double)] =
    knownBoundsOf(relFiles, c)

  /** (min, max) of STRING column `c` over a file subset, known iff EVERY
    * file records bounds for it and every bound is EXACT (untruncated) —
    * a truncated bound is valid for pruning but is not the actual value,
    * so it cannot answer a metadata-only min/max.
    */
  def knownStrBoundsOf(files: Seq[String], c: String): Option[(String, String)] = {
    if (files.isEmpty) return None
    val bs = files.map(rel => strs.get(rel).flatMap(_.get(c)))
    if (bs.exists(b => b.isEmpty || !b.get.exact)) None
    else {
      val ord = new Ordering[String] {
        def compare(a: String, b: String): Int = graft.ops.Manifest.cpCompare(a, b)
      }
      Some((bs.map(_.get.lo).min(ord), bs.map(_.get.hi).max(ord)))
    }
  }

  def knownStrBounds(c: String): Option[(String, String)] =
    knownStrBoundsOf(relFiles, c)

  /** Exact row count of a file subset, known iff every file has a
    * recorded `#rows` fact.
    */
  def knownRowCountOf(files: Seq[String]): Option[Long] = {
    val per = files.map(rowsPerFile.get)
    if (per.exists(_.isEmpty)) None else Some(per.map(_.get).sum)
  }

  /** Count of NON-NULL values of `c` over a file subset — what
    * `count(col)` computes — known iff every file records both its row
    * count and its null count for the column.
    */
  def knownNonNullCountOf(files: Seq[String], c: String): Option[Long] = {
    val per = files.map { rel =>
      for { r <- rowsPerFile.get(rel); n <- nulls.get(rel).flatMap(_.get(c)) }
      yield r - n
    }
    if (per.exists(_.isEmpty)) None else Some(per.map(_.get).sum)
  }

  def knownNonNullCount(c: String): Option[Long] =
    knownNonNullCountOf(relFiles, c)

  /** The STRING rendering of partition column `c`'s value for one file,
    * parsed from its `__p_c=v` path segment; None when the file has no
    * such segment (mixed lineage) or the value is the hive null marker.
    */
  def partitionValueOf(rel: String, c: String): Option[String] = {
    val pfx = s"__p_$c="
    rel.split('/').find(_.startsWith(pfx))
      .map(seg => ExternalCatalogUtils.unescapePathName(seg.stripPrefix(pfx)))
      .filter(_ != ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
  }

  /** Files grouped by the string-rendered values of partition columns
    * `cs` — defined only when every column is a declared partition column
    * and EVERY file carries a parseable, non-null segment for each (so a
    * metadata-grouped answer can never silently drop rows).
    */
  def filesByPartition(cs: Seq[String]): Option[Map[Seq[String], Seq[String]]] = {
    if (cs.isEmpty || !cs.forall(partCols.contains)) return None
    val keyed = relFiles.map { rel =>
      val vs = cs.map(c => partitionValueOf(rel, c))
      if (vs.exists(_.isEmpty)) return None
      rel -> vs.map(_.get)
    }
    Some(keyed.groupBy(_._2).view.mapValues(_.map(_._1)).toMap)
  }

  /** Conservative three-valued pruning: false ONLY when the filter
    * provably matches no row of the file.
    */
  private def mayMatch(rel: String, filter: sources.Filter): Boolean = filter match {
    case sources.And(l, r) => mayMatch(rel, l) && mayMatch(rel, r)
    case sources.Or(l, r) => mayMatch(rel, l) || mayMatch(rel, r)
    case sources.EqualTo(c, v) => pointAllows(rel, c, v)
    case sources.EqualNullSafe(c, v) if v != null => pointAllows(rel, c, v)
    case sources.GreaterThan(c, v) =>
      boundsAllow(rel, c, v)((lo, hi, d) => hi > d) &&
        strBoundsAllow(rel, c, v)((lo, hi, s) => cpCompare(hi, s) > 0)
    case sources.GreaterThanOrEqual(c, v) =>
      boundsAllow(rel, c, v)((lo, hi, d) => hi >= d) &&
        strBoundsAllow(rel, c, v)((lo, hi, s) => cpCompare(hi, s) >= 0)
    case sources.LessThan(c, v) =>
      boundsAllow(rel, c, v)((lo, hi, d) => lo < d) &&
        strBoundsAllow(rel, c, v)((lo, hi, s) => cpCompare(lo, s) < 0)
    case sources.LessThanOrEqual(c, v) =>
      boundsAllow(rel, c, v)((lo, hi, d) => lo <= d) &&
        strBoundsAllow(rel, c, v)((lo, hi, s) => cpCompare(lo, s) <= 0)
    case sources.In(c, vs) =>
      if (vs == null || vs.isEmpty) false // IN () matches nothing
      else vs.exists(v => v == null || pointAllows(rel, c, v))
    // a file whose recorded null count is 0 has no NULL to contribute
    case sources.IsNull(c) =>
      !nulls.get(rel).flatMap(_.get(c)).contains(0L)
    // a file that is ALL nulls in c (null count == row count) has no
    // non-NULL row; both facts must be recorded to prove it
    case sources.IsNotNull(c) =>
      !(for { n <- nulls.get(rel).flatMap(_.get(c)); r <- rowsPerFile.get(rel) }
        yield n == r).contains(true)
    // strings with prefix p occupy [p, successor(p)): the file may hold
    // one iff hi ≥ p and (when the successor exists) lo < successor(p)
    case sources.StringStartsWith(c, p) if p != null =>
      strBoundsAllow(rel, c, p)((lo, hi, s) =>
        cpCompare(hi, s) >= 0 && cpSuccessor(s).forall(n => cpCompare(lo, n) < 0))
    case _ => true // Not/StringEndsWith/…: no sound file-level proof
  }

  private def pointAllows(rel: String, c: String, v: Any): Boolean =
    boundsAllow(rel, c, v)((lo, hi, d) => d >= lo && d <= hi) &&
      strBoundsAllow(rel, c, v)((lo, hi, s) =>
        cpCompare(s, lo) >= 0 && cpCompare(s, hi) <= 0) &&
      segmentAllows(rel, c, v) && bloomAllows(rel, c, v)

  /** Check a STRING literal against the file's recorded (possibly
    * truncated, always valid) code-point-ordered bounds; files or columns
    * without string bounds, and non-string literals, pass.
    */
  private def strBoundsAllow(rel: String, c: String, v: Any)
                            (pred: (String, String, String) => Boolean): Boolean =
    (strs.get(rel).flatMap(_.get(c)), v) match {
      case (Some(b), s: String) => pred(b.lo, b.hi, s)
      case _ => true
    }

  // sidecar blooms, loaded lazily once per (file, column) per scan — the
  // manifest's #bloom declarations say which loads can succeed, so files
  // without a bloom cost nothing
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Option[org.apache.spark.util.sketch.BloomFilter]]()

  /** Equality/IN literals checked against the file's bloom sidecar: the
    * pruning min/max bounds can't do on hash-scattered keys. Conservative
    * like everything here — no declared bloom, unreadable sidecar, or a
    * non-long/string literal all mean "read the file".
    */
  private def bloomAllows(rel: String, c: String, v: Any): Boolean = {
    if (!blooms.get(rel).exists(_.contains(c))) return true
    bloomCache.computeIfAbsent((rel, c), { key =>
      graft.ops.Manifest.readBloomSidecar(spark, root, key._1, key._2)
    }) match {
      case None => true
      case Some(bf) => v match {
        case n: java.lang.Number => bf.mightContainLong(n.longValue())
        case s: String => bf.mightContainString(s)
        case _ => true
      }
    }
  }

  /** Check `v` against the file's recorded [lo, hi] for column `c`;
    * files or columns without bounds (and non-numeric literals) pass.
    */
  private def boundsAllow(rel: String, c: String, v: Any)
                         (pred: (Double, Double, Double) => Boolean): Boolean =
    stats.get(rel).flatMap(_.get(c)) match {
      case Some((lo, hi)) =>
        numeric(v) match {
          case Some(d) => pred(lo, hi, d)
          case None => true
        }
      case None => true
    }

  /** For a partition column, does the file sit in the `__p_c=v` dir the
    * literal denotes? Only value types whose `toString` provably equals
    * Spark's `cast(x as string)` rendering participate (exact-or-no-prune;
    * floats/timestamps/decimals render differently and are skipped).
    */
  private def segmentAllows(rel: String, c: String, v: Any): Boolean = {
    if (!partCols.contains(c)) return true
    stringRendering(v) match {
      case Some(s) =>
        val seg = s"__p_$c=${ExternalCatalogUtils.escapePathName(s)}"
        rel.split('/').contains(seg)
      case None => true
    }
  }

  /** Filter-literal side of the bounds encoding (`Manifest.statEncode`):
    * dates as epoch days, timestamps as fractional epoch seconds.
    */
  private def numeric(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
    case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
    case t: java.sql.Timestamp => Some(t.getTime / 1000.0)
    case i: java.time.Instant => Some(i.getEpochSecond + i.getNano / 1e9)
    case _ => None
  }

  private def stringRendering(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case _: java.lang.Boolean | _: java.lang.Byte | _: java.lang.Short |
         _: java.lang.Integer | _: java.lang.Long => Some(v.toString)
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case _ => None
  }
}

object ManifestFileIndex {

  /** The index as a vanilla parquet `HadoopFsRelation` — every downstream
    * Spark facility (vectorized reader, whole-stage codegen, footer-level
    * predicate pushdown, AQE) applies unchanged.
    */
  def relation(spark: SparkSession,
               info: graft.ops.Manifest.TableInfo): HadoopFsRelation = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val index = new ManifestFileIndex(cs, info.root, info.entries,
      info.stats, info.partCols, info.blooms, info.knownRowCount,
      info.strs, info.nulls, info.rows)
    HadoopFsRelation(index, new StructType(), info.dataSchema,
      None, new ParquetFileFormat, info.options)(cs)
  }

  def dataFrame(spark: SparkSession,
                info: graft.ops.Manifest.TableInfo): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cs,
      LogicalRelation(relation(spark, info), isStreaming = false))
  }
}

/** A manifest dataset as a STREAMING SOURCE (Delta's streaming-source
  * idea): offsets are manifest version numbers, and each micro-batch
  * reads exactly the files APPENDED between the checkpointed version and
  * the current one — immutability makes the delta a file-set difference,
  * so tailing a 100 TB dataset costs the new files only, and checkpointed
  * offsets give exactly-once delivery across restarts. Defined for
  * append-only lineages: a version that REMOVES files (overwrite, delete,
  * upsert, compaction) fails the stream unless `ignoreChanges=true`
  * (rewritten files are then re-delivered, Delta's documented semantics).
  *
  * `maxVersionsPerTrigger` bounds catch-up batches: a stream restarted
  * against a long backlog advances at most that many versions per
  * micro-batch instead of swallowing the whole lineage in one — the
  * throughput valve every file-tailing source needs at scale (cf.
  * `maxFilesPerTrigger`). Correctness is unaffected: the offset log
  * checkpoints each capped step, so delivery stays exactly-once.
  */
final class ManifestStreamSource(
    spark: classic.SparkSession,
    path: String,
    ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None)
    extends org.apache.spark.sql.execution.streaming.Source {

  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  override val schema: StructType =
    graft.ops.Manifest.tableInfo(spark, path).dataSchema

  // Highest version this source has offered or delivered — the base the
  // per-trigger cap advances from. PERSISTED under the query's source
  // metadata dir (the FileStreamSource pattern): without it, a restarted
  // instance could offer a capped offset BELOW the engine's checkpoint,
  // and the resulting backwards batch would either fail or re-deliver.
  // getBatch(start, …) also raises the floor, covering pre-hwm
  // checkpoints and missing metadata alike.
  private val hwmFile = metadataPath.map(m => new Path(m, "graft-version-hwm"))
  private val ratchet = new java.util.concurrent.atomic.AtomicLong(
    hwmFile.filter(_ => maxVersionsPerTrigger.isDefined).flatMap { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else scala.util.Try {
        val in = fs.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toLong
        finally in.close()
      }.toOption
    }.getOrElse(0L))

  private def advance(v: Long): Unit = {
    val prev = ratchet.getAndUpdate(cur => math.max(cur, v))
    if (v > prev) hwmFile.filter(_ => maxVersionsPerTrigger.isDefined).foreach { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  private def versionOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[V1Offset] = {
    val latest = graft.ops.Manifest.latestVersion(spark, path)
    val capped = maxVersionsPerTrigger match {
      case Some(n) => math.min(latest, ratchet.get() + n)
      case None => latest
    }
    if (capped == 0) None
    else { advance(capped); Some(LongOffset(capped)) }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): org.apache.spark.sql.classic.DataFrame = {
    val fromV = start.map(versionOf).getOrElse(0L)
    val toV = versionOf(end)
    advance(toV)
    val fromFiles =
      if (fromV == 0) Set.empty[String]
      else graft.ops.Manifest.tableInfo(spark, path, fromV).entries.map(_._1).toSet
    val full = graft.ops.Manifest.tableInfo(spark, path, toV)
    val added = full.entries.filterNot(e => fromFiles(e._1))
    val removed = fromFiles -- full.entries.map(_._1).toSet
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"version $toV of $path removed ${removed.size} file(s) — the stream " +
          "source is append-only; pass ignoreChanges=true to re-deliver rewrites")
    // merge-on-read deletes change rows without changing the file list —
    // invisible to this source's file-set diff, so refuse them like any
    // other non-append change (ignoreChanges opts into delivering the
    // files' full contents, vectors unapplied — Delta's semantics)
    if (graft.ops.Manifest.dvStateDiffers(spark, path, fromV, toV) && !ignoreChanges)
      throw new IllegalStateException(
        s"versions $fromV..$toV of $path changed deletion vectors — the stream " +
          "source is append-only; purge vectors or pass ignoreChanges=true")
    val addedSet = added.map(_._1).toSet
    val info = full.copy(entries = added,
      stats = full.stats.view.filterKeys(addedSet).toMap,
      blooms = full.blooms.view.filterKeys(addedSet).toMap,
      rows = full.rows.view.filterKeys(addedSet).toMap,
      strs = full.strs.view.filterKeys(addedSet).toMap,
      nulls = full.nulls.view.filterKeys(addedSet).toMap)
    classic.Dataset.ofRows(spark,
      LogicalRelation(ManifestFileIndex.relation(spark, info), isStreaming = true))
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestStreamSource[$path]"
}

/** The `graft-manifest` data source format: manifest-versioned datasets
  * addressable through the standard reader API, PURE SQL, and
  * `readStream` —
  *
  * {{{
  *   spark.read.format("graft-manifest").load(path)              // latest
  *   spark.read.format("graft-manifest")
  *     .option("version", 3).load(path)                          // time travel
  *   CREATE TEMPORARY VIEW t USING `graft-manifest`
  *     OPTIONS (path '…', version '3')                           -- SQL DDL
  *   spark.readStream.format("graft-manifest").load(path)        // tail appends
  * }}}
  *
  * The returned relation is the same [[ManifestFileIndex]]-backed one as
  * `Manifest.table`, so SQL `WHERE` clauses prune files through the
  * manifest's recorded bounds and partition directories; the streaming
  * form is [[ManifestStreamSource]]. Registered via
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`.
  */
/** The streaming SINK side of the format: `df.writeStream
  * .format("graft-manifest").start(path)` — every micro-batch is one
  * atomic manifest commit carrying the batchId watermark, so a batch
  * replayed after a failure between commit and checkpoint is skipped,
  * not appended twice (the idempotence contract of
  * `StreamOps.appendIdempotent`, now wired into the standard writer API
  * instead of requiring foreachBatch).
  */
final class ManifestSink(path: String, statsCols: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    // the incoming frame is streaming-incepted; rebase it onto the
    // already-computed RDD as a batch plan (the ForeachBatchSink pattern)
    // so ordinary writers accept it
    val classicData = data.asInstanceOf[classic.DataFrame]
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      rdd = classicData.queryExecution.toRdd,
      originDataset = classicData, isStreaming = false)
    val batch = classic.Dataset.ofRows(classicData.sparkSession, node)
    val committed = graft.ops.Manifest
      .lastProp(batch.sparkSession, path, "streaming.batchId").map(_.toLong)
    if (!committed.exists(_ >= batchId)) {
      val props = Map("streaming.batchId" -> batchId.toString)
      if (statsCols.nonEmpty)
        graft.ops.Manifest.appendWithStats(batch, path, statsCols, props): Unit
      else graft.ops.Manifest.append(batch, path, props): Unit
    }
  }

  override def toString: String = s"ManifestSink[$path]"
}

final class ManifestDataSource
    extends org.apache.spark.sql.sources.RelationProvider
    with org.apache.spark.sql.sources.CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-manifest requires a path (reader .load(path) or OPTIONS (path '…'))"))

  override def createRelation(
      sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String]): org.apache.spark.sql.sources.BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    // time travel: by explicit version, or by timestamp (epoch millis or
    // 'yyyy-mm-dd hh:mm:ss') resolved against manifest commit times
    val version = parameters.get("version").map(_.toLong)
      .orElse(parameters.get("timestampasof").orElse(parameters.get("timestampAsOf"))
        .map { ts =>
          val millis =
            if (ts.forall(_.isDigit)) ts.toLong
            else java.sql.Timestamp.valueOf(ts).getTime
          val v = graft.ops.Manifest.versionAsOf(spark, path, millis)
          require(v > 0, s"no version of $path existed at or before '$ts'")
          v
        })
      .getOrElse(-1L)
    // a BaseRelation cannot apply merge-on-read deletion vectors (row
    // filtering needs a plan above the scan) — fail loudly rather than
    // resurrect deleted rows into SQL results
    if (graft.ops.Manifest.hasDeletionVectors(spark, path, version))
      throw new IllegalStateException(
        s"dataset at $path carries merge-on-read deletion vectors, which the " +
          "SQL relation cannot apply — read via Manifest.read/Manifest.table, " +
          "or fold them in with Manifest.purgeDeletes/compact first")
    ManifestFileIndex.relation(spark,
      graft.ops.Manifest.tableInfo(spark, path, version))
  }

  /** Writer API: `df.write.format("graft-manifest").mode(m).save(path)`.
    * Append/overwrite map onto manifest commits (so every save is a
    * versioned, atomically-published transaction); a `stats.cols` option
    * records per-file bounds for file skipping on later reads.
    */
  override def createRelation(
      sqlContext: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val statsCols = parameters.get("stats.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val bloomCols = parameters.get("bloom.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    // sketch facts on write: options `ndv.cols` / `kll.cols` run the
    // incremental ANALYZE right after the commit (only the just-staged
    // files are missing sketches, so the extra pass costs the batch)
    val ndvCols = parameters.get("ndv.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val kllCols = parameters.get("kll.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    def append(): Unit =
      if (bloomCols.nonEmpty)
        graft.ops.Manifest.appendWithBloom(data, path, bloomCols,
          statsCols = statsCols)
      else if (statsCols.nonEmpty)
        graft.ops.Manifest.appendWithStats(data, path, statsCols)
      else graft.ops.Manifest.append(data, path)
    val exists = graft.ops.Manifest.latestVersion(spark, path) > 0
    mode match {
      case SaveMode.Append => append()
      case SaveMode.Overwrite =>
        if (statsCols.nonEmpty)
          graft.ops.Manifest.overwriteWithStats(data, path, statsCols)
        else graft.ops.Manifest.overwrite(data, path)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"manifest dataset already exists at $path (mode ErrorIfExists)")
        else append()
      case SaveMode.Ignore => if (!exists) append()
    }
    if (ndvCols.nonEmpty) graft.ops.Manifest.analyzeNdv(spark, path, ndvCols)
    if (kllCols.nonEmpty)
      graft.ops.Manifest.analyzeQuantiles(spark, path, kllCols)
    createRelation(sqlContext, parameters)
  }

  /** Streaming-source entry points: `spark.readStream
    * .format("graft-manifest").load(path)`. The dataset must already have
    * a committed version (the schema comes from the manifest; pass
    * `.schema(...)` to start a stream against a not-yet-created dataset is
    * unsupported by design — a manifest IS the schema authority).
    * Option `ignoreChanges=true` opts into re-delivery of rewritten files
    * when a non-append commit (upsert/delete/compaction) enters the
    * lineage, mirroring Delta's option of the same name.
    */
  override def sourceSchema(
      sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val s = schema.getOrElse(
      graft.ops.Manifest.tableInfo(sqlContext.sparkSession, path).dataSchema)
    (shortName(), s)
  }

  override def createSource(
      sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val ignoreChanges =
      parameters.get("ignorechanges").orElse(parameters.get("ignoreChanges"))
        .exists(_.toBoolean)
    val maxVersions =
      parameters.get("maxversionspertrigger")
        .orElse(parameters.get("maxVersionsPerTrigger")).map(_.toLong)
    require(maxVersions.forall(_ > 0), "maxVersionsPerTrigger must be positive")
    new ManifestStreamSource(
      sqlContext.sparkSession.asInstanceOf[classic.SparkSession],
      pathOf(parameters), ignoreChanges, maxVersions, Some(metadataPath))
  }

  override def createSink(
      sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-manifest sink supports Append output mode only (got $outputMode)")
    require(partitionColumns.isEmpty,
      "graft-manifest sink appends unpartitioned; partition on read via stats.cols")
    val statsCols = parameters.get("stats.cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    new ManifestSink(pathOf(parameters), statsCols)
  }
}
