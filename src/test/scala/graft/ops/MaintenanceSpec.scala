package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintenance ops over the Hadoop `FileSystem` API. The swap must never
  * leave the dataset in a half-state (the reference's RDBMS gave it
  * transactional DDL for free; `lib/etl/loading.rb:272-274` drops and
  * recreates inside the server), and a partitioned upsert must cost the
  * touched partitions, not the table.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def filesUnder(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(dir.getAbsolutePath) ->
        (f.length(), f.lastModified())).toMap
  }

  test("swapWrite replaces a dataset in place and survives self-reads") {
    val path = java.nio.file.Files.createTempDirectory("swap").toString + "/ds"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)
    // df reads from the very path it will replace — the tmp write must
    // finish before any rename touches the target
    val doubled = spark.read.parquet(path).withColumn("v", upper(col("v")))
    Maintenance.swapWrite(doubled, path)
    assert(spark.read.parquet(path).orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("A", "B"))
    // no tmp/retired litter left behind
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName).toSet
    assert(parent == Set("ds"), s"unexpected siblings: $parent")
  }

  test("manifest dataset: versioned publish, cheap append, time travel, vacuum") {
    val dir = java.nio.file.Files.createTempDirectory("mfst").toString + "/ds"
    val v1 = Manifest.overwrite(spark.range(0, 100).toDF("id"), dir)
    assert(v1 == 1 && Manifest.read(spark, dir).count() == 100)
    // append publishes a new version without touching v1's files
    val before = filesUnder(new java.io.File(dir))
    val v2 = Manifest.append(spark.range(100, 150).toDF("id"), dir)
    assert(v2 == 2 && Manifest.read(spark, dir).count() == 150)
    val after = filesUnder(new java.io.File(dir))
    assert(before.forall { case (f, sig) => after.get(f).contains(sig) },
      "append must not rewrite or move existing data files")
    // time travel: v1 still reads its original contents
    assert(Manifest.read(spark, dir, version = 1).count() == 100)
    // overwrite replaces latest, old versions remain until vacuum
    val v3 = Manifest.overwrite(spark.range(0, 7).toDF("id"), dir)
    assert(v3 == 3 && Manifest.read(spark, dir).count() == 7)
    assert(Manifest.read(spark, dir, version = 2).count() == 150)
    Manifest.vacuum(spark, dir, keepVersions = 1)
    assert(Manifest.read(spark, dir).count() == 7) // latest unaffected
    // vacuumed versions are gone: manifest deleted
    intercept[java.util.NoSuchElementException] {
      Manifest.read(spark, dir, version = 1)
    }
  }

  test("manifest upsert: keyed replace publishes a new version; old version intact") {
    val dir = java.nio.file.Files.createTempDirectory("mfup").toString + "/ds"
    Manifest.upsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq"),
      dir, Seq("k"), "seq")
    Manifest.upsert(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "seq"),
      dir, Seq("k"), "seq")
    val now = Manifest.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    val v1 = Manifest.read(spark, dir, version = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 == Map(1L -> "a", 2L -> "b"))
  }

  test("compactToSize derives the file count from on-disk bytes") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/ds"
    spark.range(0, 5000).toDF("id").repartition(16).write.parquet(dir)
    val bytes = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    // target ≈ half the dataset → 2 files (ceil division)
    Maintenance.compactToSize(spark, dir, math.max(1L, bytes / 2))
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 3 && files >= 2, s"expected ~2 compacted files, got $files")
    assert(spark.read.parquet(dir).count() == 5000)
  }

  test("partition-scoped upsert rewrites only the touched partition") {
    val path = java.nio.file.Files.createTempDirectory("pups").toString + "/ds"
    val initial = Seq(
      (1L, "jan-a", 1L, "2026-01-01"),
      (2L, "jan-b", 1L, "2026-01-01"),
      (3L, "feb-a", 1L, "2026-02-01"),
      (4L, "mar-a", 1L, "2026-03-01")
    ).toDF("k", "v", "seq", "dt")
    Maintenance.upsertBatch(initial, path, Seq("k"), "seq", partitionCols = Seq("dt"))

    val root = new java.io.File(path)
    assert(root.listFiles().map(_.getName).count(_.startsWith("dt=")) == 3)
    val before = filesUnder(root)

    // batch touches ONLY the January partition: one update, one insert
    val batch = Seq(
      (2L, "jan-b-v2", 2L, "2026-01-01"),
      (5L, "jan-c", 2L, "2026-01-01")
    ).toDF("k", "v", "seq", "dt")
    Maintenance.upsertBatch(batch, path, Seq("k"), "seq", partitionCols = Seq("dt"))

    val after = filesUnder(root)
    val untouchedBefore = before.filter(!_._1.contains("dt=2026-01-01"))
    val untouchedAfter = after.filter(!_._1.contains("dt=2026-01-01"))
    // feb/mar partitions: identical file names, lengths, AND mtimes —
    // they were never read, rewritten, or moved
    assert(untouchedBefore == untouchedAfter,
      s"untouched partitions changed:\n$untouchedBefore\nvs\n$untouchedAfter")
    assert(before.keys.exists(_.contains("dt=2026-01-01")))
    assert(after.filter(_._1.contains("dt=2026-01-01")) !=
      before.filter(_._1.contains("dt=2026-01-01")))

    val state = spark.read.parquet(path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq
    assert(state == Seq(1L -> "jan-a", 2L -> "jan-b-v2", 3L -> "feb-a",
      4L -> "mar-a", 5L -> "jan-c"))
  }

  test("partition-scoped upsert creates brand-new partitions") {
    val path = java.nio.file.Files.createTempDirectory("pups2").toString + "/ds"
    Maintenance.upsertBatch(Seq((1L, "a", 1L, "2026-01-01")).toDF("k", "v", "seq", "dt"),
      path, Seq("k"), "seq", partitionCols = Seq("dt"))
    val before = filesUnder(new java.io.File(path))
    Maintenance.upsertBatch(Seq((9L, "apr", 1L, "2026-04-01")).toDF("k", "v", "seq", "dt"),
      path, Seq("k"), "seq", partitionCols = Seq("dt"))
    val after = filesUnder(new java.io.File(path))
    assert(after.filter(_._1.contains("dt=2026-01-01")) == before) // untouched
    assert(spark.read.parquet(path).count() == 2)
  }

  test("upsert survives partition values the hive escaper and the writer disagree on") {
    // Spark's writer leaves space, '+', ',', '(', '&' unescaped — any code
    // that RECONSTRUCTS partition dir names from values instead of listing
    // what the writer wrote silently skips these partitions and drops the
    // merged output. Regression for exactly that bug.
    val path = java.nio.file.Files.createTempDirectory("pupesc").toString + "/ds"
    val gnarly = Seq("a b", "c+d", "e,f", "g(h)", "i&j")
    val initial = gnarly.zipWithIndex.map { case (p, i) => (i.toLong, "v1", 1L, p) }
      .toDF("k", "v", "seq", "part")
    Maintenance.upsertBatch(initial, path, Seq("k"), "seq", partitionCols = Seq("part"))
    val batch = Seq((0L, "v2", 2L, "a b"), (1L, "v2", 2L, "c+d"), (2L, "v2", 2L, "e,f"),
      (3L, "v2", 2L, "g(h)"), (4L, "v2", 2L, "i&j")).toDF("k", "v", "seq", "part")
    Maintenance.upsertBatch(batch, path, Seq("k"), "seq", partitionCols = Seq("part"))
    val state = spark.read.parquet(path).orderBy("k").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("v"))).toSeq
    assert(state == gnarly.map(_ -> "v2"), s"lost partitions: $state")
  }

  test("upsert handles date-typed and null partition values") {
    // date/timestamp partition values render per the writer's own format,
    // nulls become __HIVE_DEFAULT_PARTITION__ — both covered by listing
    // written dirs rather than formatting values ourselves
    val path = java.nio.file.Files.createTempDirectory("pupdt").toString + "/ds"
    val initial = Seq((1L, "a", 1L, Some(java.sql.Date.valueOf("2026-01-01"))),
      (2L, "b", 1L, None)).toDF("k", "v", "seq", "d")
    Maintenance.upsertBatch(initial, path, Seq("k"), "seq", partitionCols = Seq("d"))
    val batch = Seq((1L, "a2", 2L, Some(java.sql.Date.valueOf("2026-01-01"))),
      (2L, "b2", 2L, Option.empty[java.sql.Date])).toDF("k", "v", "seq", "d")
    Maintenance.upsertBatch(batch, path, Seq("k"), "seq", partitionCols = Seq("d"))
    val state = spark.read.parquet(path).orderBy("k").collect()
      .map(_.getAs[String]("v")).toSeq
    assert(state == Seq("a2", "b2"))
  }

  test("empty batch with partitionCols is a no-op, not a crash") {
    val path = java.nio.file.Files.createTempDirectory("pupempty").toString + "/ds"
    Maintenance.upsertBatch(Seq((1L, "a", 1L, "p1")).toDF("k", "v", "seq", "part"),
      path, Seq("k"), "seq", partitionCols = Seq("part"))
    val before = filesUnder(new java.io.File(path))
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "v", "seq", "part")
    Maintenance.upsertBatch(empty, path, Seq("k"), "seq", partitionCols = Seq("part"))
    assert(filesUnder(new java.io.File(path)) == before)
  }

  test("upsert evolves schema: a batch with a new column back-fills nulls") {
    val path = java.nio.file.Files.createTempDirectory("evolve").toString + "/ds"
    Maintenance.upsertBatch(Seq((1L, "a", 1L)).toDF("k", "v", "seq"),
      path, Seq("k"), "seq")
    val batch = Seq((2L, "b", 1L, "extra")).toDF("k", "v", "seq", "w")
    Maintenance.upsertBatch(batch, path, Seq("k"), "seq")
    val rows = spark.read.parquet(path).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"), r.getAs[String]("w"))).toSeq
    assert(rows == Seq((1L, "a", null), (2L, "b", "extra")))
  }

  test("a pre-existing .retired directory is preserved, not clobbered") {
    val dir = java.nio.file.Files.createTempDirectory("retired")
    val path = dir.toString + "/ds"
    Seq((1L, "a")).toDF("id", "v").write.parquet(path)
    // unrelated sibling that happens to carry the old fixed retired name
    val bystander = new java.io.File(dir.toString, "ds.retired")
    bystander.mkdirs()
    java.nio.file.Files.write(bystander.toPath.resolve("keep.txt"), "data".getBytes)
    Maintenance.swapWrite(spark.read.parquet(path).withColumn("v", upper(col("v"))), path)
    assert(new java.io.File(bystander, "keep.txt").exists(),
      "swap destroyed an unrelated .retired directory")
    assert(spark.read.parquet(path).head().getString(1) == "A")
  }

  test("partition-scoped upsert prunes the existing-side scan to touched partitions") {
    val path = java.nio.file.Files.createTempDirectory("pups3").toString + "/ds"
    Seq((1L, "a", 1L, "2026-01-01"), (2L, "b", 1L, "2026-02-01"))
      .toDF("k", "v", "seq", "dt")
      .write.partitionBy("dt").parquet(path)
    // the merge plan's scan must carry a PartitionFilters entry on dt —
    // that's the difference between reading one day and reading 100 TB
    val pruned = spark.read.parquet(path).filter(col("dt") === lit("2026-01-01"))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2026-01-01"),
      s"expected partition filter in:\n$scan")
    assert(pruned.count() == 1)
  }

  // ───────────────── round-6 manifest hardening ─────────────────

  private def manifestEntries(dir: String, v: Long): Seq[String] =
    scala.io.Source.fromFile(s"$dir/_manifest.v$v").getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty).toSeq

  test("manifest partition-scoped upsert carries untouched entries with identical paths") {
    val dir = java.nio.file.Files.createTempDirectory("mfpart").toString + "/ds"
    val initial = Seq(
      (1L, "jan-a", 1L, "2026-01-01"),
      (2L, "jan-b", 1L, "2026-01-01"),
      (3L, "feb-a", 1L, "2026-02-01"),
      (4L, "mar-a", 1L, "2026-03-01")
    ).toDF("k", "v", "seq", "dt")
    val v1 = Manifest.upsert(initial, dir, Seq("k"), "seq", partitionCols = Seq("dt"))
    val before = filesUnder(new java.io.File(dir, "data"))
    val v1Untouched = manifestEntries(dir, v1).filterNot(_.contains("dt=2026-01-01"))

    val batch = Seq((2L, "jan-b-v2", 2L, "2026-01-01"), (5L, "jan-c", 2L, "2026-01-01"))
      .toDF("k", "v", "seq", "dt")
    val v2 = Manifest.upsert(batch, dir, Seq("k"), "seq", partitionCols = Seq("dt"))

    // untouched partitions: the NEW manifest references the SAME relative
    // paths, and the files themselves are byte-identical (len + mtime)
    val v2Untouched = manifestEntries(dir, v2).filterNot(_.contains("dt=2026-01-01"))
    assert(v1Untouched.toSet == v2Untouched.toSet,
      s"untouched entries changed:\n$v1Untouched\nvs\n$v2Untouched")
    val after = filesUnder(new java.io.File(dir, "data"))
    val untouchedB = before.filter(!_._1.contains("dt=2026-01-01"))
    assert(untouchedB.forall { case (f, sig) => after.get(f).contains(sig) },
      "untouched partition files were rewritten or moved")

    val state = Manifest.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"), r.getAs[String]("dt"))).toSeq
    assert(state == Seq((1L, "jan-a", "2026-01-01"), (2L, "jan-b-v2", "2026-01-01"),
      (3L, "feb-a", "2026-02-01"), (4L, "mar-a", "2026-03-01"),
      (5L, "jan-c", "2026-01-01")))
    // time travel still sees the pre-upsert state
    assert(Manifest.read(spark, dir, version = v1).count() == 4)
  }

  test("manifest partitioned upsert survives gnarly partition values and brand-new partitions") {
    val dir = java.nio.file.Files.createTempDirectory("mfgnarly").toString + "/ds"
    val gnarly = Seq("a b", "c+d", "e,f", "g(h)", "i&j")
    val initial = gnarly.zipWithIndex.map { case (p, i) => (i.toLong, "v1", 1L, p) }
      .toDF("k", "v", "seq", "part")
    Manifest.upsert(initial, dir, Seq("k"), "seq", partitionCols = Seq("part"))
    val batch = gnarly.zipWithIndex.map { case (p, i) => (i.toLong, "v2", 2L, p) }
      .toDF("k", "v", "seq", "part")
    Manifest.upsert(batch, dir, Seq("k"), "seq", partitionCols = Seq("part"))
    // a batch that ONLY adds a new partition leaves every old entry alone
    val v3 = Manifest.upsert(Seq((99L, "new", 1L, "zz z")).toDF("k", "v", "seq", "part"),
      dir, Seq("k"), "seq", partitionCols = Seq("part"))
    val state = Manifest.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("v"))).toSeq
    assert(state == gnarly.map(_ -> "v2") :+ ("zz z" -> "new"), s"lost rows: $state")
    assert(manifestEntries(dir, v3).count(_.contains("part=zz")) > 0)
  }

  test("torn manifests are invisible: no absence window, version number burned") {
    val dir = java.nio.file.Files.createTempDirectory("mftorn").toString + "/ds"
    val v1 = Manifest.overwrite(spark.range(0, 10).toDF("id"), dir)
    assert(v1 == 1L)
    // a crashed writer left a manifest with no footer — readers must keep
    // resolving v1, and the next commit must NOT reuse the torn number
    val torn = new java.io.File(dir, "_manifest.v2")
    val w = new java.io.FileWriter(torn)
    w.write("#graft-manifest 1\ndata/zzz/part-0.parquet\n"); w.close()
    assert(Manifest.latestVersion(spark, dir) == 1L)
    assert(Manifest.read(spark, dir).count() == 10)
    val v3 = Manifest.append(spark.range(10, 15).toDF("id"), dir)
    assert(v3 == 3L, s"torn v2 must stay burned, got $v3")
    assert(Manifest.read(spark, dir).count() == 15)
  }

  test("concurrent appends both land via optimistic rebase") {
    val dir = java.nio.file.Files.createTempDirectory("mfconc").toString + "/ds"
    Manifest.overwrite(spark.range(0, 10).toDF("id"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            Manifest.append(spark.range(100L * (i + 1), 100L * (i + 1) + 20).toDF("id"), dir)
        })
      }
      val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versions.toSet.size == 4, s"collided versions: $versions")
    } finally pool.shutdown()
    // every append's rows are present — no lost update
    assert(Manifest.read(spark, dir).count() == 10 + 4 * 20)
  }

  test("manifest compact publishes a new version; readPartitions prunes by manifest") {
    val dir = java.nio.file.Files.createTempDirectory("mfcmp").toString + "/ds"
    // stream-append shape: many tiny versions → many tiny files
    (0 until 5).foreach { i =>
      Manifest.append(spark.range(i * 100, (i + 1) * 100).toDF("id")
        .repartition(4), dir, Map("streaming.batchId" -> i.toString))
    }
    val smallFiles = manifestEntries(dir, 5L).size
    assert(smallFiles >= 20)
    val cv = Manifest.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(cv == 6L)
    assert(manifestEntries(dir, cv).size == 1, "1 GiB target → one file")
    assert(Manifest.read(spark, dir).count() == 500)
    // the pre-compaction version is still readable (time travel)...
    assert(Manifest.read(spark, dir, version = 5L).count() == 500)
    // ...and the idempotence watermark survived the compaction commit
    assert(Manifest.lastProp(spark, dir, "streaming.batchId").contains("4"))

    // manifest-level partition pruning reads only the matching files
    val pdir = java.nio.file.Files.createTempDirectory("mfprune").toString + "/ds"
    Manifest.upsert(Seq((1L, "a", 1L, "x"), (2L, "b", 1L, "y")).toDF("k", "v", "seq", "p"),
      pdir, Seq("k"), "seq", partitionCols = Seq("p"))
    val pruned = Manifest.readPartitions(spark, pdir, Map("p" -> "x"))
    assert(pruned.collect().map(_.getAs[Long]("k")).toSeq == Seq(1L))
    assert(pruned.inputFiles.length < Manifest.read(spark, pdir).inputFiles.length)
  }

  test("compacting a PARTITIONED dataset keeps its partition layout queryable") {
    val dir = java.nio.file.Files.createTempDirectory("mfcmpp").toString + "/ds"
    val rows = (1L to 40L).map(i => (i, s"v$i", 1L, if (i % 2 == 0) "x" else "y"))
    Manifest.upsert(rows.toDF("k", "v", "seq", "p"), dir, Seq("k"), "seq",
      partitionCols = Seq("p"))
    // a second small upsert so compaction has something to collapse
    Manifest.upsert(Seq((1L, "v1b", 2L, "y")).toDF("k", "v", "seq", "p"),
      dir, Seq("k"), "seq", partitionCols = Seq("p"))
    val cv = Manifest.compact(spark, dir, targetFileBytes = 1L << 30)
    // rows intact after the rewrite
    assert(Manifest.read(spark, dir, cv).count() == 40)
    // the declarative scan's partition pruning must still see every row of
    // the filtered partition — compacted files must carry __p dirs
    val xs = Manifest.table(spark, dir)
      .filter(col("p") === "x").collect().map(_.getAs[Long]("k")).sorted.toSeq
    assert(xs == (2L to 40L by 2), s"partition filter lost rows: $xs")
    // ...and the explicit partition read still resolves files
    val ys = Manifest.readPartitions(spark, dir, Map("p" -> "y"))
    assert(ys.count() == 20)
    assert(ys.filter(col("k") === 1L).head.getAs[String]("v") == "v1b")
  }

  test("compactSmallFiles packs only the small-file tail; big files carry over") {
    val dir = java.nio.file.Files.createTempDirectory("mfpack").toString + "/ds"
    // one "big" file plus a streaming-append tail of tiny ones
    Manifest.appendWithStats(spark.range(0, 5000).toDF("id").coalesce(1),
      dir, Seq("id"))
    (0 until 4).foreach { i =>
      Manifest.appendWithStats(
        spark.range(5000 + i * 10, 5000 + (i + 1) * 10).toDF("id").coalesce(1),
        dir, Seq("id"))
    }
    val before = manifestEntries(dir, 5L)
    assert(before.size == 5)
    val bigFile = before.head // first append's file
    val bigLen = new java.io.File(dir, bigFile).length()
    // threshold between the tail (~hundreds of bytes) and the big file
    val cv = Manifest.compactSmallFiles(spark, dir, minFileBytes = bigLen,
      targetFileBytes = 1L << 30)
    assert(cv == 6L)
    val after = manifestEntries(dir, cv)
    assert(after.contains(bigFile), "the big file must carry over path-identical")
    assert(after.size == 2, s"4 small files should pack into 1: $after")
    assert(Manifest.read(spark, dir).count() == 5040)
    assert(Manifest.read(spark, dir, version = 5L).count() == 5040) // time travel
    // the carried big file kept its bounds; the packed file got fresh ones
    // — a range filter on either side prunes to one file
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case p if p.nodeName.startsWith("Scan") && p.metrics.contains("numFiles") =>
          p.metrics("numFiles").value
      }.sum
    }
    def t = Manifest.table(spark, dir)
    assert(t.filter(col("id") >= 5000).count() == 40)
    assert(scanned(t.filter(col("id") >= 5000)) == 1)
    assert(scanned(t.filter(col("id") < 100)) == 1)
    // fewer than two small files → no-op, same version
    assert(Manifest.compactSmallFiles(spark, dir, minFileBytes = bigLen) == cv)
  }

  test("compactSmallFiles restages packed rows into their partitions") {
    val dir = java.nio.file.Files.createTempDirectory("mfpackp").toString + "/ds"
    val rows = (1L to 20L).map(i => (i, i, if (i % 2 == 0) "x" else "y"))
    Manifest.upsert(rows.toDF("k", "seq", "p"), dir, Seq("k"), "seq",
      partitionCols = Seq("p"))
    Manifest.upsert(Seq((21L, 1L, "x"), (22L, 1L, "y")).toDF("k", "seq", "p"),
      dir, Seq("k"), "seq", partitionCols = Seq("p"))
    val cv = Manifest.compactSmallFiles(spark, dir,
      minFileBytes = 1L << 20, targetFileBytes = 1L << 30)
    // every packed file still lives under a __p_p= dir…
    assert(manifestEntries(dir, cv).forall(_.contains("__p_p=")))
    // …and partition pruning still sees every row
    val xs = Manifest.table(spark, dir).filter(col("p") === "x")
    assert(xs.collect().map(_.getAs[Long]("k")).sorted.toSeq
      == ((2L to 20L by 2) :+ 21L).sorted)
  }

  test("file stats in the manifest skip non-matching files in readRange") {
    val dir = java.nio.file.Files.createTempDirectory("mfstats").toString + "/ds"
    // three appends with disjoint id ranges → per-file bounds in the manifest
    Manifest.appendWithStats(spark.range(0, 100).toDF("id").coalesce(1), dir, Seq("id"))
    Manifest.appendWithStats(spark.range(100, 200).toDF("id").coalesce(1), dir, Seq("id"))
    Manifest.appendWithStats(spark.range(200, 300).toDF("id").coalesce(1), dir, Seq("id"))
    val all = Manifest.read(spark, dir)
    assert(all.count() == 300)
    // a range inside the middle batch reads ONE file of three
    val mid = Manifest.readRange(spark, dir, "id", 120, 180)
    assert(mid.inputFiles.length == 1, s"expected 1 file, got ${mid.inputFiles.length}")
    assert(mid.count() == 61 && all.inputFiles.length == 3)
    // a range outside every file reads nothing and returns nothing
    val none = Manifest.readRange(spark, dir, "id", 1000, 2000)
    assert(none.count() == 0)
    // compaction recomputes bounds for the rewritten files (stats.cols
    // prop carried), so skipping keeps working on the compacted version
    Manifest.compact(spark, dir, targetFileBytes = 400L)
    val afterCompact = Manifest.readRange(spark, dir, "id", 120, 180)
    assert(afterCompact.count() == 61)
    assert(afterCompact.inputFiles.length < Manifest.read(spark, dir).inputFiles.length,
      "compacted version lost its file-skipping stats")
  }

  test("merge applies conditional update/delete/insert in one commit") {
    val dir = java.nio.file.Files.createTempDirectory("mfmerge").toString + "/ds"
    Manifest.appendWithStats(
      spark.range(0, 100).toDF("id")
        .withColumn("status", lit("old")).withColumn("amount", col("id") * 10.0)
        .repartitionByRange(4, col("id")), dir, Seq("id"))
    // source: updates for ids 0-19 (but delete those over 150), a fresh
    // insert (id 1000), and one failing the insert condition (id 2000)
    val src = Seq(
      (5L, "upd", 99.0), (15L, "upd", 155.0), (16L, "del", 160.0),
      (1000L, "new", 42.0), (2000L, "new", -1.0)
    ).toDF("id", "status", "amount")
    val before = Manifest.tableInfo(spark, dir).entries.map(_._1).toSet
    val v = Manifest.merge(spark, dir, src, Seq("id"), Manifest.MergeSpec(
      matchedUpdate = Map("status" -> "s.status", "amount" -> "s.amount"),
      matchedUpdateCondition = Some("s.amount < 150"),
      matchedDeleteCondition = Some("s.amount >= 150"),
      notMatchedInsert = true,
      notMatchedInsertCondition = Some("s.amount > 0")))
    assert(v == 2L)
    val out = Manifest.read(spark, dir).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("status"), r.getAs[Double]("amount")))
      .toMap
    assert(out(5L) == ("upd", 99.0), "matched + update condition → updated")
    assert(!out.contains(15L) && !out.contains(16L),
      "matched rows failing the update condition but hitting delete → gone")
    assert(out(17L) == ("old", 170.0), "matched-file neighbors carry over")
    assert(out(1000L) == ("new", 42.0), "unmatched source row → inserted")
    assert(!out.contains(2000L), "insert condition filters source rows")
    assert(out.size == 100 - 2 + 1)
    // only files containing matched keys were rewritten
    val after = Manifest.tableInfo(spark, dir).entries.map(_._1).toSet
    assert((before & after).size == 3,
      s"3 of 4 range-clustered files must carry over: ${before & after}")
    // a key-duplicated source is rejected (non-deterministic merge)
    intercept[IllegalArgumentException] {
      Manifest.merge(spark, dir,
        Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("id", "status", "amount"),
        Seq("id"), Manifest.MergeSpec())
    }
    // a complete no-op returns the current version without committing
    assert(Manifest.merge(spark, dir,
      Seq((5000L, "x", -5.0)).toDF("id", "status", "amount"), Seq("id"),
      Manifest.MergeSpec(notMatchedInsertCondition = Some("s.amount > 0"))) == 2L)
  }

  test("history lists every version with file churn and props") {
    val dir = java.nio.file.Files.createTempDirectory("mfhist").toString + "/ds"
    Manifest.append(spark.range(0, 10).toDF("id").coalesce(1), dir,
      Map("job" -> "first"))
    Manifest.append(spark.range(10, 20).toDF("id").coalesce(1), dir)
    Manifest.compact(spark, dir, targetFileBytes = 1L << 30)
    val h = Manifest.history(spark, dir).collect()
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(3L, 2L, 1L), "newest first")
    assert(h.map(_.getAs[Long]("n_files")).toSeq == Seq(1L, 2L, 1L))
    // churn: v2 added 1 file removed 0; v3 (compaction) added 1 removed 2
    assert(h(1).getAs[Long]("n_added_files") == 1 && h(1).getAs[Long]("n_removed_files") == 0)
    assert(h(0).getAs[Long]("n_added_files") == 1 && h(0).getAs[Long]("n_removed_files") == 2)
    assert(h(2).getAs[Map[String, String]]("props").get("job").contains("first"))
    assert(h(0).getAs[Map[String, String]]("props").get("compacted.from").contains("2"))
    assert(h.forall(_.getAs[Long]("total_bytes") > 0))
  }

  test("restore re-commits an old version; timestampAsOf resolves by commit time") {
    val dir = java.nio.file.Files.createTempDirectory("mfrestore").toString + "/ds"
    Manifest.append(spark.range(0, 10).toDF("id"), dir)            // v1
    val t1 = System.currentTimeMillis()
    Thread.sleep(1100)                                             // mtime granularity
    Manifest.overwrite(spark.range(100, 120).toDF("id"), dir)      // v2
    assert(Manifest.read(spark, dir).count() == 20)
    // restore: v1's file list becomes v3 — no files move
    val rv = Manifest.restore(spark, dir, 1L)
    assert(rv == 3L)
    assert(Manifest.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 10L))
    assert(Manifest.committedProps(spark, dir).get("restored.from").contains("1"))
    // the rolled-back version stays readable for audit
    assert(Manifest.read(spark, dir, version = 2).count() == 20)
    // timestamp time travel: at t1 the current version was 1
    assert(Manifest.versionAsOf(spark, dir, t1) == 1L)
    assert(spark.read.format("graft-manifest")
      .option("timestampAsOf", t1.toString).load(dir).count() == 10)
    // before the dataset existed → no version
    assert(Manifest.versionAsOf(spark, dir, 1000L) == 0L)
  }

  test("an append that would change a column's type is rejected at write time") {
    val dir = java.nio.file.Files.createTempDirectory("mftype").toString + "/ds"
    Manifest.append(Seq((1L, "a")).toDF("id", "v"), dir)
    val ex = intercept[IllegalArgumentException] {
      Manifest.append(Seq((2, 3.5)).toDF("id", "v"), dir) // id int, v double
    }
    assert(ex.getMessage.contains("cast the batch"))
    // the failed append stays invisible: still one committed version
    assert(Manifest.latestVersion(spark, dir) == 1L)
    assert(Manifest.read(spark, dir).count() == 1)
  }

  test("manifest append with an evolved schema merges instead of dropping the new column") {
    val dir = java.nio.file.Files.createTempDirectory("mfevo").toString + "/ds"
    Manifest.append(Seq((1L, "a")).toDF("id", "v"), dir)
    Manifest.append(Seq((2L, "b", "extra")).toDF("id", "v", "w"), dir)
    val out = Manifest.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"), r.getAs[String]("w"))).toSeq
    assert(out == Seq((1L, "a", null), (2L, "b", "extra")), out.toString)
    // stickiness: a LATER same-schema-as-first append still merge-reads
    Manifest.append(Seq((3L, "c")).toDF("id", "v"), dir)
    val cols = Manifest.read(spark, dir).columns.toSet
    assert(cols == Set("id", "v", "w"))
    assert(Manifest.read(spark, dir).count() == 3)
  }

  test("vacuum honors retention and grace: retained readers live, fresh staged files survive") {
    val dir = java.nio.file.Files.createTempDirectory("mfvac").toString + "/ds"
    val v1 = Manifest.overwrite(spark.range(0, 5).toDF("id"), dir)
    val v2 = Manifest.overwrite(spark.range(0, 6).toDF("id"), dir)
    val v3 = Manifest.overwrite(spark.range(0, 7).toDF("id"), dir)

    Manifest.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    // v2 (within retention) still reads; v1's manifest is gone
    assert(Manifest.read(spark, dir, version = v2).count() == 6)
    assert(Manifest.read(spark, dir, version = v3).count() == 7)
    intercept[java.util.NoSuchElementException] {
      Manifest.read(spark, dir, version = v1)
    }
    // grace: an in-flight writer's freshly staged file is protected by the
    // default window even though no manifest references it
    val staged = new java.io.File(dir, "data/inflight-uuid")
    staged.mkdirs()
    val stagedFile = new java.io.File(staged, "part-0.parquet")
    java.nio.file.Files.write(stagedFile.toPath, Array[Byte](1, 2, 3))
    Manifest.vacuum(spark, dir, keepVersions = 2) // default graceMs = 1h
    assert(stagedFile.exists(), "grace window must protect fresh staged files")
    // with grace disabled it is collectable
    Manifest.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    assert(!stagedFile.exists())
    assert(intercept[IllegalArgumentException] {
      Manifest.vacuum(spark, dir, keepVersions = 0)
    }.getMessage.contains("retain"))
  }

  test("maintainAggregate: incremental state == full recompute through " +
    "append/upsert/delete/compact; folds only churn") {
    val tmp = java.nio.file.Files.createTempDirectory("mfivm").toString
    val src = s"$tmp/src"
    val agg = s"$tmp/agg"

    def recompute() = Manifest.read(spark, src)
      .groupBy("g").agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(38,6)").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .toSet
    def state() = Manifest.read(spark, agg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .toSet
    def maintain() = Manifest.maintainAggregate(
      spark, src, agg, Seq("g"), Seq("v"))

    // bootstrap: full aggregate, source version recorded
    Manifest.overwrite(Seq(("a", 1.0), ("a", 2.0), ("b", 10.0))
      .toDF("g", "v"), src)
    maintain()
    assert(state() == recompute())
    assert(Manifest.lastProp(spark, agg, "agg.src.version").contains("1"))

    // append: only the appended files churn, and the fold matches
    val vBefore = Manifest.latestVersion(spark, src)
    Manifest.append(Seq(("b", 5.0), ("c", 7.0)).toDF("g", "v"), src)
    val (added, removed) = Manifest.churnedFiles(
      spark, src, vBefore, Manifest.latestVersion(spark, src))
    assert(added.nonEmpty && removed.isEmpty,
      "append churn must be add-only")
    maintain()
    assert(state() == recompute())

    // upsert rewrites some rows (old files −, new files +)
    Manifest.upsert(Seq(("a", 100.0)).toDF("g", "v"), src, Seq("g"), "v")
    maintain()
    assert(state() == recompute())

    // delete an entire group → its state row disappears (count 0 dropped)
    Manifest.delete(spark, src, col("g") === "c")
    maintain()
    assert(state() == recompute())
    assert(!state().exists(_._1 == "c"))

    // compaction churns every file but the net fold is a no-op
    Manifest.compact(spark, src)
    val stBefore = state()
    maintain()
    assert(state() == stBefore && state() == recompute())

    // source unchanged → no new state commit
    val aggV = Manifest.latestVersion(spark, agg)
    assert(maintain() == aggV)
    assert(Manifest.latestVersion(spark, agg) == aggV)
  }
}
