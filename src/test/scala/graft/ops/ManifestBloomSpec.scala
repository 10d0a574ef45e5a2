package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-sidecar point lookups and manifest-only row counts.
  *
  * The fixture deliberately HASH-scatters the key across files so min/max
  * bounds cannot prune (every file's [min,max] spans the domain) — the
  * regime blooms exist for.
  */
class ManifestBloomSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  private def scattered(n: Long, parts: Int) =
    spark.range(0, n).toDF("id")
      .withColumn("v", col("id") % 7)
      .repartition(parts, col("id")) // hash: every file spans ~the full id range

  test("bloom prunes point lookups min/max cannot, and results match a full scan") {
    val dir = tmp("mfb_point")
    Manifest.appendWithBloom(scattered(5000, 8), dir, Seq("id"))
    val total = Manifest.read(spark, dir).inputFiles.length
    assert(total == 8)
    // unique key → exactly 1 true file; fpp=0.01 over 7 others adds ~0
    val keep = Manifest.pointCandidates(spark, dir, "id", 1234L)
    assert(keep.nonEmpty && keep.size <= 2,
      s"bloom should prune ~7 of 8 files, kept ${keep.size}")
    val viaPoint = Manifest.readPoint(spark, dir, "id", 1234L).collect().toSeq
    val viaScan = Manifest.read(spark, dir).filter(col("id") === 1234L).collect().toSeq
    assert(viaPoint == viaScan && viaPoint.size == 1)
  }

  test("string keys hash as strings; missing keys may prune to zero files") {
    val dir = tmp("mfb_str")
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("k", concat(lit("user_"), col("id")))
      .repartition(6, col("id"))
    Manifest.appendWithBloom(df, dir, Seq("k"))
    val hit = Manifest.readPoint(spark, dir, "k", "user_42").collect()
    assert(hit.length == 1 && hit.head.getAs[String]("k") == "user_42")
    // absent key: every bloom should reject it (up to fpp) and the read
    // must return no rows either way
    assert(Manifest.readPoint(spark, dir, "k", "user_9999999").count() == 0)
  }

  test("blooms carry across appends; unbloomed files are read, not pruned") {
    val dir = tmp("mfb_carry")
    Manifest.appendWithBloom(scattered(1000, 4), dir, Seq("id"))
    // second batch WITHOUT blooms: its files must never be pruned
    Manifest.append(spark.range(10000, 11000).toDF("id")
      .withColumn("v", col("id") % 7).repartition(3, col("id")), dir)
    val keep = Manifest.pointCandidates(spark, dir, "id", 10500L)
    // all 3 unbloomed files survive; the 4 bloomed ones reject the key
    assert(keep.size >= 3 && keep.size <= 4)
    assert(Manifest.readPoint(spark, dir, "id", 10500L).count() == 1)
    assert(Manifest.readPoint(spark, dir, "id", 500L).count() == 1)
  }

  /** Files the executed plan's parquet scan actually read (fresh Dataset
    * required — listing is cached per plan instance).
    */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case p if p.nodeName.startsWith("Scan") && p.metrics.contains("numFiles") => p
    }.map(_.metrics("numFiles").value).sum
  }

  test("a plain equality filter on table() prunes files through blooms") {
    val dir = tmp("mfb_decl")
    Manifest.appendWithBloom(scattered(5000, 8), dir, Seq("id"))
    // hash-scattered: every file's [min,max] spans the domain, so this
    // pruning can only come from the bloom sidecars
    val pruned = scannedFiles(
      Manifest.table(spark, dir).filter(col("id") === 1234L))
    assert(pruned <= 2, s"bloom should prune ~7 of 8 files, scanned $pruned")
    val full = scannedFiles(Manifest.table(spark, dir).filter(col("v") === 3L))
    assert(full == 8, "no bloom on v → no pruning")
    // IN-lists prune to the union of admitted files
    val inPruned = scannedFiles(
      Manifest.table(spark, dir).filter(col("id").isin(10L, 4321L)))
    assert(inPruned <= 4, s"IN (2 keys) should keep ≲2 files, scanned $inPruned")
    // and the rows are right
    assert(Manifest.table(spark, dir).filter(col("id") === 1234L).count() == 1)
  }

  test("SQL through the graft-manifest format bloom-prunes equality predicates") {
    val dir = tmp("mfb_sql")
    Manifest.appendWithBloom(scattered(3000, 6), dir, Seq("id"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mfb_sql_v " +
      s"USING `graft-manifest` OPTIONS (path '$dir')")
    val df = spark.sql("SELECT id, v FROM mfb_sql_v WHERE id = 777")
    assert(scannedFiles(df) <= 2)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(777L))
  }

  test("writer API: bloom.cols option builds sidecars through the format") {
    val dir = tmp("mfb_writer")
    scattered(2000, 5).write.format("graft-manifest")
      .option("bloom.cols", "id").option("stats.cols", "v")
      .mode("append").save(dir)
    val pruned = scannedFiles(Manifest.table(spark, dir).filter(col("id") === 42L))
    assert(pruned <= 2, s"writer-built blooms should prune, scanned $pruned")
    assert(Manifest.table(spark, dir).filter(col("id") === 42L).count() == 1)
  }

  test("countRows answers from the manifest without scanning") {
    val dir = tmp("mfb_count")
    Manifest.append(scattered(3000, 4), dir)
    Manifest.append(scattered(500, 2), dir)
    assert(Manifest.countRows(spark, dir) == 3500)
    assert(Manifest.countRows(spark, dir, version = 1) == 3000)
    // row counts survive an upsert's partition-carrying commit
    val up = spark.range(0, 10).toDF("id").withColumn("v", lit(99L))
    Manifest.upsert(up, dir, Seq("id"), orderCol = "v")
    assert(Manifest.countRows(spark, dir) ==
      Manifest.read(spark, dir).count())
  }

  test("compaction rebuilds blooms for its rewritten files") {
    val dir = tmp("mfb_compact")
    Manifest.appendWithBloom(scattered(1500, 5), dir, Seq("id"))
    Manifest.appendWithBloom(scattered(1500, 5).withColumn("id", col("id") + 10000), dir, Seq("id"))
    Manifest.compact(spark, dir, targetFileBytes = 1L << 30) // → 1 file
    // the compacted file is the only file, and it must carry a bloom again
    val keepHit = Manifest.pointCandidates(spark, dir, "id", 10042L)
    assert(keepHit.size == 1)
    // absent keys: the rebuilt bloom rejects all but ~fpp of them (a
    // single-key assert would flake on the 1% false-positive rate)
    val fpKept = (0 until 100).map(i => 500000L + i * 13)
      .count(k => Manifest.pointCandidates(spark, dir, "id", k).nonEmpty)
    assert(fpKept <= 10, s"rebuilt bloom kept $fpKept/100 absent keys (fpp=0.01)")
    assert(Manifest.readPoint(spark, dir, "id", 10042L).count() == 1)
  }

  test("vacuum removes dropped files' bloom sidecars with them") {
    val dir = tmp("mfb_vac")
    Manifest.appendWithBloom(scattered(500, 2), dir, Seq("id"))
    Manifest.overwrite(scattered(100, 1), dir) // v1's files now dead
    Manifest.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) buf += it.next().getPath.getName
      buf.toSeq
    }
    assert(!leftovers.exists(_.contains(".parquet.bloom.")),
      s"sidecars of vacuumed files must be deleted, found: $leftovers")
    assert(Manifest.read(spark, dir).count() == 100)
  }
}
