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
