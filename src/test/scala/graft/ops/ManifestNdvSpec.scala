package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file HLL cardinality sketches (Iceberg's puffin idea, per data
  * file): ANALYZE once, then answer approximate NDV from metadata alone.
  * Pins: estimate within sketch error of exact; incremental analyze only
  * sketches new files; un-sketched files fall back to a scan of just
  * those files; declarations and sidecars survive restore and die with
  * their files under vacuum.
  */
class ManifestNdvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  test("analyzeNdv + approxDistinct answer NDV from sidecars within tolerance") {
    val dir = tmp("ndv")
    // 3 files, ids overlap across files: true distinct = 7000 (0..6999)
    for (lo <- Seq(0L, 2000L, 4000L))
      Manifest.append(spark.range(lo, lo + 3000).toDF("id")
        .withColumn("s", concat(lit("u"), col("id") % 700)).coalesce(1), dir)
    val v = Manifest.analyzeNdv(spark, dir, Seq("id", "s"))
    assert(v == 4)
    // re-running with nothing missing is a version no-op
    assert(Manifest.analyzeNdv(spark, dir, Seq("id", "s")) == 4)
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 7000.0) <= 7000 * 0.05, s"est=$est")
    val estS = Manifest.approxDistinct(spark, dir, "s")
    assert(math.abs(estS - 700.0) <= 700 * 0.05, s"estS=$estS")
    // sidecars exist for every (file, col)
    val snapFiles = Manifest.tableInfo(spark, dir).entries.map(_._1)
    snapFiles.foreach { f =>
      assert(new java.io.File(dir, f + ".ndv.id").exists())
      assert(new java.io.File(dir, f + ".ndv.s").exists())
    }
  }

  test("incremental analyze sketches only new files; fallback covers the rest") {
    val dir = tmp("ndv2")
    Manifest.append(spark.range(0, 1000).toDF("id").coalesce(1), dir)
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    // new append has no sketch yet — estimate still correct via fallback
    Manifest.append(spark.range(1000, 2000).toDF("id").coalesce(1), dir)
    val estFallback = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(estFallback - 2000.0) <= 2000 * 0.05, s"est=$estFallback")
    // analyze again: only the missing file gets a sidecar; estimate holds
    val before = new java.io.File(dir, "data").listFiles().length
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    assert(new java.io.File(dir, "data").listFiles().length == before)
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 2000.0) <= 2000 * 0.05, s"est=$est")
    // time travel: the first version's estimate sees only its file
    val est1 = Manifest.approxDistinct(spark, dir, "id", version = 1)
    assert(math.abs(est1 - 1000.0) <= 1000 * 0.05, s"est1=$est1")
  }

  test("analyzeQuantiles + approxQuantiles answer percentiles from sidecars") {
    val dir = tmp("kll")
    // two files over uniform 0..9999: p50 ≈ 5000, p90 ≈ 9000
    for (lo <- Seq(0L, 5000L))
      Manifest.append(spark.range(lo, lo + 5000).toDF("id")
        .withColumn("x", col("id").cast("double")).coalesce(1), dir)
    val v = Manifest.analyzeQuantiles(spark, dir, Seq("x"))
    assert(v == 3)
    assert(Manifest.analyzeQuantiles(spark, dir, Seq("x")) == 3) // no-op
    val Seq(p50, p90) = Manifest.approxQuantiles(spark, dir, "x", Seq(0.5, 0.9))
    assert(math.abs(p50 - 5000.0) <= 10000 * 0.02, s"p50=$p50")
    assert(math.abs(p90 - 9000.0) <= 10000 * 0.02, s"p90=$p90")
    // un-analyzed append folds in via the fallback scan of just its file
    Manifest.append(spark.range(10000, 20000).toDF("id")
      .withColumn("x", col("id").cast("double")).coalesce(1), dir)
    val Seq(np50) = Manifest.approxQuantiles(spark, dir, "x", Seq(0.5))
    assert(math.abs(np50 - 10000.0) <= 20000 * 0.02, s"np50=$np50")
    // time travel: the 2-file version's quantiles unchanged
    val Seq(tp50) = Manifest.approxQuantiles(spark, dir, "x", Seq(0.5),
      version = 3)
    assert(math.abs(tp50 - 5000.0) <= 10000 * 0.02, s"tp50=$tp50")
  }

  test("writer options ndv.cols/kll.cols run the incremental analyze on write") {
    val dir = tmp("wopt")
    spark.range(0, 1000).toDF("id").withColumn("x", col("id").cast("double"))
      .coalesce(2).write.format("graft-manifest")
      .option("ndv.cols", "id").option("kll.cols", "x").save(dir)
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 1000.0) <= 1000 * 0.05, s"est=$est")
    val Seq(p50) = Manifest.approxQuantiles(spark, dir, "x", Seq(0.5))
    assert(math.abs(p50 - 500.0) <= 1000 * 0.02, s"p50=$p50")
    Manifest.tableInfo(spark, dir).entries.foreach { case (rel, _) =>
      assert(new java.io.File(dir, rel + ".ndv.id").exists())
      assert(new java.io.File(dir, rel + ".kll.x").exists())
    }
  }

  test("distributed sidecar merge equals the driver-loop merge") {
    val dir = tmp("dist")
    for (lo <- Seq(0L, 3000L, 6000L))
      Manifest.append(spark.range(lo, lo + 3000).toDF("id")
        .withColumn("x", col("id").cast("double")).coalesce(2), dir)
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    Manifest.analyzeQuantiles(spark, dir, Seq("x"))
    val driverEst = Manifest.approxDistinct(spark, dir, "id")
    val info = Manifest.tableInfo(spark, dir)
    val root = info.root
    // HLL: distributed partial-merge over the same sidecars → same union
    val hllBytes = Manifest.mergeSidecarsDistributed(spark, root,
      info.entries.map { case (rel, _) => Manifest.ndvSidecar(rel, "id") },
      Manifest.hllMergeBytes(12)).get
    val distEst = org.apache.datasketches.hll.HllSketch.heapify(hllBytes)
      .getEstimate
    assert(math.abs(distEst - driverEst) < 1e-6,
      s"driver=$driverEst distributed=$distEst")
    // KLL: same for the quantile sketches
    val Seq(driverP50) = Manifest.approxQuantiles(spark, dir, "x", Seq(0.5))
    val kllBytes = Manifest.mergeSidecarsDistributed(spark, root,
      info.entries.map { case (rel, _) => Manifest.kllSidecar(rel, "x") },
      Manifest.kllMergeBytes(200)).get
    // KLL compaction is randomized, so merge ORDER shifts the estimate
    // within rank error — assert both land on the true median ±2% rank
    val distP50 = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(kllBytes)).getQuantile(0.5)
    assert(math.abs(distP50 - 4500.0) <= 9000 * 0.02 &&
      math.abs(driverP50 - 4500.0) <= 9000 * 0.02,
      s"driver=$driverP50 distributed=$distP50")
  }

  test("psiFromSketches alarms on a real shift, stays quiet on none") {
    val dir = tmp("psi")
    // v1: uniform 0..1000 (+KLL at v2)
    Manifest.append(spark.range(0, 4000).toDF("id")
      .withColumn("x", (col("id") % 1000).cast("double")).coalesce(2), dir)
    Manifest.analyzeQuantiles(spark, dir, Seq("x"))
    // v3: append a shifted cohort 2000..3000 (+KLL at v4)
    Manifest.append(spark.range(0, 4000).toDF("id")
      .withColumn("x", (col("id") % 1000 + 2000).cast("double")).coalesce(2), dir)
    Manifest.analyzeQuantiles(spark, dir, Seq("x"))
    val shifted = Manifest.psiFromSketches(spark, dir, "x", 2, 4)
    assert(shifted.psi > 0.2, s"expected drift alarm, psi=${shifted.psi}")
    assert(shifted.lo == 0.0 && shifted.hi == 2999.0) // exact min/max
    // same distribution twice → no alarm
    val dir2 = tmp("psi2")
    for (_ <- 1 to 2) {
      Manifest.append(spark.range(0, 4000).toDF("id")
        .withColumn("x", (col("id") % 1000).cast("double")).coalesce(2), dir2)
      Manifest.analyzeQuantiles(spark, dir2, Seq("x"))
    }
    val same = Manifest.psiFromSketches(spark, dir2, "x", 2, 4)
    assert(math.abs(same.psi) < 0.05, s"expected no drift, psi=${same.psi}")
  }

  test("declarations survive restore; vacuum collects sidecars with their file") {
    val dir = tmp("ndv3")
    Manifest.append(spark.range(0, 500).toDF("id").coalesce(1), dir)   // v1
    Manifest.analyzeNdv(spark, dir, Seq("id"))                          // v2
    Manifest.overwrite(spark.range(0, 50).toDF("id").coalesce(1), dir) // v3
    Manifest.restore(spark, dir, 2)                                     // v4
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 500.0) <= 500 * 0.05, s"est=$est")
    // the overwritten (v3) file and any sidecars vacuum away; the restored
    // version's data file AND its ndv sidecar survive
    Manifest.vacuum(spark, dir, keepVersions = 1, graceMs = 0)
    assert(math.abs(Manifest.approxDistinct(spark, dir, "id") - 500.0)
      <= 500 * 0.05)
    val files = Manifest.tableInfo(spark, dir).entries.map(_._1)
    files.foreach { f =>
      assert(new java.io.File(dir, f + ".ndv.id").exists())
    }
  }

  test("separate analyzes of different columns UNION declarations (OCC-safe merge)") {
    // analyzeNdv now declares only its own cols and relies on commit()'s
    // per-file union against the rebased snapshot — the same code path a
    // CONCURRENT analyze of a different column exercises on OCC rebase.
    // With an overwrite merge, the second analyze would clobber the
    // first's declaration and approxDistinct("id") would fall back to a
    // full scan (silently); the manifest text pins both declarations.
    val dir = tmp("ndvu")
    Manifest.append(spark.range(0, 1000).toDF("id")
      .withColumn("s", concat(lit("u"), col("id") % 50)).coalesce(1), dir)
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    Manifest.analyzeNdv(spark, dir, Seq("s"))
    val v = Manifest.tableInfo(spark, dir) // resolves latest complete version
    val manifests = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_manifest.v")).sortBy(
        f => f.getName.stripPrefix("_manifest.v").toLong)
    val ndvLines = scala.io.Source.fromFile(manifests.last).getLines()
      .filter(_.startsWith("#ndv ")).toSeq
    assert(ndvLines.nonEmpty, "no #ndv declarations in the head manifest")
    ndvLines.foreach { l =>
      val cols = l.split(' ').last.split(',').toSet
      assert(cols == Set("id", "s"), s"declaration lost a column: $l")
    }
    // both estimates answer from sidecars on the declared path
    assert(math.abs(Manifest.approxDistinct(spark, dir, "id") - 1000.0) <= 50)
    assert(math.abs(Manifest.approxDistinct(spark, dir, "s") - 50.0) <= 5)
    v.entries.nonEmpty
  }
}
