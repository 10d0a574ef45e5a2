package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `_latest.hint` — the listing-free read path for version resolution
  * (the 100 TB metadata concern: a directory LIST per query vs one
  * pointer read + forward probe). The hint is ADVISORY: every test here
  * degrades it some way (stale, corrupt, missing, vacuumed, squatted
  * past) and `latestVersion` must still answer exactly what the listing
  * would.
  */
class ManifestHintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  private def hintFile(dir: String) = java.nio.file.Paths.get(dir, "_latest.hint")

  private def writeHint(dir: String, content: String): Unit = {
    java.nio.file.Files.write(hintFile(dir), content.getBytes("UTF-8"))
    // kill any checksum sidecar a Hadoop-API writer left for the old content
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._latest.hint.crc")): Unit
  }

  private def seed(dir: String, n: Int): Unit =
    (1 to n).foreach(i => Manifest.append(
      spark.range(i * 10, i * 10 + 5).toDF("id").coalesce(1), dir))

  test("every commit advertises itself: hint tracks the latest version") {
    val dir = tmp("hint1")
    seed(dir, 3)
    assert(java.nio.file.Files.exists(hintFile(dir)), "hint not published")
    assert(new String(java.nio.file.Files.readAllBytes(hintFile(dir)),
      "UTF-8").trim == "3")
    assert(Manifest.latestVersion(spark, dir) == 3L)
  }

  test("stale-low hint: forward probe recovers the true latest") {
    val dir = tmp("hint2")
    seed(dir, 4)
    writeHint(dir, "1") // racing-commit shape: hint lags arbitrarily
    assert(Manifest.latestVersion(spark, dir) == 4L)
    // read content must come from the TRUE latest, not the hinted version
    val ids = Manifest.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids == (1 to 4).flatMap(i => i * 10 until i * 10 + 5).map(_.toLong).toSet)
  }

  test("corrupt / missing / dangling hints fall back to the listing") {
    val dir = tmp("hint3")
    seed(dir, 2)
    writeHint(dir, "not-a-number")
    assert(Manifest.latestVersion(spark, dir) == 2L, "corrupt hint")
    writeHint(dir, "99") // names a version that does not exist
    assert(Manifest.latestVersion(spark, dir) == 2L, "dangling hint")
    java.nio.file.Files.delete(hintFile(dir))
    assert(Manifest.latestVersion(spark, dir) == 2L, "missing hint")
  }

  test("forward probe skips a legacy torn squatter instead of stopping at it") {
    val dir = tmp("hint4")
    seed(dir, 2)
    // a pre-atomic-publish crash left an incomplete manifest squatting v3
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_manifest.v3"),
      "#graft-manifest 1\npartial".getBytes("UTF-8"))
    // next commit must claim v4 (smallest free slot), and a low hint's
    // probe must step OVER the squatter to find it
    Manifest.append(spark.range(100, 105).toDF("id").coalesce(1), dir)
    writeHint(dir, "1")
    assert(Manifest.latestVersion(spark, dir) == 4L)
  }

  test("readers racing writers: latestVersion never goes backwards") {
    // the hint file is atomically REPLACED by every commit while readers
    // are mid-probe; a reader must see some committed version, and a
    // version sequence observed by one reader must be monotone
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = tmp("hintrace")
    Manifest.append(spark.range(0, 5).toDF("id").coalesce(1), dir)
    val writer = Future {
      (2 to 8).foreach(i => Manifest.append(
        spark.range(i * 10, i * 10 + 5).toDF("id").coalesce(1), dir))
    }
    var last = 0L
    while (!writer.isCompleted) {
      val v = Manifest.latestVersion(spark, dir)
      assert(v >= last, s"latestVersion went backwards: $last -> $v")
      last = v
    }
    Await.result(writer, 180.seconds)
    assert(Manifest.latestVersion(spark, dir) == 8L)
  }

  test("vacuum sweeps aged orphaned publish temps, spares fresh ones") {
    val dir = tmp("tmpsweep")
    seed(dir, 2)
    // a crashed writer's rendered-but-never-linked temp (aged) and a
    // "live" writer's fresh temp
    val aged = java.nio.file.Paths.get(dir, "._manifest.v3.tmp-deadbeef")
    val fresh = java.nio.file.Paths.get(dir, "._manifest.v3.tmp-cafebabe")
    java.nio.file.Files.write(aged, "partial".getBytes("UTF-8"))
    java.nio.file.Files.write(fresh, "partial".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(aged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200L * 1000))
    Manifest.vacuum(spark, dir, keepVersions = 2)
    assert(!java.nio.file.Files.exists(aged), "aged orphan temp not swept")
    assert(java.nio.file.Files.exists(fresh),
      "grace window must protect a live writer's temp")
    assert(Manifest.latestVersion(spark, dir) == 2L)
  }

  test("hint survives vacuum; a hand-rolled below-horizon hint falls back") {
    val dir = tmp("hint5")
    seed(dir, 4)
    Manifest.vacuum(spark, dir, keepVersions = 1)
    assert(Manifest.latestVersion(spark, dir) == 4L, "hint after vacuum")
    writeHint(dir, "1") // v1's manifest was vacuumed away
    assert(Manifest.latestVersion(spark, dir) == 4L, "vacuumed hint")
  }
}
