package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Serializability of concurrent manifest writers: the OCC claim loop
  * (`_manifest.v<next>` created atomically, rebase on collision) must
  * make any interleaving equivalent to SOME serial order — no lost
  * appends, no resurrected deletes, no constraint-bypassing commits.
  */
/** A local-disk-backed FileSystem registered under a foreign scheme with
  * NO AbstractFileSystem (FileContext) binding — the shape of an s3a-like
  * store as seen by the manifest commit protocol's capability check.
  */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: java.net.URI = java.net.URI.create("graftmock://host")
}

class ManifestConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ds"

  test("concurrent appends + MOR delete serialize: no lost update, no resurrection") {
    for (round <- 1 to 5) {
      val dir = tmp(s"occ$round")
      Manifest.append(spark.range(0, 100).toDF("id")
        .withColumn("v", col("id") * 10).coalesce(1), dir)
      // three writers race: two appends of disjoint key ranges and a
      // merge-on-read delete of half the seeded rows
      val fs = Seq(
        Future(Manifest.append(spark.range(1000, 1050).toDF("id")
          .withColumn("v", col("id") * 10).coalesce(1), dir)),
        Future(Manifest.append(spark.range(2000, 2050).toDF("id")
          .withColumn("v", col("id") * 10).coalesce(1), dir)),
        Future(Manifest.deleteMergeOnRead(spark, dir, col("id") < 50)))
      Await.result(Future.sequence(fs), 120.seconds)
      val ids = Manifest.read(spark, dir).select("id").as[Long].collect().toSet
      // serializable final state regardless of commit order: the delete
      // vectors rows of the SEEDED file (both appends add disjoint files)
      val expected = (50L until 100L).toSet ++ (1000L until 1050L) ++ (2000L until 2050L)
      assert(ids == expected, s"round $round: lost update or resurrection")
      // every writer's commit claimed its own version: 1 seed + 3 writers
      assert(Manifest.latestVersion(spark, dir) == 4L, s"round $round")
    }
  }

  test("a writer stalled indefinitely between render and publish never loses its batch") {
    // The round-13 lost update: the old claim-then-write protocol treated a
    // writer silent >5s as crashed and rebased past it; when it woke and
    // closed its manifest, its files were silently gone. With the atomic
    // no-replace publish there is no grace window AT ALL: the stalled
    // writer simply loses the publish race and rebases. Latches make the
    // interleaving deterministic — the stall is unbounded wall-clock-wise.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val dir = tmp("stall")
    Manifest.append(spark.range(0, 100).toDF("id").coalesce(1), dir) // v1
    val inStall = new CountDownLatch(1)
    val fastDone = new CountDownLatch(1)
    val slow = Future {
      Manifest.commitStallHook.set { () =>
        inStall.countDown()
        assert(fastDone.await(120, TimeUnit.SECONDS), "latch timeout")
      }
      try Manifest.append(spark.range(1000, 1050).toDF("id").coalesce(1), dir)
      finally Manifest.commitStallHook.remove()
    }
    assert(inStall.await(120, TimeUnit.SECONDS),
      "slow writer never reached its publish attempt")
    // slow writer is now frozen holding a fully rendered v2 manifest;
    // a competitor claims v2 out from under it
    val vFast = Manifest.append(spark.range(2000, 2050).toDF("id").coalesce(1), dir)
    fastDone.countDown()
    val vSlow = Await.result(slow, 120.seconds)
    assert(vFast == 2L && vSlow == 3L,
      s"expected the stalled writer to rebase to v3, got fast=$vFast slow=$vSlow")
    val ids = Manifest.read(spark, dir).select("id").as[Long].collect().toSet
    val expected = (0L until 100L).toSet ++ (1000L until 1050L) ++ (2000L until 2050L)
    assert(ids == expected, "stalled writer's batch was lost or duplicated")
  }

  test("stress: 25 racing rounds under background CPU load — no lost update") {
    // The round-13 failure only fired on a saturated machine (409/410 runs
    // green in isolation). Reproduce that pressure: 16 spin threads while
    // three writers race per round, 25 rounds.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    (1 to 16).foreach { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) x = x * 6364136223846793005L + 1442695040888963407L
        if (x == 42L) println(x) // keep the loop observable to the JIT
      })
      t.setDaemon(true); t.start()
    }
    try {
      for (round <- 1 to 25) {
        val dir = tmp(s"stress$round")
        Manifest.append(spark.range(0, 10).toDF("id").coalesce(1), dir)
        val fs = Seq(
          Future(Manifest.append(spark.range(100, 110).toDF("id").coalesce(1), dir)),
          Future(Manifest.append(spark.range(200, 210).toDF("id").coalesce(1), dir)),
          Future(Manifest.append(spark.range(300, 310).toDF("id").coalesce(1), dir)))
        Await.result(Future.sequence(fs), 180.seconds)
        val ids = Manifest.read(spark, dir).select("id").as[Long].collect().toSet
        val expected = (0L until 10L).toSet ++ (100L until 110L) ++
          (200L until 210L) ++ (300L until 310L)
        assert(ids == expected, s"round $round: lost update under load")
        assert(Manifest.latestVersion(spark, dir) == 4L, s"round $round")
      }
    } finally stop.set(true)
  }

  test("a scheme with no atomic no-replace primitive is REFUSED at first " +
    "commit, not silently check-then-act") {
    // The filesystem contract (Manifest class doc): local link(2), or
    // FileContext.rename without OVERWRITE. A scheme with neither — here
    // a local-backed FS registered under a scheme with no
    // AbstractFileSystem binding, the s3a-shaped deployment — must fail
    // the COMMIT loudly; data files may stage, but no version publishes.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftmock.impl", classOf[MockSchemeFs].getName)
    val dir = "graftmock://host" +
      java.nio.file.Files.createTempDirectory("mockfs").toString + "/ds"
    val e = intercept[UnsupportedOperationException] {
      Manifest.append(spark.range(0, 5).toDF("id").coalesce(1), dir)
    }
    assert(e.getMessage.contains("atomic no-replace") &&
      e.getMessage.contains("graftmock"), e.getMessage)
    assert(Manifest.latestVersion(spark, dir) == 0L,
      "refused commit must leave no committed version")
  }

  test("append racing addConstraint cannot publish violating rows (TOCTOU)") {
    var bothSucceeded = 0
    for (round <- 1 to 5) {
      val dir = tmp(s"toctou$round")
      Manifest.append(spark.range(0, 20).toDF("id")
        .withColumn("v", lit(1L)).coalesce(1), dir)
      // the appended batch violates the constraint being added concurrently
      val fAppend = Future(scala.util.Try(
        Manifest.append(spark.range(20, 30).toDF("id")
          .withColumn("v", lit(5000L)).coalesce(1), dir)))
      val fCheck = Future(scala.util.Try(
        Manifest.addConstraint(spark, dir, "v_small", "v < 1000")))
      val (ra, rc) = Await.result(fAppend.zip(fCheck), 120.seconds)
      // serializable outcomes only: append-then-constraint ⇒ addConstraint
      // fails on existing violations; constraint-then-append ⇒ the append
      // is refused inside commit's claim loop. Never both.
      if (ra.isSuccess && rc.isSuccess)
        bothSucceeded += 1
      // whatever happened, the head must satisfy every constraint it declares
      val cs = Manifest.constraints(spark, dir)
      cs.foreach { case (name, pred) =>
        val bad = Manifest.read(spark, dir)
          .filter(not(coalesce(expr(pred), lit(true)))).count()
        assert(bad == 0, s"round $round: head violates declared '$name'")
      }
    }
    assert(bothSucceeded == 0,
      s"append and addConstraint both succeeded $bothSucceeded times — " +
        "a violating batch published under the new constraint")
  }

  test("restore refuses to resurrect pre-constraint violating data") {
    val dir = tmp("restorec")
    Manifest.append(spark.range(0, 10).toDF("id")
      .withColumn("v", lit(5000L)).coalesce(1), dir)          // v1: violates
    Manifest.overwrite(spark.range(0, 10).toDF("id")
      .withColumn("v", lit(1L)).coalesce(1), dir)             // v2: clean
    Manifest.addConstraint(spark, dir, "v_small", "v < 1000") // v3
    val e = intercept[IllegalArgumentException] {
      Manifest.restore(spark, dir, 1L)
    }
    assert(e.getMessage.contains("v_small"))
    // the refused restore claimed no version and left the head intact
    assert(Manifest.latestVersion(spark, dir) == 3L)
    assert(Manifest.read(spark, dir).agg(max("v")).head.getLong(0) == 1L)
    // restoring to the clean version still works and carries the constraint
    assert(Manifest.restore(spark, dir, 2L) == 4L)
    assert(Manifest.constraints(spark, dir).contains("v_small"))
  }

  test("analyzeNdv on a second column keeps the first column's declarations") {
    val dir = tmp("ndvunion")
    Manifest.append(spark.range(0, 100).toDF("id")
      .withColumn("grp", col("id") % 7).coalesce(1), dir)
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    Manifest.analyzeNdv(spark, dir, Seq("grp"))
    // both estimates must answer from sidecars: stable under file deletion
    // of nothing — assert declarations directly via a fresh analyze no-op
    val before = Manifest.latestVersion(spark, dir)
    assert(Manifest.analyzeNdv(spark, dir, Seq("id")) == before,
      "id declaration was dropped by the grp analyze — sidecar re-analyzed")
    assert(Manifest.analyzeNdv(spark, dir, Seq("grp")) == before)
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 100.0) / 100.0 < 0.05)
  }

  test("analyzeQuantiles on a second column keeps the first's declarations") {
    val dir = tmp("kllunion")
    Manifest.append(spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2).coalesce(1), dir)
    Manifest.analyzeQuantiles(spark, dir, Seq("id"))
    Manifest.analyzeQuantiles(spark, dir, Seq("v"))
    val before = Manifest.latestVersion(spark, dir)
    assert(Manifest.analyzeQuantiles(spark, dir, Seq("id")) == before,
      "id KLL declaration was dropped by the v analyze")
    val p50 = Manifest.approxQuantiles(spark, dir, "id", Seq(0.5)).head
    assert(math.abs(p50 - 500.0) < 50.0)
  }

  test("sketches and facts survive a percent-encoded partition directory") {
    val dir = tmp("pctenc")
    // a string partition value with a space percent-encodes in the scan URI
    val df = Seq((1L, "a b", 10.0), (2L, "a b", 20.0), (3L, "plain", 30.0))
      .toDF("id", "cat", "v").withColumn("seq", lit(1L))
    Manifest.upsert(df, dir, Seq("id"), "seq", partitionCols = Seq("cat"))
    Manifest.analyzeNdv(spark, dir, Seq("id"))
    val est = Manifest.approxDistinct(spark, dir, "id")
    assert(math.abs(est - 3.0) < 0.5,
      s"got $est — encoded-dir file values were dropped from the sketch")
    Manifest.analyzeQuantiles(spark, dir, Seq("v"))
    val p = Manifest.approxQuantiles(spark, dir, "v", Seq(1.0)).head
    assert(p == 30.0, s"got $p")
  }
}
