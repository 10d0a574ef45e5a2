package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The IVF index's lifecycle machinery under concurrency (VERDICT r12
  * #2): the `_ivf_meta.json` operating point is now PUBLISHED through
  * [[AtomicPointer]] (write-tmp + rename-overwrite) instead of an
  * in-place truncate-and-write, so a reader loading the calibrated
  * probe width mid-recalibration sees the old value or the new one —
  * never a torn or absent sidecar; and a re-seeded rebuild commits
  * through immutable `gen-<n>` directories + an `index.current`
  * pointer with one-cycle deferred GC, so a reader holding the
  * previous generation keeps scanning intact files across a rebuild.
  */
class IvfIndexConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13 - 6).toFloat)))
    .toDF("vec_id", "embedding")

  test("operating-point reads racing recalibration publishes: no torn reads") {
    val dir = java.nio.file.Files.createTempDirectory("ivfmeta").toString
    val written = (1 to 50).map(i => 1 + (i % 7))
    Similarity.recordIvfMeta(spark, dir,
      s"""{"n_probe":${written.head},"recall_target":0.9,"k":5}""")
    val valid = written.toSet
    val writer = Future {
      written.foreach { np =>
        Similarity.recordIvfMeta(spark, dir,
          s"""{"n_probe":$np,"recall_target":0.9,"k":5}""")
      }
    }
    val readers = (1 to 2).map(_ => Future {
      (1 to 200).foreach { _ =>
        val got = Similarity.recordedNProbe(spark, dir)
        // every read resolves to a COMPLETE previously-written value —
        // a torn sidecar would come back None (absent) or fail the
        // n_probe parse after retries
        assert(got.exists(valid.contains),
          s"torn/invalid operating point read: $got")
      }
    })
    Await.result(Future.sequence(writer +: readers), 120.seconds)
    assert(Similarity.recordedNProbe(spark, dir).contains(written.last))
  }

  test("generation rebuild keeps the previous gen for in-flight readers") {
    val root = java.nio.file.Files.createTempDirectory("ivfgen").toString + "/ivf"
    val cal = corpus(40).filter(col("vec_id") >= 30)
    val g1 = Similarity.rebuildIvfIndexAuto(corpus(40), "vec_id", "embedding",
      root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9)
    assert(g1 == 1L)
    val (p1, cents1) = Similarity.loadIvfIndexCurrent(spark, root)
    assert(p1.endsWith("gen-1"))
    // the calibrated operating point travels with the generation
    val np1 = Similarity.recordedNProbe(spark, p1)
    assert(np1.nonEmpty, "rebuild with sampleQueries must record a sidecar")
    val q = corpus(40).filter(col("vec_id") < 4)
    def probe(path: String, cents: org.apache.spark.sql.DataFrame): Long =
      Similarity.probeIvfIndexBatch(spark, path, q, "vec_id", "embedding",
        cents, k = 3, nProbe = np1.get).count()
    val rows1 = probe(p1, cents1)
    assert(rows1 == 12L, s"4 queries x top-3 expected, got $rows1")

    // rebuild on a GROWN corpus: gen-2 publishes, gen-1 must survive
    // (one-cycle deferred GC) so the stale (p1, cents1) handle still
    // probes intact files
    val g2 = Similarity.rebuildIvfIndexAuto(corpus(60), "vec_id", "embedding",
      root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9)
    assert(g2 == 2L)
    assert(probe(p1, cents1) == rows1,
      "stale generation handle broke across a rebuild")
    val (p2, cents2) = Similarity.loadIvfIndexCurrent(spark, root)
    assert(p2.endsWith("gen-2"))
    assert(probe(p2, cents2) == 12L)

    // a third rebuild GCs gen-1 (older than the deferred cycle)
    val g3 = Similarity.rebuildIvfIndexAuto(corpus(60), "vec_id", "embedding",
      root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9)
    assert(g3 == 3L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-1")),
      "gen-1 should be GC'd once gen-3 publishes")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-2")),
      "one-cycle deferral must keep gen-2 while gen-3 is current")
  }

  test("STEADY STATE: a current-pointer reader races the rebuild whose GC " +
    "actually deletes an older generation — zero retries") {
    // The basic lifecycle test's first rebuild has an EMPTY deferred-GC
    // set (no gen N-2 exists), so it never exercises GC-under-reader at
    // all — the vacuously-true window the LSM index specs learned to pin
    // (r9 self-review). Here the reader resolves gen-2 while gens {1,2}
    // are live, then gen-3's rebuild runs CONCURRENTLY and its GC deletes
    // gen-1; every probe of the resolved handle — before, during, and
    // after that deletion, when gen-2 has become the OLDEST live
    // generation — must return identical rows with zero retries.
    val root = java.nio.file.Files.createTempDirectory("ivfgc").toString + "/ivf"
    val cal = corpus(40).filter(col("vec_id") >= 30)
    assert(Similarity.rebuildIvfIndexAuto(corpus(40), "vec_id", "embedding",
      root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9) == 1L)
    assert(Similarity.rebuildIvfIndexAuto(corpus(50), "vec_id", "embedding",
      root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9) == 2L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-1")),
      "precondition: the racing rebuild must have a NON-empty GC set")
    val (p2, cents2) = Similarity.loadIvfIndexCurrent(spark, root)
    assert(p2.endsWith("gen-2"))
    val np = Similarity.recordedNProbe(spark, p2).getOrElse(2)
    val q = corpus(40).filter(col("vec_id") < 4)
    def probeOnce(): Long =
      Similarity.probeIvfIndexBatch(spark, p2, q, "vec_id", "embedding",
        cents2, k = 3, nProbe = np).count()
    val before = probeOnce()
    assert(before == 12L, s"4 queries x top-3 expected, got $before")
    val rebuild = Future {
      Similarity.rebuildIvfIndexAuto(corpus(60), "vec_id", "embedding",
        root, sampleQueries = Some(cal), k = 3, recallTarget = 0.9)
    }
    var racing = 0
    while (!rebuild.isCompleted) {
      assert(probeOnce() == before,
        s"racing read at iteration $racing was disturbed by the rebuild")
      racing += 1
    }
    assert(Await.result(rebuild, 180.seconds) == 3L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-1")),
      "gen-3's publish must have GC'd gen-1 under the reader")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen-2")),
      "one-cycle deferral must keep the reader's generation")
    assert(probeOnce() == before,
      "read at the oldest live generation after the racing GC")
  }

  test("maintenance job runs the rebuild under the job lifecycle") {
    val root = java.nio.file.Files.createTempDirectory("ivfjob").toString + "/ivf"
    val job = new graft.jobs.IvfIndexMaintenanceJob(root,
      _ => corpus(40), kmeansIters = 0)
    val runner = new graft.jobs.JobRunner(spark,
      new graft.meta.DefaultsStore, new graft.meta.StatusTracker)
    runner.run(job, debug = true)
    val (p, cents) = Similarity.loadIvfIndexCurrent(spark, root)
    assert(p.endsWith("gen-1"))
    assert(cents.count() > 0)
  }
}
