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
