package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The POINTER-COMMIT index layout (object-store-atomic compaction): the
  * live organized generation is named by a tiny `organized.current` file
  * replaced atomically, consumed inputs are garbage-collected one full
  * compaction cycle late, and therefore a reader racing ONE compaction
  * never needs the missing-file retry at all — the property the
  * rename-swap layout cannot give on S3-style stores (docs/SCALE.md).
  */
class LshIndexPointerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long) = (i, s"unique tokens u${i}a u${i}b u${i}c u${i}d u${i}e")
  private val allPrefixes: Seq[String] =
    (0 until 256).map(i => f"p$i%02x")

  private def readAllNoRetry(idx: String): Set[Long] =
    Dedup.readIndexPruned(spark, idx, allPrefixes)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  test("migration, append visibility, and duplicate-free generations") {
    val idx = java.nio.file.Files.createTempDirectory("lshptr").toString + "/idx"
    Dedup.buildLshIndex((0L until 4L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    (4L until 6L).foreach(i => Dedup.appendLshIndex(
      Seq(doc(i)).toDF("doc_id", "text"), "doc_id", "text", 8, 2, idx))
    // migrate rename layout → pointer layout
    Dedup.compactLshIndex(spark, idx, pointerCommit = true)
    assert(new java.io.File(idx, "organized.current").exists)
    assert(readAllNoRetry(idx) == (0L until 6L).toSet)
    // the consumed rename-layout organized/ dir is GC'd one cycle LATE
    assert(new java.io.File(idx, "organized").exists,
      "deferred GC should keep the consumed layout for one full cycle")
    // once on the pointer layout, plain compact calls stay on it
    (6L until 8L).foreach(i => Dedup.appendLshIndex(
      Seq(doc(i)).toDF("doc_id", "text"), "doc_id", "text", 8, 2, idx))
    Dedup.compactLshIndex(spark, idx)
    assert(readAllNoRetry(idx) == (0L until 8L).toSet)
    Dedup.compactLshIndex(spark, idx)
    assert(!new java.io.File(idx, "organized").exists,
      "two cycles on: the migrated-away layout should be GC'd")
    // generations never accumulate duplicate band rows (already-consumed
    // delta files are excluded from every re-fold)
    val v = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("organized-v"))
      .map(_.stripPrefix("organized-v").toLong).max
    val gen = spark.read.parquet(s"$idx/organized-v$v")
    assert(gen.count() == gen.distinct().count(),
      "re-folding consumed delta files would duplicate organized rows")
    // probes through the public API agree
    val incoming = (0L until 8L).map(doc).toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id") + 1000L)
    val probed = Dedup.probeLshIndex(spark, idx, incoming,
      "doc_id", "text", 8, 2).collect().map(_.getLong(1)).toSet
    assert((0L until 8L).toSet.subsetOf(probed))
  }

  test("a pre-listed read survives ONE full compaction with ZERO retries") {
    // The design guarantee, pinned DETERMINISTICALLY (the rename layout
    // cannot pass this): list/resolve the index state, run an ENTIRE
    // compaction (fold + pointer swap + deferred GC), then execute the
    // pre-listed read — it must succeed without any retry because the
    // resolved generation and the listed delta files are GC'd one full
    // cycle late. Only a reader straddling TWO compactions retries.
    val idx = java.nio.file.Files.createTempDirectory("lshptr2").toString + "/idx"
    Dedup.buildLshIndex((0L until 6L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.compactLshIndex(spark, idx, pointerCommit = true)
    Dedup.appendLshIndex(Seq(doc(6L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    // reader resolves NOW: pointer gen v1 + the delta batch of doc 6
    val preListed = Dedup.readIndexPruned(spark, idx, allPrefixes)
    // a full compaction commits v2 (folding doc 6's delta) and GCs
    // everything v0-era; the pre-listed state must remain readable
    Dedup.compactLshIndex(spark, idx)
    val seen = preListed.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((0L until 7L).toSet.subsetOf(seen), s"pre-listed read lost rows: $seen")
    // and a concurrent soak through the PUBLIC probe (bounded retry
    // allowed there) for end-to-end liveness under racing compactions
    val writer = Future {
      (7L until 11L).foreach { i =>
        Dedup.appendLshIndex(Seq(doc(i)).toDF("doc_id", "text"),
          "doc_id", "text", 8, 2, idx)
        Dedup.compactLshIndex(spark, idx)
      }
    }
    val incoming = (0L until 11L).map(doc).toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id") + 1000L)
    while (!writer.isCompleted) {
      val probed = Dedup.probeLshIndex(spark, idx, incoming,
        "doc_id", "text", 8, 2).collect().map(_.getLong(1)).toSet
      assert((0L until 7L).toSet.subsetOf(probed), s"probe lost rows: $probed")
    }
    Await.result(writer, 180.seconds)
    val finalSeen = readAllNoRetry(idx)
    assert(finalSeen == (0L until 11L).toSet, s"final state wrong: $finalSeen")
  }

  test("STEADY STATE: a pre-listed read survives the v3+ compaction whose " +
    "GC deletes older generations' consumed delta files") {
    // The v1→v2 window has an EMPTY deferred-GC set, so the original
    // one-compaction test could not catch this: a reader must exclude
    // delta files recorded as consumed by its resolved generation's
    // ancestors — those are exactly the files the NEXT compaction's GC
    // deletes. Sequence: D1 consumed by v1 is still on disk at ptr=v2
    // (GC'd only when v3 commits); a reader listing D1 would throw
    // FileNotFoundException after racing ONE compaction.
    val idx = java.nio.file.Files.createTempDirectory("lshptr4").toString + "/idx"
    Dedup.buildLshIndex((0L until 4L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.appendLshIndex(Seq(doc(4L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)                           // delta D1
    Dedup.compactLshIndex(spark, idx, pointerCommit = true)  // v1 consumes D1
    Dedup.appendLshIndex(Seq(doc(5L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)                           // delta D2
    Dedup.compactLshIndex(spark, idx)                        // v2; D1 still on disk
    assert(new java.io.File(idx, "delta").listFiles().exists(
        d => d.isDirectory && d.listFiles().exists(_.getName.endsWith(".parquet"))),
      "precondition: consumed-but-not-yet-GCd delta files must exist at ptr=v2")
    val preListed = Dedup.readIndexPruned(spark, idx, allPrefixes)
    Dedup.appendLshIndex(Seq(doc(6L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.compactLshIndex(spark, idx)                        // v3: GC deletes D1 + v1
    val seen = preListed.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(seen == (0L until 6L).toSet,
      s"pre-listed steady-state read must return its resolved state: $seen")
    assert(readAllNoRetry(idx) == (0L until 7L).toSet)
  }

  test("quiescent compaction skips the O(index) rewrite but still GCs") {
    // A maintenance cron on an idle index must not rewrite the whole
    // organized generation every run — only the deferred GC runs, with
    // the same one-cycle grace as the commit path (gens ≤ ptr-1).
    val idx = java.nio.file.Files.createTempDirectory("lshptr3").toString + "/idx"
    Dedup.buildLshIndex((0L until 4L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.compactLshIndex(spark, idx, pointerCommit = true) // v1
    Dedup.appendLshIndex(Seq(doc(4L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.compactLshIndex(spark, idx)                       // v2; v1 kept (grace)
    def gens: Set[Long] = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("organized-v"))
      .map(_.stripPrefix("organized-v").toLong).toSet
    assert(gens == Set(1L, 2L))
    val ptrBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "organized.current"))
    val v2Files = new java.io.File(idx, "organized-v2").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    Dedup.compactLshIndex(spark, idx) // quiescent: nothing new to fold
    assert(gens == Set(2L), "quiescent run should GC the superseded gen")
    assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(idx, "organized.current")).sameElements(ptrBytes),
      "quiescent run must not move the pointer")
    val v2After = new java.io.File(idx, "organized-v2").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(v2After == v2Files, "quiescent run must not rewrite the live gen")
    assert(readAllNoRetry(idx) == (0L until 5L).toSet)
  }
}
