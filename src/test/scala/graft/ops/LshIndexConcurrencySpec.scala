package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The LSM band index under concurrency: compaction snapshots the delta
  * file list, folds it into the organized layout, and deletes ONLY the
  * consumed files — so appends racing the compaction land new delta
  * files that are never lost, and probes see either the old or the new
  * state (a probe racing the swap window itself may transiently
  * FileNotFound and is retried, exactly what the gate does; results are
  * never wrong).
  */
class LshIndexConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Long) = (i, s"unique tokens u${i}a u${i}b u${i}c u${i}d u${i}e")

  test("appends racing compaction lose no band rows; probes stay exact") {
    val idx = java.nio.file.Files.createTempDirectory("lshrace").toString + "/idx"
    Dedup.buildLshIndex((0L until 4L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    // accrete a delta tail worth compacting
    (4L until 8L).foreach(i => Dedup.appendLshIndex(
      Seq(doc(i)).toDF("doc_id", "text"), "doc_id", "text", 8, 2, idx))
    // race: one compaction vs four more appends vs a probing reader.
    // The probe retries on the transient swap-window FileNotFound — the
    // documented contract for concurrent readers.
    def probeAll(): Set[Long] = {
      val incoming = (0L until 16L).map(doc).toDF("doc_id", "text")
        .withColumn("doc_id", col("doc_id") + 1000L) // disjoint probe ids
      Dedup.retryFileGone(5)(
        Dedup.probeLshIndex(spark, idx, incoming,
          "doc_id", "text", 8, 2).collect().map(_.getLong(1)).toSet)
    }
    val fs = Seq(
      Future(Dedup.compactLshIndex(spark, idx)),
      Future((8L until 10L).foreach(i => Dedup.appendLshIndex(
        Seq(doc(i)).toDF("doc_id", "text"), "doc_id", "text", 8, 2, idx))),
      Future((10L until 12L).foreach(i => Dedup.appendLshIndex(
        Seq(doc(i)).toDF("doc_id", "text"), "doc_id", "text", 8, 2, idx))),
      Future { (1 to 3).foreach { _ =>
        val seen = probeAll()
        // monotone lower bound: everything committed BEFORE the race
        // must be visible in every read state
        assert((0L until 8L).toSet.subsetOf(seen),
          s"probe lost pre-race docs: $seen")
      }})
    Await.result(Future.sequence(fs), 120.seconds)
    // quiesced: every appended doc's identical twin must be found
    val finalSeen = probeAll()
    assert((0L until 12L).toSet.subsetOf(finalSeen),
      s"lost rows after racing compaction: $finalSeen")
    // a second compaction folds the race's leftover delta files in
    Dedup.compactLshIndex(spark, idx)
    assert(probeAll() == finalSeen, "post-race compaction changed results")
    val delta = Option(new java.io.File(idx, "delta").listFiles()).toSeq
      .flatten.count(_.getName.endsWith(".parquet"))
    assert(delta == 0, "quiesced compaction should consume the full tail")
  }

  test("compaction heals a crashed prior swap instead of orphaning it") {
    val idx = java.nio.file.Files.createTempDirectory("lshcrash").toString + "/idx"
    Dedup.buildLshIndex((0L until 6L).map(doc).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    Dedup.appendLshIndex(Seq(doc(6L)).toDF("doc_id", "text"),
      "doc_id", "text", 8, 2, idx)
    // simulate a compaction that died between swapDirs' two renames:
    // organized/ retired, tmp never moved in
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orgDir = new org.apache.hadoop.fs.Path(idx + "/organized")
    val retired = new org.apache.hadoop.fs.Path(
      idx + "/organized.retired." + java.util.UUID.randomUUID().toString)
    assert(fs.rename(orgDir, retired), "test setup: retire rename failed")
    // a probe in this state fails loudly (retryable), never silently
    // returns delta-only rows
    val incoming = (0L until 8L).map(doc).toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id") + 1000L)
    intercept[Exception] {
      Dedup.probeLshIndex(spark, idx, incoming, "doc_id", "text", 8, 2)
    }
    // the next scheduled compaction RECOVERS the retired organized rows
    // (pre-fix it would fold the delta tail alone and delete it,
    // permanently orphaning docs 0-5)
    Dedup.compactLshIndex(spark, idx)
    val seen = Dedup.probeLshIndex(spark, idx, incoming,
      "doc_id", "text", 8, 2).collect().map(_.getLong(1)).toSet
    assert((0L until 7L).toSet.subsetOf(seen),
      s"crashed-swap recovery lost rows: $seen")
    // the healed state carries no swap markers
    val leftovers = fs.globStatus(
      new org.apache.hadoop.fs.Path(idx + "/organized.retired.*"))
    assert(leftovers == null || leftovers.isEmpty,
      "recovery should consume the newest retired copy")
  }
}
