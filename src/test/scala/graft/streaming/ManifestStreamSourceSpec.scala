package graft.streaming

import graft.SparkSpec
import graft.ops.Manifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Manifest datasets as a STREAMING SOURCE
  * (`spark.readStream.format("graft-manifest")`): offsets are manifest
  * versions, so each micro-batch must read exactly the files appended
  * since the checkpointed version — the Delta streaming-source semantics.
  * These tests pin incremental delivery, exactly-once resume across a
  * query restart (the offset log carries the version), and the
  * append-only guard against rewriting commits.
  */
class ManifestStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Drain every available version into `sink` via foreachBatch, then
    * stop — AvailableNow so each call processes pending offsets only.
    */
  private def drain(dir: String, checkpoint: String,
                    sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])],
                    ignoreChanges: Boolean = false): Unit = {
    val reader = spark.readStream.format("graft-manifest")
    val q = (if (ignoreChanges) reader.option("ignoreChanges", "true") else reader)
      .load(dir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.add(batchId -> batch.select("id").collect().map(_.getLong(0)).toSeq)
        (): Unit
      }
      .start()
    q.awaitTermination()
  }

  test("appends arrive incrementally; restart resumes from the checkpoint") {
    val root = tmp("mss_inc")
    val dir = s"$root/ds"
    val ckpt = s"$root/ckpt"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()

    Manifest.append(spark.range(0, 10).toDF("id"), dir)            // v1
    drain(dir, ckpt, sink)
    assert(sink.asScala.flatMap(_._2).toSeq.sorted == (0L until 10L),
      "first drain must deliver version 1's rows")

    sink.clear()
    Manifest.append(spark.range(10, 15).toDF("id"), dir)           // v2
    Manifest.append(spark.range(15, 25).toDF("id"), dir)           // v3
    drain(dir, ckpt, sink)
    val second = sink.asScala.flatMap(_._2).toSeq.sorted
    assert(second == (10L until 25L),
      s"restart must deliver ONLY versions 2..3 (got $second)")

    // nothing new → nothing delivered (no re-read of old versions)
    sink.clear()
    drain(dir, ckpt, sink)
    assert(sink.asScala.flatMap(_._2).isEmpty)
  }

  test("a rewriting commit fails the stream unless ignoreChanges is set") {
    val root = tmp("mss_rw")
    val dir = s"$root/ds"
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()

    Manifest.append(spark.range(0, 10).toDF("id").coalesce(1), dir) // v1
    drain(dir, s"$root/ckpt1", sink)
    Manifest.delete(spark, dir, col("id") >= 8)                     // v2 rewrites
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, s"$root/ckpt1", sink)
    }
    assert(ex.getMessage.contains("append-only") ||
      Option(ex.getCause).exists(_.getMessage.contains("append-only")))

    // ignoreChanges: the rewritten file is re-delivered (Delta semantics)
    sink.clear()
    drain(dir, s"$root/ckpt2", sink, ignoreChanges = true)          // fresh ckpt: v2 state
    sink.clear()
    Manifest.delete(spark, dir, col("id") >= 6)                     // v3 rewrites again
    drain(dir, s"$root/ckpt2", sink, ignoreChanges = true)
    assert(sink.asScala.flatMap(_._2).toSeq.sorted == (0L until 6L),
      "ignoreChanges must re-deliver the rewritten file's surviving rows")
  }

  test("maxVersionsPerTrigger paces catch-up and survives a restart") {
    val root = tmp("mss_rate")
    val dir = s"$root/ds"
    val ckpt = s"$root/ckpt"
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[Long])]()

    // a 4-version backlog, 10 rows each
    for (i <- 0 until 4)
      Manifest.append(spark.range(i * 10, (i + 1) * 10).toDF("id"), dir)

    def drainPaced(): Unit = {
      val q = spark.readStream.format("graft-manifest")
        .option("maxVersionsPerTrigger", "2")
        .load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batches.add(batchId -> batch.select("id").collect().map(_.getLong(0)).toSeq)
          (): Unit
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    drainPaced()
    val firstRun = batches.asScala.toSeq
    assert(firstRun.map(_._2.size).forall(_ <= 20),
      s"a paced batch must carry ≤ 2 versions (20 rows): ${firstRun.map(_._2.size)}")
    assert(firstRun.size >= 2, "4 versions at cap 2 must take ≥ 2 batches")
    assert(firstRun.flatMap(_._2).sorted == (0L until 40L))

    // restart against new backlog: the persisted high-water mark keeps the
    // cap anchored at the checkpoint — no re-delivery, no skipped version
    batches.clear()
    for (i <- 4 until 7)
      Manifest.append(spark.range(i * 10, (i + 1) * 10).toDF("id"), dir)
    drainPaced()
    val secondRun = batches.asScala.toSeq
    assert(secondRun.flatMap(_._2).sorted == (40L until 70L),
      s"restart must deliver exactly versions 5..7: ${secondRun.flatMap(_._2).sorted}")
    assert(secondRun.map(_._2.size).forall(_ <= 20))
  }

  test("stream-to-manifest composition: tail one dataset into another") {
    val root = tmp("mss_pipe")
    val src = s"$root/src"
    val dst = s"$root/dst"
    Manifest.append(spark.range(0, 100).toDF("id"), src)
    val q = spark.readStream.format("graft-manifest").load(src)
      .withColumn("doubled", col("id") * 2)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamOps.appendIdempotent(batch, dst, batchId)
      }
      .start()
    q.awaitTermination()
    assert(Manifest.read(spark, dst).agg(sum("doubled")).head.getLong(0)
      == (0L until 100L).map(_ * 2).sum)
  }

  test("writeStream.format(graft-manifest) commits idempotent versioned batches") {
    val root = tmp("mss_sink")
    val srcDir = s"$root/files"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val dst = s"$root/ds"
    spark.range(0, 50).toDF("id").coalesce(1)
      .write.parquet(s"$srcDir/batch0")
    val stream = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType))
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = stream.withColumn("doubled", col("id") * 2)
      .writeStream.format("graft-manifest")
      .option("checkpointLocation", s"$root/ckpt")
      .option("stats.cols", "id")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    assert(Manifest.read(spark, dst).count() == 50)
    // the batchId watermark landed with the commit (replay protection)
    assert(Manifest.lastProp(spark, dst, "streaming.batchId").contains("0"))
    // stats recorded → readRange prunes on them
    assert(Manifest.readRange(spark, dst, "id", 0, 10).count() == 11)
    // complete-mode output is rejected up front
    intercept[Exception] {
      spark.readStream.schema(stream.schema).parquet(srcDir)
        .groupBy("id").count()
        .writeStream.format("graft-manifest")
        .outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt2")
        .trigger(Trigger.AvailableNow())
        .start(s"$root/ds2")
    }
  }

  private implicit class QueueOps[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala
    }
  }
}
