package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventsParquet(): String = {
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toString
    Seq(
      (1L, 10L, "view", 1.0, sqlTs("2026-01-01 10:05:00")),
      (2L, 10L, "view", 2.0, sqlTs("2026-01-01 10:15:00")),
      (3L, 20L, "click", 3.0, sqlTs("2026-01-01 11:05:00")),
      (4L, 20L, "click", 4.0, sqlTs("2026-01-01 12:30:00"))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("appendIdempotent skips a replayed micro-batch, even across interleaved commits") {
    val dir = java.nio.file.Files.createTempDirectory("mfidem").toString + "/ds"
    val batch0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    StreamOps.appendIdempotent(batch0, dir, batchId = 0L)
    assert(graft.ops.Manifest.read(spark, dir).count() == 2)
    // replay of batch 0 (failure between append and checkpoint commit)
    StreamOps.appendIdempotent(batch0, dir, batchId = 0L)
    assert(graft.ops.Manifest.read(spark, dir).count() == 2, "replayed batch appended twice")
    // an interleaved NON-streaming commit must not hide the recorded id
    graft.ops.Manifest.append(Seq((9L, "x")).toDF("id", "v"), dir)
    StreamOps.appendIdempotent(batch0, dir, batchId = 0L)
    assert(graft.ops.Manifest.read(spark, dir).count() == 3, "replay slipped past a compaction commit")
    // the NEXT batch lands normally
    StreamOps.appendIdempotent(Seq((3L, "c")).toDF("id", "v"), dir, batchId = 1L)
    assert(graft.ops.Manifest.read(spark, dir).count() == 4)
  }

  test("readStream -> watermarked windowed agg -> memory sink (complete run)") {
    val dir    = writeEventsParquet()
    val schema = spark.read.parquet(dir).schema
    val stream = StreamOps.parquetStream(spark, dir, schema)
    assert(stream.isStreaming)
    val agg = StreamOps.windowedCounts(stream, "ts", "1 hour", "10 minutes")
    StreamOps.runToMemory(agg, "win_out")
    // append-mode emits only watermark-closed windows; rerun with complete
    // semantics via update of the same source is out of scope here — check
    // the closed windows.
    val rows = spark.table("win_out")
      .orderBy("window_start", "event_type").collect()
    // watermark = max ts (12:30) - 10min = 12:20 → windows 10:00 and 11:00 closed
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ==
      Seq(("2026-01-01 10:00:00.0", "view", 2L), ("2026-01-01 11:00:00.0", "click", 1L)))
  }

  test("withStatePartitions pins the query's state layout and restores the conf") {
    val dir    = writeEventsParquet()
    val schema = spark.read.parquet(dir).schema
    val key    = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val agg = StreamOps.windowedCounts(
      StreamOps.parquetStream(spark, dir, schema), "ts", "1 hour", "10 minutes")
    val q = StreamOps.withStatePartitions(spark, 3) {
      agg.writeStream.outputMode("append").format("memory")
        .queryName("sp_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    }
    // restored immediately after start() returns — the clone already
    // captured the pinned value, the session gets its own back
    assert(spark.conf.get(key) == before,
      "conf must be restored once the query has started")
    q.awaitTermination()
    // the pin really reached the stream: the state operator reports its
    // frozen partition count in the progress events
    val stateParts = q.recentProgress
      .flatMap(_.stateOperators.map(_.numShufflePartitions)).distinct.toSeq
    assert(stateParts == Seq(3L), s"state partitions were $stateParts")
    // and a 3-partition state layout computes the same windows as default
    val got = spark.table("sp_out")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    assert(got ==
      Seq(("2026-01-01 10:00:00.0", "view", 2L), ("2026-01-01 11:00:00.0", "click", 1L)))
  }

  test("withStatePartitions restores the conf when the start itself throws") {
    val key    = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val boom = intercept[RuntimeException] {
      StreamOps.withStatePartitions(spark, 3) {
        throw new RuntimeException("start failed")
      }
    }
    assert(boom.getMessage == "start failed")
    assert(spark.conf.get(key) == before,
      "a failed start must not leave the session pinned")
  }

  test("concurrent withStatePartitions starts: each stream gets its own pin") {
    // the lock contract: two overlapping flips must not capture each
    // other's transient value — each query's state layout is ITS pin, and
    // the session conf ends where it started
    val dir    = writeEventsParquet()
    val schema = spark.read.parquet(dir).schema
    val key    = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def start(n: Int) = StreamOps.withStatePartitions(spark, n) {
      StreamOps.windowedCounts(
        StreamOps.parquetStream(spark, dir, schema), "ts", "1 hour", "10 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"cq_$n")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val qs = Await.result(
      Future.sequence(Seq(2, 5).map(n => Future(n -> start(n)))), 90.seconds)
    qs.foreach(_._2.awaitTermination())
    qs.foreach { case (n, q) =>
      val got = q.recentProgress
        .flatMap(_.stateOperators.map(_.numShufflePartitions)).distinct.toSeq
      assert(got == Seq(n.toLong), s"pin $n leaked: state partitions $got")
    }
    assert(spark.conf.get(key) == before)
  }

  test("append mode across micro-batches: watermark drops late data, bounds emission") {
    val dir = java.nio.file.Files.createTempDirectory("wm_src")
    val now = System.currentTimeMillis()
    def writeOne(name: String, mtime: Long,
                 rows: Seq[(Long, Long, String, Double, java.sql.Timestamp)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("wm_tmp").toString
      rows.toDF("event_id", "user_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
      assert(dir.resolve(name).toFile.setLastModified(mtime))
    }
    // batch 0 advances the watermark to 12:00 - 10min = 11:50
    writeOne("b1.parquet", now - 180000, Seq(
      (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00")),
      (2L, 1L, "view", 1.0, sqlTs("2026-01-01 10:05:00")),
      (3L, 1L, "view", 1.0, sqlTs("2026-01-01 12:00:00"))))
    // batch 1: the 11:50 watermark takes effect — the 10:00 window is
    // finalized (2 events) and its state EVICTED at this batch's end.
    // (Late-record filtering uses the PREVIOUS batch's watermark while
    // eviction uses the current one — SPARK-40925 — so the drop is only
    // observable one batch after the advance.)
    writeOne("b2.parquet", now - 120000, Seq(
      (4L, 1L, "view", 1.0, sqlTs("2026-01-01 12:30:00"))))
    // batch 2: event 5 (10:20) is behind the late-record watermark
    // (11:50) → dropped at input instead of resurrecting the evicted
    // window as a duplicate append row.
    writeOne("b3.parquet", now - 60000, Seq(
      (5L, 1L, "view", 1.0, sqlTs("2026-01-01 10:20:00")),
      (6L, 1L, "view", 1.0, sqlTs("2026-01-01 13:30:00"))))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val agg = StreamOps.windowedCounts(stream, "ts", "1 hour", "10 minutes")
    StreamOps.runToMemory(agg, "wm_out") // append mode
    val rows = spark.table("wm_out").orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    // 10:00 window: 2 events, late 10:20 dropped; 12:00 window: closed by
    // the final 13:20 watermark with 2 events; 13:00 window never closes
    // (end 14:00 > 13:20) so append mode holds it back.
    assert(rows.toSeq == Seq(
      ("2026-01-01 10:00:00.0", 2L), ("2026-01-01 12:00:00.0", 2L)))
  }

  test("dedupStream drops duplicate keys within the watermark across batches") {
    val dir = java.nio.file.Files.createTempDirectory("dd_src")
    val now = System.currentTimeMillis()
    def writeOne(name: String, mtime: Long,
                 rows: Seq[(Long, Long, String, Double, java.sql.Timestamp)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("dd_tmp").toString
      rows.toDF("event_id", "user_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
      assert(dir.resolve(name).toFile.setLastModified(mtime))
    }
    writeOne("b1.parquet", now - 120000, Seq(
      (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00")),
      (2L, 1L, "view", 2.0, sqlTs("2026-01-01 10:01:00")),
      (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00")))) // same-batch dup
    writeOne("b2.parquet", now - 60000, Seq(
      (2L, 1L, "view", 2.0, sqlTs("2026-01-01 10:01:00")),  // cross-batch dup
      (3L, 1L, "view", 3.0, sqlTs("2026-01-01 10:02:00"))))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val dedup = StreamOps.dedupStream(stream, Seq("event_id"), "ts", "10 minutes")
    StreamOps.runToMemory(dedup, "dd_out")
    val ids = spark.table("dd_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("enrichStream broadcast-joins each micro-batch against the static dim") {
    val dir = java.nio.file.Files.createTempDirectory("en_src")
    Seq((1L, 10L, "view", 1.0, sqlTs("2026-01-01 10:00:00")),
        (2L, 20L, "buy", 2.0, sqlTs("2026-01-01 10:01:00")),
        (3L, 99L, "view", 3.0, sqlTs("2026-01-01 10:02:00"))) // no dim row: dropped
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(dir.toString)
    val dim = Seq((10L, "DE"), (20L, "FR")).toDF("cust_id", "country")
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val out = StreamOps.enrichStream(stream, dim, Seq("user_id" -> "cust_id"))
      .select("event_id", "country")
    StreamOps.runToMemory(out, "en_out", outputMode = "append")
    val rows = spark.table("en_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "DE", 2L -> "FR"))
  }

  test("stream-stream join matches within the time bound only") {
    val lDir = java.nio.file.Files.createTempDirectory("ss_l")
    val rDir = java.nio.file.Files.createTempDirectory("ss_r")
    Seq((1L, sqlTs("2026-01-01 10:00:00")), (2L, sqlTs("2026-01-01 11:00:00")))
      .toDF("k", "lts").write.mode("overwrite").parquet(lDir.toString)
    Seq((1L, sqlTs("2026-01-01 10:05:00")),  // within 10 min of left k=1
        (1L, sqlTs("2026-01-01 10:30:00")),  // same key, outside window
        (2L, sqlTs("2026-01-01 10:59:00")),  // BEFORE left k=2: no match
        (3L, sqlTs("2026-01-01 10:00:00")))  // no left key
      .toDF("k", "rts").write.mode("overwrite").parquet(rDir.toString)
    def stream(dir: java.nio.file.Path) = {
      val sch = spark.read.parquet(dir.toString).schema
      spark.readStream.schema(sch).parquet(dir.toString)
    }
    val joined = StreamOps.streamStreamJoin(
      stream(lDir), stream(rDir), "k", "lts", "rts",
      watermarkDelay = "1 hour", joinWindow = "10 MINUTE")
    StreamOps.runToMemory(joined.select(col("k"), col("rts")), "ss_out")
    val rows = spark.table("ss_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(rows == Set((1L, sqlTs("2026-01-01 10:05:00"))))
  }

  test("left-outer stream-stream join null-pads once the watermark proves no match") {
    val lDir = java.nio.file.Files.createTempDirectory("sso_l")
    val rDir = java.nio.file.Files.createTempDirectory("sso_r")
    val now = System.currentTimeMillis()
    def writeOne(dir: java.nio.file.Path, name: String, mtime: Long,
                 rows: Seq[(Long, java.sql.Timestamp)], tsName: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("sso_tmp").toString
      rows.toDF("k", tsName).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
      assert(dir.resolve(name).toFile.setLastModified(mtime))
    }
    // batch 0: k=1 never matches, k=2 matches within the window
    writeOne(lDir, "l1.parquet", now - 180000,
      Seq((1L, sqlTs("2026-01-01 10:00:00")), (2L, sqlTs("2026-01-01 10:00:00"))), "lts")
    writeOne(rDir, "r1.parquet", now - 180000,
      Seq((2L, sqlTs("2026-01-01 10:02:00"))), "rts")
    // batches 1-2: future rows on BOTH sides push the min watermark far
    // past k=1's eviction point (outer emission trails eviction a batch)
    writeOne(lDir, "l2.parquet", now - 120000, Seq((8L, sqlTs("2026-01-01 13:00:00"))), "lts")
    writeOne(rDir, "r2.parquet", now - 120000, Seq((8L, sqlTs("2026-01-01 13:00:01"))), "rts")
    writeOne(lDir, "l3.parquet", now - 60000, Seq((9L, sqlTs("2026-01-01 15:00:00"))), "lts")
    writeOne(rDir, "r3.parquet", now - 60000, Seq((9L, sqlTs("2026-01-01 15:00:01"))), "rts")
    def stream(dir: java.nio.file.Path) = {
      val sch = spark.read.parquet(dir.toString).schema
      spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    }
    val joined = StreamOps.streamStreamJoin(
      stream(lDir), stream(rDir), "k", "lts", "rts",
      watermarkDelay = "10 minutes", joinWindow = "10 MINUTE",
      joinType = "left_outer")
    StreamOps.runToMemory(joined.select(col("k"), col("lts"), col("rts")), "sso_out")
    val rows = spark.table("sso_out").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)).map(_.toString))).toSet
    assert(rows.contains((2L, Some("2026-01-01 10:02:00.0"))), rows.toString)
    assert(rows.contains((1L, None)), s"unmatched left row must null-pad: $rows")
  }

  test("upsertSink merges micro-batches by key; compaction preserves data") {
    val src  = java.nio.file.Files.createTempDirectory("up_src")
    val sink = java.nio.file.Files.createTempDirectory("up_sink").toString + "/ds"
    val ckpt = java.nio.file.Files.createTempDirectory("up_ckpt").toString
    val now = System.currentTimeMillis()
    def writeOne(name: String, mtime: Long, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("up_tmp").toString
      rows.toDF("k", "v", "seq").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
      assert(src.resolve(name).toFile.setLastModified(mtime))
    }
    writeOne("b1.parquet", now - 120000,
      Seq((1L, "one", 1L), (2L, "two", 1L), (2L, "two-later", 2L))) // in-batch dup: seq wins
    writeOne("b2.parquet", now - 60000,
      Seq((2L, "two-v2", 3L), (3L, "three", 1L)))                   // cross-batch update
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    StreamOps.upsertSink(stream, sink, Seq("k"), orderCol = "seq", checkpointDir = ckpt)
    def state = spark.read.parquet(sink).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "one", 2L -> "two-v2", 3L -> "three"))
    // compaction rewrites to one file without changing the data
    graft.ops.Maintenance.compact(spark, sink, numFiles = 1)
    assert(state == Map(1L -> "one", 2L -> "two-v2", 3L -> "three"))
    assert(new java.io.File(sink).listFiles().count(_.getName.endsWith(".parquet")) == 1)
  }

  test("partitioned upsertSink rewrites only the partitions a batch touches") {
    val src  = java.nio.file.Files.createTempDirectory("pup_src")
    val sink = java.nio.file.Files.createTempDirectory("pup_sink").toString + "/ds"
    val ckpt = java.nio.file.Files.createTempDirectory("pup_ckpt").toString
    def writeOne(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("pup_tmp").toString
      rows.toDF("k", "v", "seq", "dt").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    // batch 1 seeds two date partitions; batch 2 touches only 01-02
    writeOne("b1.parquet", Seq((1L, "a", 1L, "2026-01-01"), (2L, "b", 1L, "2026-01-02")))
    val schema = spark.read.parquet(src.toString).schema
    StreamOps.upsertSink(spark.readStream.schema(schema).parquet(src.toString),
      sink, Seq("k"), "seq", ckpt, partitionCols = Seq("dt"))
    def files(p: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = files(sink).filter(_._1.contains("dt=2026-01-01"))
    writeOne("b2.parquet", Seq((2L, "b2", 2L, "2026-01-02"), (3L, "c", 1L, "2026-01-02")))
    StreamOps.upsertSink(spark.readStream.schema(schema).parquet(src.toString),
      sink, Seq("k"), "seq", ckpt, partitionCols = Seq("dt"))
    // untouched partition is byte-identical (same files, same mtimes)
    assert(files(sink).filter(_._1.contains("dt=2026-01-01")) == before)
    val state = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("manifestMorUpsertSink: CDC apply via deletion vectors, no file rewrite") {
    val src  = java.nio.file.Files.createTempDirectory("mmor_src")
    val sink = java.nio.file.Files.createTempDirectory("mmor_sink").toString + "/ds"
    val ckpt = java.nio.file.Files.createTempDirectory("mmor_ckpt").toString
    def writeOne(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("mmor_tmp").toString
      rows.toDF("k", "v", "seq").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    writeOne("b1.parquet", Seq((1L, "a", 1L), (2L, "b", 1L)))
    val schema = spark.read.parquet(src.toString).schema
    def run(): Unit = StreamOps.manifestMorUpsertSink(
      spark.readStream.schema(schema).parquet(src.toString),
      sink, Seq("k"), "seq", ckpt)
    run() // first batch publishes the initial version
    def state = graft.ops.Manifest.read(spark, sink).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(state == Map(1L -> "a", 2L -> "b"))
    val filesV1 = graft.ops.Manifest.tableInfo(spark, sink).entries.map(_._1)
    // CDC batch: update k=2, insert k=3 — applied as vectors + append
    writeOne("b2.parquet", Seq((2L, "b2", 2L), (3L, "c", 1L)))
    run()
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // every v1 data file carried over path-identical (merge-on-read)
    val filesV2 = graft.ops.Manifest.tableInfo(spark, sink).entries.map(_._1)
    assert(filesV1.forall(filesV2.contains) && filesV2.size > filesV1.size)
    assert(graft.ops.Manifest.countRows(spark, sink) == 3L)
    // maintenance folds the vectors back in; state unchanged
    graft.ops.Manifest.purgeDeletes(spark, sink)
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("lshDedupGateSink: continuous corpus dedup against the persisted index") {
    val src  = java.nio.file.Files.createTempDirectory("gate_src")
    val idx  = java.nio.file.Files.createTempDirectory("gate_idx").toString + "/idx"
    val corp = java.nio.file.Files.createTempDirectory("gate_corp").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("gate_ckpt").toString
    def writeOne(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("gate_tmp").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val tB = "completely different words here about other topics entirely now yes indeed truly"
    val tN = "brand new unique document text nothing shared with previous ones at all"
    writeOne("b1.parquet", Seq((1L, tA), (2L, tB), (3L, tA))) // 3 = exact dup of 1
    val schema = spark.read.parquet(src.toString).schema
    def run(): Unit = StreamOps.lshDedupGateSink(
      spark.readStream.schema(schema).parquet(src.toString),
      idx, corp, "doc_id", "text", ckpt)
    run()
    def corpusIds = graft.ops.Manifest.read(spark, corp).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(corpusIds == Set(1L, 2L))
    // batch 2: 10 = near-dup of corpus doc 1 (one token changed, j≈0.85),
    // 11 = novel, 12 = in-batch near-dup of 11
    writeOne("b2.parquet", Seq(
      (10L, tA.replace("mu", "nu")),
      (11L, tN),
      (12L, tN.replace("all", "once"))))
    run()
    assert(corpusIds == Set(1L, 2L, 11L))
    // the index grew by exactly the accepted doc's band rows: a replayed
    // probe of doc 11's text now reports it as a near-dup candidate
    val probe = graft.ops.Dedup.probeLshIndex(spark, idx,
      Seq((99L, tN)).toDF("doc_id", "text"), "doc_id", "text",
      k = 8, rowsPerBand = 2)
    assert(probe.collect().map(_.getLong(1)).contains(11L))
  }

  test("lshDedupGateSink recovery: crash between index append and corpus commit") {
    // The sink's documented crash story: index appends FIRST, so a batch
    // replayed after dying between the two writes re-appends band rows
    // (harmless — probes distinct) while the corpus commit stays
    // exactly-once via the batchId watermark. Kill the run at exactly
    // that point and restart against the same checkpoint: the final
    // corpus must equal the uninterrupted run's.
    val src  = java.nio.file.Files.createTempDirectory("gatr_src")
    val idx  = java.nio.file.Files.createTempDirectory("gatr_idx").toString + "/idx"
    val corp = java.nio.file.Files.createTempDirectory("gatr_corp").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("gatr_ckpt").toString
    def writeOne(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("gatr_tmp").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val tB = "completely different words here about other topics entirely now yes indeed truly"
    val tN = "brand new unique document text nothing shared with previous ones at all"
    writeOne("b1.parquet", Seq((1L, tA), (2L, tB)))
    val schema = spark.read.parquet(src.toString).schema
    def run(): Unit = StreamOps.lshDedupGateSink(
      spark.readStream.schema(schema).parquet(src.toString),
      idx, corp, "doc_id", "text", ckpt)
    run()
    // batch 2 arrives; the "crashed" attempt got as far as the index
    // append (the sink's first write) for the batch's accepted docs —
    // computed exactly as the sink computes them — then died before the
    // manifest commit, leaving the checkpoint unaware of batch 2
    val b2 = Seq((10L, tA.replace("mu", "nu")), (11L, tN),
      (12L, tN.replace("all", "once")))
    writeOne("b2.parquet", b2)
    val acceptedByCrashedAttempt = graft.ops.Dedup.gateBatch(
      b2.toDF("doc_id", "text"), "doc_id", "text", idx,
      graft.ops.Manifest.read(spark, corp))
    graft.ops.Dedup.appendLshIndex(acceptedByCrashedAttempt,
      "doc_id", "text", 8, 2, idx)
    // restart against the same checkpoint: batch 2 replays from scratch —
    // its accepted docs now ALREADY sit in the index (self-candidates are
    // filtered by id, so they must not gate themselves out)
    run()
    val rows = graft.ops.Manifest.read(spark, corp).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 11L),
      "replayed corpus differs from the uninterrupted run")
    assert(rows.length == 3, "a doc committed twice across the replay")
    // the twice-appended band rows stay harmless: one candidate row
    val probe = graft.ops.Dedup.probeLshIndex(spark, idx,
      Seq((99L, tN)).toDF("doc_id", "text"), "doc_id", "text",
      k = 8, rowsPerBand = 2)
    assert(probe.collect().map(_.getLong(1)).count(_ == 11L) == 1)
  }

  test("manifestUpsertSink: versioned transactional upsert with replay idempotence") {
    val src  = java.nio.file.Files.createTempDirectory("mup_src")
    val sink = java.nio.file.Files.createTempDirectory("mup_sink").toString + "/ds"
    val ckpt = java.nio.file.Files.createTempDirectory("mup_ckpt").toString
    def writeOne(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("mup_tmp").toString
      rows.toDF("k", "v", "seq", "dt").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    writeOne("b1.parquet", Seq((1L, "a", 1L, "2026-01-01"), (2L, "b", 1L, "2026-01-02")))
    val schema = spark.read.parquet(src.toString).schema
    def run(): Unit = StreamOps.manifestUpsertSink(
      spark.readStream.schema(schema).parquet(src.toString),
      sink, Seq("k"), "seq", ckpt, partitionCols = Seq("dt"))
    run()
    val v1 = graft.ops.Manifest.latestVersion(spark, sink)
    def state = graft.ops.Manifest.read(spark, sink).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(state == Map(1L -> "a", 2L -> "b"))
    // second batch updates only the 01-02 partition; the 01-01 entries
    // carry over path-identical in the new manifest version
    writeOne("b2.parquet", Seq((2L, "b2", 2L, "2026-01-02"), (3L, "c", 1L, "2026-01-02")))
    run()
    val v2 = graft.ops.Manifest.latestVersion(spark, sink)
    assert(v2 > v1)
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    def entries(v: Long) = scala.io.Source.fromFile(s"$sink/_manifest.v$v").getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty).toSet
    assert(entries(v1).filter(_.contains("dt=2026-01-01")) ==
      entries(v2).filter(_.contains("dt=2026-01-01")))
    // time travel reaches the pre-update state
    assert(graft.ops.Manifest.read(spark, sink, version = v1).count() == 2)
    // replay guard: re-applying the last committed batchId changes nothing
    val watermark = graft.ops.Manifest.lastProp(spark, sink, "streaming.batchId")
      .get.toLong
    val replay = Seq((3L, "SHOULD-NOT-APPLY", 99L, "2026-01-02"))
      .toDF("k", "v", "seq", "dt")
    // simulate foreachBatch re-delivery of an already-committed batch
    val committed = graft.ops.Manifest.lastProp(spark, sink, "streaming.batchId").map(_.toLong)
    if (!committed.exists(_ >= watermark))
      graft.ops.Manifest.upsert(replay, sink, Seq("k"), "seq", Seq("dt"),
        extraProps = Map("streaming.batchId" -> watermark.toString))
    assert(state(3L) == "c", "replayed batch must be skipped")
    assert(graft.ops.Manifest.latestVersion(spark, sink) == v2)
  }

  test("manifestUpsertSink: full checkpoint loss replays every batch — zero dupes, zero new commits") {
    // The disaster-recovery replay, driven through the REAL engine: the
    // manifest commits for batches 0 and 1 landed, then the streaming
    // checkpoint is lost entirely — a fresh query re-delivers the whole
    // source from scratch (batchIds restart at 0) and the manifest's
    // batchId watermark must swallow every replayed batch. (Tampering
    // INSIDE a checkpoint — deleting commits/N — is not simulable:
    // Spark's HDFSMetadataLog treats a recreated commit file as a
    // concurrent query. Checkpoint loss is the supported way to force
    // engine-level redelivery, and it is the harsher replay: every
    // batch, not just the last.) The guard's contract is that a replay
    // re-delivers the same source prefix — true for checkpoint recovery
    // and for full restarts over an unchanged source, which is the
    // foreachBatch exactly-once model.
    val src  = java.nio.file.Files.createTempDirectory("mupc_src")
    val sink = java.nio.file.Files.createTempDirectory("mupc_sink").toString + "/ds"
    def writeOne(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("mupc_tmp").toString
      rows.toDF("k", "v", "seq").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    writeOne("b0.parquet", Seq((1L, "a", 1L), (2L, "b", 1L)))
    writeOne("b1.parquet", Seq((2L, "b2", 2L), (3L, "c", 1L)))
    val schema = spark.read.parquet(src.toString).schema
    def run(ckpt: String): Unit = StreamOps.manifestUpsertSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString),
      sink, Seq("k"), "seq", ckpt)
    run(java.nio.file.Files.createTempDirectory("mupc_ck1").toString)
    val vDone = graft.ops.Manifest.latestVersion(spark, sink)
    assert(graft.ops.Manifest
      .lastProp(spark, sink, "streaming.batchId").get.toLong == 1L)
    def state = graft.ops.Manifest.read(spark, sink).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // the crash: checkpoint gone, sink intact — rerun from scratch
    val ck2 = java.nio.file.Files.createTempDirectory("mupc_ck2").toString
    run(ck2)
    // the fresh query really re-delivered the batches (its own commit
    // log filled up)...
    assert(new java.io.File(ck2, "commits").listFiles()
      .exists(_.getName == "0"),
      "fresh checkpoint processed no batch — the replay went untested")
    // ...and the watermark swallowed them all: same state, same chain
    assert(state == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(graft.ops.Manifest.latestVersion(spark, sink) == vDone,
      "replayed batches produced new manifest commits")
  }

  test("upsertBatch is idempotent: replaying a micro-batch changes nothing") {
    // foreachBatch re-delivers a batch after a failure — the merge must
    // tolerate replays for the sink to stay effectively exactly-once.
    val path = java.nio.file.Files.createTempDirectory("idem").toString + "/ds"
    val batch = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq")
    graft.ops.Maintenance.upsertBatch(batch, path, Seq("k"), "seq")
    val once = spark.read.parquet(path).orderBy("k").collect().map(_.toSeq).toSeq
    graft.ops.Maintenance.upsertBatch(batch, path, Seq("k"), "seq") // replay
    val twice = spark.read.parquet(path).orderBy("k").collect().map(_.toSeq).toSeq
    assert(once == twice && once.length == 2)
  }

  test("streaming funnel: state carries stage progress across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("fun_src")
    val now = System.currentTimeMillis()
    def writeOne(name: String, mtime: Long,
                 rows: Seq[(Long, Long, String, Double, java.sql.Timestamp)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("fun_tmp").toString
      rows.toDF("event_id", "user_id", "event_type", "value", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, dir.resolve(name))
      assert(dir.resolve(name).toFile.setLastModified(mtime))
    }
    writeOne("b1.parquet", now - 120000, Seq(
      (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00"))))
    // batch 2: the click continues batch 1's state; the purchase is
    // outside the 24h window after the click and must NOT count
    writeOne("b2.parquet", now - 60000, Seq(
      (2L, 1L, "click", 1.0, sqlTs("2026-01-01 11:00:00")),
      (3L, 1L, "purchase", 1.0, sqlTs("2026-01-03 12:00:00"))))
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val funnel = StreamOps.funnelStream(
      stream.as[StreamOps.Event], Seq("view", "click", "purchase"),
      java.time.Duration.ofHours(24))
    StreamOps.runToMemory(funnel.toDF(), "fun_out", outputMode = "update")
    val last = spark.table("fun_out").orderBy(desc("reached")).head()
    assert(last.getAs[Int]("reached") == 2)
    assert(last.getAs[java.sql.Timestamp]("t2").toString == "2026-01-01 11:00:00.0")
    assert(last.getAs[java.sql.Timestamp]("t3") == null)
  }

  test("manifestSink: each micro-batch commits one atomic version") {
    val src  = java.nio.file.Files.createTempDirectory("ms_src")
    val sink = java.nio.file.Files.createTempDirectory("ms_sink").toString + "/ds"
    val ckpt = java.nio.file.Files.createTempDirectory("ms_ckpt").toString
    val now = System.currentTimeMillis()
    def writeOne(name: String, mtime: Long, rows: Seq[Long]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("ms_tmp").toString
      rows.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, src.resolve(name))
      assert(src.resolve(name).toFile.setLastModified(mtime))
    }
    writeOne("b1.parquet", now - 120000, Seq(1L, 2L))
    writeOne("b2.parquet", now - 60000, Seq(3L))
    val sch = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    StreamOps.manifestSink(stream, sink, ckpt)
    assert(graft.ops.Manifest.latestVersion(spark, sink) == 2)
    assert(graft.ops.Manifest.read(spark, sink).count() == 3)
    // version 1 holds exactly the first micro-batch
    assert(graft.ops.Manifest.read(spark, sink, version = 1).count() == 2)
  }

  test("RocksDB state store: stateful stream results equal the default provider") {
    // same watermarked dedup shape as above, run once per provider — the
    // off-heap store must be a pure deployment knob, never a semantics one
    def runWith(tag: String, rocks: Boolean): Seq[Long] = {
      val dir = java.nio.file.Files.createTempDirectory(s"rb_src_$tag")
      val now = System.currentTimeMillis()
      def writeOne(name: String, mtime: Long,
                   rows: Seq[(Long, Long, String, Double, java.sql.Timestamp)]): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("rb_tmp").toString
        rows.toDF("event_id", "user_id", "event_type", "value", "ts")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath, dir.resolve(name))
        assert(dir.resolve(name).toFile.setLastModified(mtime))
      }
      writeOne("b1.parquet", now - 120000, Seq(
        (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00")),
        (2L, 1L, "view", 2.0, sqlTs("2026-01-01 10:01:00")),
        (1L, 1L, "view", 1.0, sqlTs("2026-01-01 10:00:00"))))
      writeOne("b2.parquet", now - 60000, Seq(
        (2L, 1L, "view", 2.0, sqlTs("2026-01-01 10:01:00")),
        (3L, 1L, "view", 3.0, sqlTs("2026-01-01 10:02:00"))))
      val schema = spark.read.parquet(dir.toString).schema
      def drive(): Seq[Long] = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        StreamOps.runToMemory(
          StreamOps.dedupStream(stream, Seq("event_id"), "ts", "10 minutes"),
          s"rb_out_$tag")
        spark.table(s"rb_out_$tag").select("event_id")
          .collect().map(_.getLong(0)).sorted.toSeq
      }
      if (rocks) StreamOps.withRocksDbState(spark)(drive()) else drive()
    }
    val default = runWith("hdfs", rocks = false)
    val rocksDb = runWith("rocks", rocks = true)
    assert(default == Seq(1L, 2L, 3L))
    assert(rocksDb == default)
    // the wrapper restored the provider
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(StreamOps.RocksDbProvider))
  }

  test("stateful sessionization via flatMapGroupsWithState") {
    val events = Seq(
      StreamOps.Event(1L, 10L, "view", 1.0, sqlTs("2026-01-01 10:00:00")),
      StreamOps.Event(2L, 10L, "view", 2.0, sqlTs("2026-01-01 10:10:00")),
      StreamOps.Event(3L, 10L, "view", 3.0, sqlTs("2026-01-01 11:30:00")),
      StreamOps.Event(4L, 20L, "click", 4.0, sqlTs("2026-01-01 10:00:00"))
    ).toDS()
    // batch Dataset drives the same state function via groupByKey path
    val out = StreamOps.sessionizeStream(events, gapMinutes = 30)
      .collect().sortBy(u => (u.user_id, u.session_id, u.n_events))
    // user 10: session 1 (2 events), session 2 (1 event); user 20: session 1
    assert(out.map(u => (u.user_id, u.session_id, u.n_events)).toSeq ==
      Seq((10L, 1L, 1L), (10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }
}
