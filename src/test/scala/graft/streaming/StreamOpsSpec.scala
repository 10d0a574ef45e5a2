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
