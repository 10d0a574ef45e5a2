package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Decomposes the FIXED per-query cost of the bench's streaming shape
  * (readStream file source → transforms → `Trigger.AvailableNow` →
  * memory sink) so "streaming subtotal" movements can be attributed to
  * structure vs regression (VERDICT r12 #7). Ladder, each step adding
  * one cost source, all over the SAME sf events file, min-of-N after an
  * untimed warm pass (the bench's timing discipline):
  *
  *   batch_agg        the identical aggregation through the batch path
  *                    (the work itself, no streaming machinery)
  *   start_empty      stream over an EMPTY dir: start + zero-batch
  *                    drain + stop — the pure lifecycle floor
  *   passthrough_1b   one file, one micro-batch, no state — adds source
  *                    listing, per-batch planning, memory-sink collect
  *   passthrough_2b   same file symlinked twice, maxFilesPerTrigger=1 —
  *                    the MARGINAL cost of one more micro-batch over
  *                    identical total data (vs passthrough_2f_1b)
  *   passthrough_2f_1b  both files in ONE batch — isolates batch count
  *                    from data volume
  *   agg_stream       watermarked tumbling agg, complete mode,
  *                    statePartitions=8 — adds state store commits +
  *                    complete-mode sink rewrite (ev_tumbling_stream's
  *                    exact shape; its bench row minus this ladder's
  *                    floor is the query's real incremental work)
  *
  * Prints one JSON line. Diagnostic harness, not a bench lane: run
  * ad-hoc in a quiet window, record in NOTES.
  */
object StreamProfile {
  private def timeMin(n: Int)(body: => Unit): Double = {
    body // warm untimed
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def stage(dir: String, names: Seq[String], src: java.nio.file.Path): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(dir)
    names.foreach(n => java.nio.file.Files.createSymbolicLink(d.resolve(n), src))
    d
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val evPath = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val raw = spark.read.parquet(evPath.toString)
    val schema = raw.schema
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt

    def drain(df: DataFrame, mode: String = "append",
              stateParts: Option[Int] = None): Unit = {
      val name = s"sp_${System.nanoTime()}"
      def begin() = df.writeStream.outputMode(mode).format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      val q = stateParts match {
        case Some(n) => graft.streaming.StreamOps.withStatePartitions(spark, n)(begin())
        case None => begin()
      }
      q.awaitTermination()
      spark.table(name).count(): Unit
      spark.catalog.dropTempView(name): Unit
    }

    def agg(df: DataFrame): DataFrame = {
      val ts = Tables.normalizeTs(df, "ts")
      ts.withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
    }

    val emptyDir = java.nio.file.Files.createTempDirectory("sp_empty")
    val oneDir = stage("sp_one", Seq("a.parquet"), evPath)
    val twoDir = stage("sp_two", Seq("a.parquet", "b.parquet"), evPath)

    val batchAgg = timeMin(reps) {
      agg(raw).collect(): Unit
    }
    // the memory sink COLLECTS every batch to the driver — price that
    // separately so passthrough numbers aren't read as planning cost
    val batchCollect = timeMin(reps) { raw.collect(): Unit }
    val startEmpty = timeMin(reps) {
      drain(spark.readStream.schema(schema).parquet(emptyDir.toString))
    }
    val pass1b = timeMin(reps) {
      drain(spark.readStream.schema(schema).parquet(oneDir.toString))
    }
    val pass2f1b = timeMin(reps) {
      drain(spark.readStream.schema(schema).parquet(twoDir.toString))
    }
    val pass2b = timeMin(reps) {
      drain(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(twoDir.toString))
    }
    val aggStream = timeMin(reps) {
      drain(agg(spark.readStream.schema(schema).parquet(oneDir.toString)),
        mode = "complete", stateParts = Some(8))
    }
    // small-output agg over 2 files: 1-batch vs 2-batch isolates the TRUE
    // per-micro-batch fixed cost (planning + offset/commit logs + state
    // commit) from the memory-sink collect the passthrough pair includes
    val aggStream2f1b = timeMin(reps) {
      drain(agg(spark.readStream.schema(schema).parquet(twoDir.toString)),
        mode = "complete", stateParts = Some(8))
    }
    val aggStream2b = timeMin(reps) {
      drain(agg(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(twoDir.toString)),
        mode = "complete", stateParts = Some(8))
    }

    // Spark's own per-batch decomposition: run the 2-batch agg once more
    // and dump each batch's durationMs (triggerExecution = total;
    // queryPlanning/walCommit/commitOffsets/addBatch/getBatch are the
    // fixed-cost suspects) — the authoritative answer to "what is the
    // 0.4 s marginal batch made of".
    val progress = {
      val name = s"sp_prog_${System.nanoTime()}"
      val df = agg(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(twoDir.toString))
      val q = graft.streaming.StreamOps.withStatePartitions(spark, 8) {
        df.writeStream.outputMode("complete").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
      }
      q.awaitTermination()
      val ps = q.recentProgress.toSeq.map { p =>
        val d = p.durationMs
        val keys = d.keySet.toArray.toSeq.map(k => s""""$k":${d.get(k)}""")
        s"""{"batchId":${p.batchId},${keys.sorted.mkString(",")}}"""
      }
      spark.catalog.dropTempView(name): Unit
      ps.mkString("[", ",", "]")
    }

    def s(d: Double) = f"$d%.3f"
    println(s"""{"metric":"stream_profile","unit":"sec","reps":$reps,"sf":"$sfDir",""" +
      s""""batch_agg":${s(batchAgg)},"batch_collect":${s(batchCollect)},""" +
      s""""start_empty":${s(startEmpty)},""" +
      s""""passthrough_1b":${s(pass1b)},"passthrough_2f_1b":${s(pass2f1b)},""" +
      s""""passthrough_2b":${s(pass2b)},"agg_stream":${s(aggStream)},""" +
      s""""agg_stream_2f_1b":${s(aggStream2f1b)},"agg_stream_2b":${s(aggStream2b)},""" +
      s""""marginal_batch_passthrough":${s(pass2b - pass2f1b)},""" +
      s""""marginal_batch_agg":${s(aggStream2b - aggStream2f1b)},""" +
      s""""stream_overhead_vs_batch":${s(aggStream - batchAgg)},""" +
      s""""batch_durations":$progress}""")
    spark.stop()
  }
}
