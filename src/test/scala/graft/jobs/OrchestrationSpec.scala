package graft.jobs

import java.time.{Instant, LocalDate}
import graft.SparkSpec
import graft.meta.{DefaultsStore, StatusTracker}
import graft.meta.Status.Schedule

/** Reference test-matrix parity: scheduling counts (2 daily / 3 monday /
  * 3 saturday / 1 forced — `test/etl_manager_test.rb:52-90`), defaults KV
  * semantics (`test/basic_test.rb:11-33`), job lifecycle + side-effect run
  * (`test/job_running_test.rb:35-53`).
  */
class SchedulerSpec extends SparkSpec {

  // Canonical 6-row fixture (FIXTURES.md A / etl_manager_test.rb:72-90).
  private val fixture = Seq(
    Schedule(1, "daily_job",  None, isEnabled = true,  "daily",    forceRun = false, 1),
    Schedule(2, "mon_job",    None, isEnabled = true,  "monday",   forceRun = false, 2),
    Schedule(3, "sat_job",    None, isEnabled = true,  "saturday", forceRun = false, 3),
    Schedule(4, "forced_on",  None, isEnabled = true,  "monday",   forceRun = true,  4),
    Schedule(5, "forced_off", None, isEnabled = false, "monday",   forceRun = true,  5),
    Schedule(6, "disabled",   None, isEnabled = false, "daily",    forceRun = false, 6))

  private def scheduler = {
    val reg = new JobRegistry
    val runner = new JobRunner(spark, new DefaultsStore, new StatusTracker)
    new Scheduler(reg, runner)
  }

  test("planned/forced selection matrix matches reference counts 2/3/3/1") {
    val s = scheduler
    val tue = LocalDate.of(2026, 8, 11) // a Tuesday
    val mon = LocalDate.of(2026, 8, 10)
    val sat = LocalDate.of(2026, 8, 8)
    assert(s.plannedSchedules(fixture, tue).map(_.jobName) == Seq("daily_job", "forced_on"))
    assert(s.plannedSchedules(fixture, mon).map(_.jobName) == Seq("daily_job", "mon_job", "forced_on"))
    assert(s.plannedSchedules(fixture, sat).map(_.jobName) == Seq("daily_job", "sat_job", "forced_on"))
    assert(s.forcedSchedules(fixture).map(_.jobName) == Seq("forced_on"))
  }

  test("selection is ordered by run_order (etl_manager.rb:100)") {
    val shuffled = fixture.reverse
    assert(scheduler.plannedSchedules(shuffled, LocalDate.of(2026, 8, 10)).map(_.runOrder) == Seq(1, 2, 4))
  }

  test("legacy due-semantics: daily dedup, weekly ≥7 days (job_schedule.rb:33-82)") {
    val s     = scheduler
    val today = LocalDate.of(2026, 8, 12)
    val daily  = fixture.head
    val weekly = daily.copy(schedule = "weekly")
    assert(s.isDue(daily, today, None))
    assert(!s.isDue(daily, today, Some(today)))
    assert(s.isDue(daily, today, Some(today.minusDays(1))))
    assert(!s.isDue(weekly, today, Some(today.minusDays(6))))
    assert(s.isDue(weekly, today, Some(today.minusDays(7))))
    assert(s.isDue(daily.copy(forceRun = true), today, Some(today)))
  }
}

class JobLifecycleSpec extends SparkSpec {

  private class RecordingJob(val name: String, fail: Boolean) extends EtlJob {
    var ran = false
    override def run(ctx: JobContext): Unit = {
      ctx.setPhase("working") // reference job.rb:69-76 / test.rb:15-17
      if (fail) throw new JobFailedException("boom")
      ran = true
    }
  }

  private def fixedClock: () => Instant = {
    val it = Iterator.iterate(Instant.parse("2026-01-01T00:00:00Z"))(_.plusSeconds(10))
    () => it.next()
  }

  test("lifecycle init→running→ok with phase and elapsed time (job.rb:78-139)") {
    val tracker = new StatusTracker
    val runner  = new JobRunner(spark, new DefaultsStore, tracker, fixedClock)
    val job     = new RecordingJob("good_job", fail = false)
    val id      = runner.run(job)
    val st      = tracker.all.find(_.id == id).get
    assert(job.ran)
    assert(st.status == "ok")
    assert(st.phase.contains("working"))
    assert(st.endTime.isDefined && st.endTime.get.after(st.startTime))
  }

  test("failure path records failed + message, does not throw (job.rb:110-119)") {
    val tracker = new StatusTracker
    val runner  = new JobRunner(spark, new DefaultsStore, tracker, fixedClock)
    val id      = runner.run(new RecordingJob("bad_job", fail = true))
    val st      = tracker.all.find(_.id == id).get
    assert(st.status == "failed")
    assert(st.message.contains("boom"))
  }

  test("debug mode re-raises (job.rb:110-119)") {
    val runner = new JobRunner(spark, new DefaultsStore, new StatusTracker, fixedClock)
    intercept[JobFailedException] {
      runner.run(new RecordingJob("bad_job", fail = true), debug = true)
    }
  }

  test("scheduler run loop: side-effect count and missing-job skip (job_running_test.rb:35-53, etl_manager.rb:142-145)") {
    val tracker = new StatusTracker
    val reg     = new JobRegistry
    val runner  = new JobRunner(spark, new DefaultsStore, tracker, fixedClock)
    val sched   = new Scheduler(reg, runner)
    val job     = new RecordingJob("test_job", fail = false)
    reg.register(job)
    val results = sched.runSchedules(Seq(
      Schedule(1, "test_job", None, isEnabled = true, "daily", forceRun = false, 1),
      Schedule(2, "missing_job", None, isEnabled = true, "daily", forceRun = false, 2)))
    assert(job.ran)
    assert(results.map(_._2.isDefined) == Seq(true, false))
    assert(tracker.forJob("test_job").head.status == "ok")
  }

  test("job name derivation convention (job_bundle.rb:105-108)") {
    val reg = new JobRegistry
    assert(reg.deriveName("CustomerImportETLJob") == "customer_import")
    assert(reg.deriveName("DailySyncLoadingJob") == "daily_sync")
  }
}

class JobTypesSpec extends SparkSpec {

  test("LoadingJob prepare creates the batch audit row (loading.rb:29-46, O8)") {
    val batches  = new BatchTracker
    val defaults = new DefaultsStore
    defaults.forDomain("cust_load").update("data_source_name", "crm-export")
    val tracker = new StatusTracker
    val runner  = new JobRunner(spark, defaults, tracker,
      () => java.time.Instant.parse("2026-02-01T08:00:00Z"))
    object CustLoad extends LoadingJob(batches) {
      val name = "cust_load"
      var sawBatch: Option[graft.meta.Status.Batch] = None
      def run(ctx: JobContext): Unit = { sawBatch = batch }
    }
    runner.run(CustLoad)
    val b = batches.all.head
    assert(b.batchType == "loading")
    assert(b.batchSource == "cust_load")
    assert(b.dataSourceName.contains("crm-export")) // resolved from defaults
    assert(b.batchDate.toString == "2026-02-01")
    assert(CustLoad.sawBatch.contains(b)) // visible to run() like @batch
    assert(tracker.forJob("cust_load").head.status == "ok")
  }

  test("ExtractionJob type tag (extraction.rb)") {
    object E extends ExtractionJob { val name = "e"; def run(ctx: JobContext): Unit = () }
    assert(E.jobType == "extraction")
  }

  test("CorpusPipelineJob: batch audit, stage phases, oracle-identical output") {
    val batches = new BatchTracker
    val tracker = new StatusTracker
    val runner  = new JobRunner(spark, new DefaultsStore, tracker)
    val sf  = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("cpjob").toString + "/disposition"
    runner.run(new CorpusPipelineJob(batches, Some(out)), Some(sf), debug = true)
    // status row: ok, last phase = publish (the stage trail's tail)
    val st = tracker.forJob("corpus_pipeline").head
    assert(st.status == "ok", st)
    assert(st.phase.contains("publish"), st)
    // batch audit row — the reference Loading contract (loading.rb:29-46)
    assert(batches.all.exists(b =>
      b.batchType == "loading" && b.batchSource == "corpus_pipeline"))
    // the job's published parquet is EXACTLY the oracle-gated query's
    // result over the same source (shared code path — Prep.corpusPipeline)
    val viaJob = spark.read.parquet(out).orderBy("doc_id").collect().toSeq
    val viaQuery = graft.SparkEntry.queries("pipeline_end_to_end")(spark, sf)
    assert(viaJob == viaQuery.orderBy("doc_id").collect().toSeq)
    graft.ops.CacheControl.release(viaQuery)
    // per-stage phase trail, in dataflow order
    val phases = scala.collection.mutable.ArrayBuffer.empty[String]
    val all = graft.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.col
    graft.ops.CacheControl.release(
      graft.ops.Prep.corpusPipeline(all.filter(col("doc_id") % 10 === 0),
        all.filter(col("doc_id") % 97 === 0), "doc_id", "text", phases += _))
    assert(phases.toSeq == Seq("quality_gate", "line_dedup", "span_removal",
      "near_dup_cluster", "decontaminate", "split_pack"))
  }
}

class DefaultsSpec extends SparkSpec {

  test("KV semantics: get/set/get-or-set/bool/delete (basic_test.rb:11-33)") {
    val store = new DefaultsStore
    val d     = store.forDomain("test_domain")
    assert(d.get("missing").isEmpty)
    assert(d.value("key1", "default1") == "default1") // get-or-set writes
    assert(d.get("key1").contains("default1"))
    assert(d.value("key1", "other") == "default1")    // second read returns stored
    d.update("key2", 42)
    assert(d.get("key2").contains("42"))              // values stored as strings
    d.update("flag1", "yes"); d.update("flag2", "0"); d.update("flag3", "true")
    assert(d.boolValue("flag1") && !d.boolValue("flag2") && d.boolValue("flag3"))
    assert(!d.boolValue("missing_flag"))
    d.delete("key1")
    assert(d.get("key1").isEmpty)
  }

  test("domains are isolated (etl_manager.rb:181-184)") {
    val store = new DefaultsStore
    store.forDomain("a").update("k", "va")
    store.forDomain("b").update("k", "vb")
    assert(store.forDomain("a").get("k").contains("va"))
    assert(store.forDomain("b").get("k").contains("vb"))
  }

  test("parquet persistence roundtrip") {
    val store = new DefaultsStore
    store.forDomain("d1").update("k1", "v1")
    store.forDomain("d2").update("k2", "v2")
    val path = java.nio.file.Files.createTempDirectory("defaults").toString + "/kv"
    store.save(spark, path)
    val loaded = new DefaultsStore
    loaded.load(spark, path)
    assert(loaded.snapshot == store.snapshot)
  }

  test("QueryJob runs a registered query into a named connection end-to-end") {
    val base = java.nio.file.Files.createTempDirectory("qjob").toString
    graft.io.Connections.replace(graft.io.Connections.ConnectionInfo(
      "qjob_out", "parquet", basePath = Some(base)))
    val defaults = new DefaultsStore
    // source dir resolves from the job's own defaults domain (config-as-data)
    defaults.forDomain("query_q1_pricing_summary")
      .update("source_dir", "/root/testdata/sf0.001")
    val tracker = new StatusTracker
    val runner  = new JobRunner(spark, defaults, tracker)
    val job = new QueryJob(new BatchTracker, "q1_pricing_summary",
      "qjob_out", "pricing_summary")
    val id = runner.run(job, debug = true)
    assert(tracker.all.find(_.id == id).exists(_.status == "ok"), tracker.all.toString)
    val out = spark.read.parquet(s"$base/pricing_summary.parquet")
    assert(out.count() > 0 && out.columns.contains("sum_qty"))
    // unknown query fails the run, visible in the status row
    val bad = runner.run(new QueryJob(new BatchTracker, "no_such_query", "qjob_out", "x"))
    assert(tracker.all.find(_.id == bad).exists(_.status == "failed"))
    // a failing quality gate blocks the publish and fails the run
    val gated = runner.run(new QueryJob(new BatchTracker, "q1_pricing_summary",
      "qjob_out", "gated_out",
      gate = Seq(graft.ops.Checks.Bounds("sum_qty", 0.0, 1.0)))) // impossible bound
    assert(tracker.all.find(_.id == gated).exists(r =>
      r.status == "failed" && r.message.exists(_.contains("quality gate"))))
    assert(!new java.io.File(s"$base/gated_out.parquet").exists(),
      "gated publish must not write the target")
    // a passing gate publishes normally
    val ok = runner.run(new QueryJob(new BatchTracker, "q1_pricing_summary",
      "qjob_out", "gated_ok",
      gate = Seq(graft.ops.Checks.NotNull("sum_qty"))), debug = true)
    assert(tracker.all.find(_.id == ok).exists(_.status == "ok"))
    assert(spark.read.parquet(s"$base/gated_ok.parquet").count() > 0)
  }

  test("GraphIndexMaintenanceJob publishes a fresh generation via the runner") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gimj").toString + "/g"
    // the edge DERIVATION runs at job time — two runs over a growing
    // source publish two generations
    var sourceRows = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val job = new GraphIndexMaintenanceJob(root,
      edges = ctx => { sourceRows.toDF("src", "dst") })
    val runner = new JobRunner(spark, new DefaultsStore, new StatusTracker)
    runner.run(job, debug = true)
    val idx1 = graft.ops.Graph.loadGraphIndexCurrent(spark, root)
    assert(idx1.edges.count() == 3)
    sourceRows = sourceRows :+ (3L, 4L)
    runner.run(job, debug = true)
    val idx2 = graft.ops.Graph.loadGraphIndexCurrent(spark, root)
    assert(idx2.edges.count() == 4)
    assert(new java.io.File(s"$root/gen-1").exists, "one-cycle GC grace")
  }

  test("LshIndexMaintenanceJob compacts the band index via the runner") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("lshmj").toString + "/idx"
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"),
      (3L, "epsilon zeta eta")).toDF("doc_id", "text")
    graft.ops.Dedup.buildLshIndex(docs.filter(col("doc_id") <= 2L),
      "doc_id", "text", 8, 2, idx)
    graft.ops.Dedup.appendLshIndex(docs.filter(col("doc_id") === 3L),
      "doc_id", "text", 8, 2, idx)
    val runner = new JobRunner(spark, new DefaultsStore, new StatusTracker)
    runner.run(new LshIndexMaintenanceJob(idx), debug = true)
    // compaction folded the delta tail into the organized prefix dirs
    val delta = Option(new java.io.File(idx, "delta").listFiles()).toSeq.flatten
      .count(_.getName.endsWith(".parquet"))
    assert(delta == 0, "delta tail should be consumed")
    val perPrefix = new java.io.File(idx, "organized").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bh_px="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perPrefix.nonEmpty && perPrefix.forall(_ == 1))
    // probes still see all indexed docs
    val probe = graft.ops.Dedup.probeLshIndex(spark, idx,
      Seq((9L, "alpha beta gamma")).toDF("doc_id", "text"), "doc_id", "text", 8, 2)
    assert(probe.collect().map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("MaintenanceJob packs small files, purges vectors, vacuums — via the runner") {
    import graft.ops.Manifest
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("mjob").toString + "/ds"
    // 6 tiny appends (small-file tail) + a MOR delete (vectors to purge)
    for (i <- 0 until 6)
      Manifest.append(spark.range(i * 100, i * 100 + 100).toDF("id").coalesce(1), path)
    Manifest.deleteMergeOnRead(spark, path, col("id") < 50)
    assert(Manifest.dvRowCount(spark, path) == 50)
    val nFilesBefore = Manifest.tableInfo(spark, path).entries.size
    val runner = new JobRunner(spark, new DefaultsStore, new StatusTracker)
    val job = new MaintenanceJob(path, minFileBytes = 1024 * 1024,
      analyzeCols = Seq("id"), keepVersions = 1)
    runner.run(job, debug = true)
    // packed: one file instead of six; vectors folded; facts backfilled
    val info = Manifest.tableInfo(spark, path)
    assert(info.entries.size < nFilesBefore)
    assert(Manifest.dvRowCount(spark, path) == 0)
    assert(Manifest.read(spark, path).count() == 550)
    assert(info.entries.forall { case (rel, _) => info.nulls.contains(rel) })
    // vacuum kept only the latest version's files readable
    assert(Manifest.latestVersion(spark, path) > 6)
  }
}
