package graft.jobs

import java.time.Instant
import graft.meta.Status.Batch

/** Batch audit records — reference `etl_batches`
  * (`install/etl_tables.mysql.sql:1-13`, model `lib/etl/batch.rb`).
  */
final class BatchTracker {
  private val rows   = scala.collection.mutable.ArrayBuffer.empty[Batch]
  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)

  def create(batchType: String, source: String, dataSourceName: Option[String],
             dataSourceUrl: Option[String], now: Instant): Batch = synchronized {
    val b = Batch(nextId.getAndIncrement(), batchType, source, dataSourceName,
      dataSourceUrl, java.sql.Date.valueOf(java.time.LocalDate.ofInstant(now, java.time.ZoneOffset.UTC)),
      System.getProperty("user.name", "unknown"))
    rows += b
    b
  }

  def all: Seq[Batch] = synchronized(rows.toSeq)
}

/** Extraction job type — reference `lib/etl/extraction.rb`: a naming
  * convention over `Job`, no extra lifecycle.
  */
abstract class ExtractionJob extends EtlJob {
  override val jobType: String = "extraction"
}

/** Loading job type — reference `lib/etl/loading.rb:24-50`: `prepare`
  * creates an `etl_batches` audit row (batch_type='loading', source=job
  * name, data source name/url from attributes or defaults).
  */
abstract class LoadingJob(batches: BatchTracker) extends EtlJob {
  override val jobType: String = "loading"

  /** Set by prepare; available to run() like the reference's `@batch`. */
  @volatile protected var batch: Option[Batch] = None

  def dataSourceName: Option[String] = None
  def dataSourceUrl: Option[String]  = None

  override def prepare(ctx: JobContext): Unit = {
    val dsName = dataSourceName.orElse(ctx.defaults.get("data_source_name"))
    val dsUrl  = dataSourceUrl.orElse(ctx.defaults.get("data_source_url"))
    batch = Some(batches.create("loading", name, dsName, dsUrl, ctx.now))
  }
}

/** Config-driven bridge between the query registry and the connection
  * registry: run a registered `SparkEntry` query over a source directory
  * and publish the result through a named connection — the shape of the
  * reference's nightly "derive table X into schema Y" loading jobs, with
  * the query registry standing in for its SQL-string builders. Source
  * dir, target connection/table, and write mode all resolve from the
  * job's `Defaults` domain (config-as-data, reference §2.8), overridable
  * at construction.
  */
class QueryJob(batches: BatchTracker, val queryName: String,
               targetConnection: String, targetTable: String,
               sourceDir: Option[String] = None,
               mode: String = "overwrite",
               gate: Seq[graft.ops.Checks.Check] = Nil) extends LoadingJob(batches) {
  override val name: String = s"query_$queryName"

  override def run(ctx: JobContext): Unit = {
    val fn = graft.SparkEntry.queries.getOrElse(queryName,
      throw new IllegalArgumentException(s"unknown query: $queryName"))
    val dir = sourceDir.orElse(ctx.defaults.get("source_dir")).getOrElse(
      throw new IllegalArgumentException(
        s"no source_dir for $name: pass one or set defaults('source_dir')"))
    ctx.setPhase("mapping")
    val result = fn(ctx.spark, dir)
    // quality gate BEFORE publish — a failed expectation fails the job
    // (status row 'failed' with the violation), and the target keeps its
    // previous contents; the reference's quality_status as a load gate
    if (gate.nonEmpty) {
      ctx.setPhase("quality_check")
      // any non-true verdict fails — a NULL passed (however produced)
      // must block the publish, not slip through a `!passed` filter
      import org.apache.spark.sql.functions.{coalesce, col, lit, not}
      val failed = graft.ops.Checks.run(result, gate)
        .filter(not(coalesce(col("passed"), lit(false)))).collect()
      if (failed.nonEmpty) {
        val detail = failed.map(r => s"${r.getString(0)}(${r.getString(1)})=" +
          r.getDouble(2)).mkString(", ")
        throw new IllegalStateException(s"quality gate failed: $detail")
      }
    }
    ctx.setPhase("loading")
    graft.io.Connections.write(result, targetConnection, targetTable, mode)
  }
}

/** The capstone corpus-curation dataflow as an ORCHESTRATED loading job —
  * the reference's whole identity is "jobs that run dataflows"
  * (`lib/etl/loading.rb:134-221` composes mapping + update-join +
  * finalize inside a Job with a batch audit row and per-stage phases);
  * this registers [[graft.ops.Prep.corpusPipeline]] the same way:
  * `prepare` creates the `etl_batches` audit row (LoadingJob), every
  * stage stamps the status row's phase through `ctx.setPhase`, and the
  * disposition frame publishes as parquet. Runnable via
  * `Cli run corpus_pipeline <sourceDir>`; the OUTPUT is byte-identical
  * to the oracle-gated `pipeline_end_to_end` query over the same source
  * (same code path), so the job's correctness is already hash-pinned.
  * Source dir resolves from the run argument, then the job's defaults
  * domain; the output dir MUST come from the constructor or
  * defaults('output_dir') — a guessed sibling of the source dir would
  * write next to (or, for a relative arg, at the literal path
  * "null/…" outside) a source tree the job has no business writing
  * into; fixtures like /root/testdata are read-only.
  */
class CorpusPipelineJob(batches: BatchTracker,
                        outPath: Option[String] = None) extends LoadingJob(batches) {
  override val name: String = "corpus_pipeline"

  override def run(ctx: JobContext): Unit = {
    val dir = ctx.argument.orElse(ctx.defaults.get("source_dir")).getOrElse(
      throw new IllegalArgumentException(
        "no source dir: pass one as the run argument or set defaults('source_dir')"))
    val out = outPath.orElse(ctx.defaults.get("output_dir")).getOrElse(
      throw new IllegalArgumentException(
        "no output dir: construct CorpusPipelineJob(outPath=...) or set " +
          "defaults('output_dir') — refusing to guess a path beside the " +
          "source tree"))
    val all = graft.Tables.documents(ctx.spark, dir)
    import org.apache.spark.sql.functions.col
    val disposition = graft.ops.Prep.corpusPipeline(
      all.filter(col("doc_id") % 10 === 0),
      all.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", ctx.setPhase)
    ctx.setPhase("publish")
    disposition.write.mode("overwrite").parquet(out)
    graft.ops.CacheControl.release(disposition)
  }
}

/** Scheduled maintenance of a manifest-versioned dataset — the
  * orchestration loop applied to the engine's own storage: bin-pack the
  * small-file tail ([[graft.ops.Manifest.compactSmallFiles]]), fold
  * deletion vectors in when they exceed `maxDvRows`
  * ([[graft.ops.Manifest.purgeDeletes]]), backfill missing per-file facts
  * for `analyzeCols` (one incremental ANALYZE commit), and vacuum
  * versions beyond `keepVersions`. Each step is just another commit, so a
  * crash mid-job leaves a consistent dataset — re-running completes the
  * rest. This is the cron target at 100 TB: streaming appends leave a
  * small-file tail and MOR upserts accumulate vectors; a nightly
  * MaintenanceJob bounds both without ever blocking writers or readers.
  */
/** Maintenance for a continuously-appended LSH band index: every gate
  * batch adds its own file set to each touched prefix directory, so probe
  * cost grows with BATCH COUNT rather than data; the nightly compaction
  * ([[graft.ops.Dedup.compactLshIndex]]) collapses each prefix back to
  * ~one file behind an atomic directory swap. Schedule alongside the
  * corpus dataset's [[MaintenanceJob]].
  */
/** Scheduled refresh of a standing graph index: re-derive the current
  * edge frame and publish a new immutable generation behind the atomic
  * pointer ([[graft.ops.Graph.rebuildGraphIndex]]) — the graph analog of
  * [[LshIndexMaintenanceJob]]'s band-index compaction cadence. `edges`
  * is a derivation function, not a frame: the job must see the SOURCE's
  * state at run time, not a plan captured at registration.
  */
class GraphIndexMaintenanceJob(val root: String,
                               edges: JobContext => org.apache.spark.sql.DataFrame,
                               srcCol: String = "src", dstCol: String = "dst")
    extends EtlJob {
  override val name: String =
    s"rebuild_graph_index_${new java.io.File(root).getName}"
  override val jobType: String = "maintenance"
  override def run(ctx: JobContext): Unit = {
    ctx.setPhase("rebuild_index")
    graft.ops.Graph.rebuildGraphIndex(edges(ctx), srcCol, dstCol, root): Unit
  }
}

/** Scheduled re-seed/re-train rebuild of a standing IVF index
  * ([[graft.ops.Similarity.rebuildIvfIndexAuto]]): generation build +
  * atomic pointer repoint + one-cycle deferred GC, the same
  * refresh-under-readers cadence [[GraphIndexMaintenanceJob]] runs for
  * the graph index. Corpus and calibration-query frames are derived at
  * RUN time (a frame captured at registration would freeze the source
  * state). Single writer per root — schedule, don't overlap.
  */
class IvfIndexMaintenanceJob(val root: String,
                             corpus: JobContext => org.apache.spark.sql.DataFrame,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             kmeansIters: Int = 0,
                             sampleQueries: JobContext => Option[org.apache.spark.sql.DataFrame] = _ => None,
                             k: Int = 5, recallTarget: Double = 0.9,
                             scorer: graft.ops.Similarity.VecScore =
                               graft.ops.Similarity.CosineScore)
    extends EtlJob {
  override val name: String =
    s"rebuild_ivf_index_${new java.io.File(root).getName}"
  override val jobType: String = "maintenance"
  override def run(ctx: JobContext): Unit = {
    ctx.setPhase("rebuild_index")
    graft.ops.Similarity.rebuildIvfIndexAuto(corpus(ctx), idCol, vecCol,
      root, kmeansIters, sampleQueries(ctx), k, recallTarget, scorer): Unit
  }
}

class LshIndexMaintenanceJob(val indexPath: String) extends EtlJob {
  override val name: String =
    s"compact_lsh_${new java.io.File(indexPath).getName}"
  override val jobType: String = "maintenance"
  override def run(ctx: JobContext): Unit = {
    ctx.setPhase("compact_index")
    graft.ops.Dedup.compactLshIndex(ctx.spark, indexPath)
  }
}

class MaintenanceJob(val path: String,
                     minFileBytes: Long = 32L * 1024 * 1024,
                     targetFileBytes: Long = 128L * 1024 * 1024,
                     maxDvRows: Long = 0L,
                     analyzeCols: Seq[String] = Nil,
                     keepVersions: Int = 10) extends EtlJob {
  override val name: String = s"maintain_${new java.io.File(path).getName}"
  override val jobType: String = "maintenance"

  override def run(ctx: JobContext): Unit = {
    import graft.ops.Manifest
    val spark = ctx.spark
    require(Manifest.latestVersion(spark, path) > 0,
      s"no committed version at $path — nothing to maintain")
    ctx.setPhase("compact_small_files")
    Manifest.compactSmallFiles(spark, path, minFileBytes, targetFileBytes): Unit
    ctx.setPhase("purge_deletes")
    if (Manifest.dvRowCount(spark, path) > maxDvRows)
      Manifest.purgeDeletes(spark, path): Unit
    if (analyzeCols.nonEmpty) {
      ctx.setPhase("analyze")
      Manifest.analyze(spark, path, analyzeCols): Unit
    }
    ctx.setPhase("vacuum")
    Manifest.vacuum(spark, path, keepVersions = keepVersions)
  }
}
