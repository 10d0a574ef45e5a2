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
