package graft.io

import java.net.URI
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Parallel URL fetch — the reference's `DownloadManager`
  * (`lib/etl/download_manager.rb`): N download threads + batch queue + four
  * curl-family backends, collapsed into executor-side `mapPartitions`
  * (SURVEY.md §2.10/§3.3). Spark's scheduler replaces the Monitor/condvar
  * machinery; `repartition(parallelism)` replaces the thread-pool size knob
  * (reference default 1 thread, hydra `max_concurrency 20`).
  *
  * Zero-egress container: only `file://` URIs are exercised in tests; the
  * `http(s)` branch uses `java.net.http.HttpClient` (public JDK API) and is
  * structurally identical.
  */
object Fetch {

  /** Result row — the reference's download hash shape
    * (`download_manager.rb:277-284`): url, file, status_code (+user_info
    * carried by the caller's join key).
    */
  final case class FetchResult(url: String, file: Option[String], status_code: Int)

  /** Fetch each URL on the executors, `parallelism`-wide, writing bodies to
    * `destDir` with the reference's filename derivation (URL minus query,
    * last path segment — `download_manager.rb:249-251`).
    */
  def fetchAll(spark: SparkSession, urls: Seq[String], destDir: String,
               parallelism: Int = 20, timeoutMs: Int = 10000): Dataset[FetchResult] = {
    import spark.implicits._
    val n = math.max(1, math.min(parallelism, urls.size))
    spark.createDataset(urls).repartition(n).mapPartitions { it =>
      it.map(u => fetchOne(u, destDir, timeoutMs))
    }
  }

  /** One URL's outcome within a batch: the [[FetchResult]] shape plus the
    * batch id and how many attempts were spent (retries count).
    */
  final case class BatchUrlResult(batch_id: Long, url: String,
                                  file: Option[String], status_code: Int,
                                  attempts: Int)

  /** Driver-side outcome row per batch. */
  final case class BatchSummary(batch_id: Long, n_urls: Int, n_failed: Int,
                                processing_failed: Boolean)

  /** The reference's `DownloadManagerDelegate` callbacks
    * (`download_manager.rb:27-65`), minus the thread-lifecycle hooks that
    * Spark's scheduler owns. All callbacks run driver-side, after the
    * distributed fetch of the batch completed.
    */
  trait BatchDelegate extends Serializable {
    /** `process_download_batch`: consume a completed batch. Throwing marks
      * THIS batch `processing_failed`; other batches are unaffected
      * (`download_manager.rb:61-65` isolates processing per batch).
      */
    def processBatch(batchId: Long, results: Seq[BatchUrlResult]): Unit = ()
    /** `download_batch_failed`: some URL still failed after retries. */
    def batchFailed(batchId: Long, failed: Seq[BatchUrlResult]): Unit = ()
    /** `download_batch_processing_failed`. */
    def batchProcessingFailed(batchId: Long, e: Throwable): Unit = ()
  }

  /** Fetch URL batches with the reference's delegate contract: URLs fetch
    * distributed (`parallelism`-wide, exactly [[fetchAll]]'s shape), each
    * retried up to `maxAttempts` on retryable failures (5xx/connection);
    * per-batch outcomes then flow through the delegate driver-side, with
    * one batch's download or processing failure isolated from the rest.
    * Only status rows travel to the driver — bodies stay in `destDir` —
    * so the collect is O(#URLs), not O(bytes).
    */
  def fetchBatches(spark: SparkSession, batches: Seq[Seq[String]],
                   destDir: String, parallelism: Int = 20,
                   timeoutMs: Int = 10000, maxAttempts: Int = 3,
                   delegate: BatchDelegate = new BatchDelegate {}): Seq[BatchSummary] = {
    import spark.implicits._
    val tagged = batches.zipWithIndex.flatMap { case (urls, i) =>
      urls.map(u => (i.toLong, u))
    }
    val n = math.max(1, math.min(parallelism, tagged.size))
    val results = spark.createDataset(tagged).repartition(n)
      .mapPartitions { it =>
        it.map { case (bid, u) =>
          val (r, attempts) = fetchWithRetry(u, destDir, timeoutMs, maxAttempts)
          BatchUrlResult(bid, u, r.file, r.status_code, attempts)
        }
      }.collect()
    val byBatch = results.groupBy(_.batch_id)
    batches.indices.map(_.toLong).map { bid =>
      val rs = byBatch.getOrElse(bid, Array.empty[BatchUrlResult]).toSeq.sortBy(_.url)
      val failed = rs.filter(_.status_code / 100 != 2)
      if (failed.nonEmpty) delegate.batchFailed(bid, failed)
      val processingFailed =
        try { delegate.processBatch(bid, rs); false }
        catch { case e: Throwable => delegate.batchProcessingFailed(bid, e); true }
      BatchSummary(bid, rs.size, failed.size, processingFailed)
    }
  }

  /** Retry loop around [[fetchOne]]: 5xx and connection failures (599) are
    * transient and retried; 4xx is a definitive answer and is not.
    */
  private def fetchWithRetry(url: String, destDir: String, timeoutMs: Int,
                             maxAttempts: Int): (FetchResult, Int) = {
    var attempts = 0
    var r: FetchResult = null
    while ({
      attempts += 1
      r = fetchOne(url, destDir, timeoutMs)
      r.status_code >= 500 && attempts < maxAttempts
    }) ()
    (r, attempts)
  }

  /** Filename derivation — reference `download_manager.rb:249-251`. */
  def deriveFilename(url: String): String = {
    val noQuery = url.split('?').head
    noQuery.split('/').filter(_.nonEmpty).lastOption.getOrElse("download")
  }

  private def fetchOne(url: String, destDir: String, timeoutMs: Int): FetchResult = {
    val out = new java.io.File(destDir, deriveFilename(url))
    try {
      val uri = new URI(url)
      uri.getScheme match {
        case "file" =>
          val src = new java.io.File(uri)
          if (!src.exists()) FetchResult(url, None, 404)
          else {
            java.nio.file.Files.copy(src.toPath, out.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            FetchResult(url, Some(out.getAbsolutePath), 200)
          }
        case "http" | "https" =>
          val client = java.net.http.HttpClient.newBuilder()
            .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
          val req = java.net.http.HttpRequest.newBuilder(uri)
            .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofFile(out.toPath))
          // non-2xx: the handler wrote the error body — that's not a
          // download (reference keeps only successful fetches,
          // `download_manager.rb:287-321`); report the status, drop the file
          if (resp.statusCode() / 100 == 2)
            FetchResult(url, Some(out.getAbsolutePath), resp.statusCode())
          else {
            out.delete()
            FetchResult(url, None, resp.statusCode())
          }
        case other =>
          FetchResult(url, None, 400)
      }
    } catch {
      case _: Throwable => FetchResult(url, None, 599)
    }
  }
}
