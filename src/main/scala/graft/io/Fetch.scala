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
