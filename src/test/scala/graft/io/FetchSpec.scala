package graft.io

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import graft.SparkSpec

/** The http branch of [[Fetch]] against a JDK loopback server — zero
  * egress, zero new dependencies. Mirrors the reference's download tests
  * (`download_manager.rb:287-321`): status-code capture, failure rows,
  * filename derivation.
  */
class FetchSpec extends SparkSpec {

  private def withServer(f: (String, java.io.File) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data/report.csv", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = "a,b\n1,2\n".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/gone", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = "not here".getBytes("UTF-8")
        ex.sendResponseHeaders(404, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.start()
    val dest = java.nio.file.Files.createTempDirectory("fetch_http").toFile
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", dest)
    finally server.stop(0)
  }

  test("http fetch captures status codes; only 2xx produces a file") {
    withServer { (base, dest) =>
      val results = Fetch.fetchAll(spark,
        Seq(s"$base/data/report.csv?token=abc", s"$base/gone"),
        dest.getAbsolutePath).collect().sortBy(_.url)
      val ok = results.find(_.url.contains("report")).get
      assert(ok.status_code == 200)
      // filename derivation drops the query string, keeps the last segment
      assert(ok.file.get.endsWith("report.csv"))
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(ok.file.get)), "UTF-8") == "a,b\n1,2\n")
      val missing = results.find(_.url.contains("gone")).get
      assert(missing.status_code == 404 && missing.file.isEmpty)
      // the 404 error body must not be left behind masquerading as data
      assert(!new java.io.File(dest, "gone").exists())
    }
  }

  test("connection failure produces a failure row, not an exception") {
    // ephemeral port that was just closed — nothing listens there
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = srv.getAddress.getPort
    srv.start(); srv.stop(0)
    val dest = java.nio.file.Files.createTempDirectory("fetch_fail").toString
    val rows = Fetch.fetchAll(spark,
      Seq(s"http://127.0.0.1:$port/x.bin"), dest).collect()
    assert(rows.length == 1 && rows.head.status_code == 599 && rows.head.file.isEmpty)
  }

  test("filename derivation for http URLs (download_manager.rb:249-251)") {
    assert(Fetch.deriveFilename("http://h/a/b/c.csv?x=1&y=2") == "c.csv")
    assert(Fetch.deriveFilename("http://h/a/b/") == "b")
    assert(Fetch.deriveFilename("http://h/") == "h") // degenerate: host is the last segment
  }

  test("batch delegate: a failing batch is reported and isolated; retries honored") {
    withServer { (base, dest) =>
      // a port nothing listens on → connection failure (599, retryable)
      val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val deadPort = srv.getAddress.getPort
      srv.start(); srv.stop(0)
      val calls = scala.collection.mutable.ArrayBuffer.empty[String]
      val delegate = new Fetch.BatchDelegate {
        override def processBatch(bid: Long, rs: Seq[Fetch.BatchUrlResult]): Unit =
          calls += s"process:$bid"
        override def batchFailed(bid: Long, failed: Seq[Fetch.BatchUrlResult]): Unit =
          calls += s"failed:$bid:${failed.map(_.status_code).mkString(",")}"
      }
      val summaries = Fetch.fetchBatches(spark,
        Seq(Seq(s"$base/data/report.csv"),                        // batch 0: ok
            Seq(s"http://127.0.0.1:$deadPort/x.bin", s"$base/gone")), // batch 1: both fail
        dest.getAbsolutePath, maxAttempts = 3, delegate = delegate)
      assert(summaries.map(s => (s.batch_id, s.n_failed, s.processing_failed)) ==
        Seq((0L, 0, false), (1L, 2, false)), summaries.toString)
      // batch 1's download failure did not stop batch 0's processing
      assert(calls.count(_.startsWith("process:")) == 2)
      assert(calls.exists(_.startsWith("failed:1:")), calls.toString)
      assert(!calls.exists(_.startsWith("failed:0")), calls.toString)
      // retry contract: connection failure burned all 3 attempts, the
      // definitive 404 exactly one, the 200 exactly one
      val rerun = Fetch.fetchBatches(spark,
        Seq(Seq(s"http://127.0.0.1:$deadPort/x.bin", s"$base/gone", s"$base/data/report.csv")),
        dest.getAbsolutePath, maxAttempts = 3)
      assert(rerun.head.n_failed == 2)
      val attempts = Fetch.fetchBatches(spark,
        Seq(Seq(s"http://127.0.0.1:$deadPort/x.bin"), Seq(s"$base/gone")),
        dest.getAbsolutePath, maxAttempts = 3,
        delegate = new Fetch.BatchDelegate {
          override def processBatch(bid: Long, rs: Seq[Fetch.BatchUrlResult]): Unit =
            calls += s"attempts:$bid:${rs.map(_.attempts).mkString(",")}"
        })
      assert(calls.contains("attempts:0:3"), calls.toString) // retryable: all attempts
      assert(calls.contains("attempts:1:1"), calls.toString) // 404: no retry
    }
  }

  test("batch delegate: processing failure of one batch is isolated from the rest") {
    withServer { (base, dest) =>
      val calls = scala.collection.mutable.ArrayBuffer.empty[String]
      val delegate = new Fetch.BatchDelegate {
        override def processBatch(bid: Long, rs: Seq[Fetch.BatchUrlResult]): Unit = {
          if (bid == 0) throw new IllegalStateException("boom")
          calls += s"process:$bid"
        }
        override def batchProcessingFailed(bid: Long, e: Throwable): Unit =
          calls += s"procfail:$bid:${e.getMessage}"
      }
      val summaries = Fetch.fetchBatches(spark,
        Seq(Seq(s"$base/data/report.csv"), Seq(s"$base/data/report.csv")),
        dest.getAbsolutePath, delegate = delegate)
      assert(summaries.map(s => (s.batch_id, s.processing_failed)) ==
        Seq((0L, true), (1L, false)), summaries.toString)
      assert(calls == Seq("procfail:0:boom", "process:1"), calls.toString)
    }
  }

  test("flaky server: a 500 that recovers within maxAttempts ends in success") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky.csv", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        if (hits.incrementAndGet() < 3) {
          ex.sendResponseHeaders(500, -1); ex.close()
        } else {
          val body = "ok\n".getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body); ex.close()
        }
      }
    })
    server.start()
    val dest = java.nio.file.Files.createTempDirectory("fetch_flaky").toString
    try {
      val out = Fetch.fetchBatches(spark,
        Seq(Seq(s"http://127.0.0.1:${server.getAddress.getPort}/flaky.csv")),
        dest, maxAttempts = 3,
        delegate = new Fetch.BatchDelegate {
          override def processBatch(bid: Long, rs: Seq[Fetch.BatchUrlResult]): Unit = {
            assert(rs.head.attempts == 3 && rs.head.status_code == 200)
          }
        })
      assert(out.head.n_failed == 0)
      assert(hits.get() == 3)
    } finally server.stop(0)
  }
}
