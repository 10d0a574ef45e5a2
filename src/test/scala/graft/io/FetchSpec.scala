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
}
