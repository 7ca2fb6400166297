package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.CheckWxSource

/** The production `java.net.http` transport, proven against an
  * in-process HTTP server (no egress needed): API-key header delivery,
  * 2xx body passthrough, non-2xx failure (requests.raise_for_status
  * parity), request timeout, and the end-to-end fetch → unwrap path.
  */
class HttpSourceSpec extends SparkSpec {

  private def withServer(handler: HttpExchange => Unit)(test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/metar")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("sends the X-API-Key header and returns the body on 200") {
    var seenKey: String = null
    var seenPath: String = null
    withServer { ex =>
      seenKey = ex.getRequestHeaders.getFirst("X-API-Key")
      seenPath = ex.getRequestURI.getPath
      respond(ex, 200, """{"data":[{"icao":"UUEE"}]}""")
    } { base =>
      val body = CheckWxSource.httpTransport("secret-key")(
        new CheckWxSource(_ => "", base = base).url(Seq("UUEE", "UUDD")))
      assert(body === """{"data":[{"icao":"UUEE"}]}""")
      assert(seenKey === "secret-key")
      assert(seenPath === "/metar/UUEE,UUDD/decoded")
    }
  }

  test("non-2xx raises (raise_for_status parity)") {
    withServer(ex => respond(ex, 503, "upstream down")) { base =>
      val e = intercept[java.io.IOException] {
        CheckWxSource.httpTransport("k")(base)
      }
      assert(e.getMessage.contains("503"))
    }
  }

  test("request times out after the configured budget") {
    withServer { ex =>
      Thread.sleep(3000) // beyond the 1s budget below
      respond(ex, 200, "{}")
    } { base =>
      intercept[java.net.http.HttpTimeoutException] {
        CheckWxSource.httpTransport("k", timeoutSeconds = 1)(base)
      }
    }
  }

  test("end-to-end: http source feeds the distributed unwrap (S1)") {
    withServer(ex => respond(ex, 200,
      """{"data":[{"icao":"UUEE","temp":1},{"icao":"UUDD","temp":2}]}""")) { base =>
      val src = CheckWxSource.http("k", base = base)
      val rows = src.fetchDecoded(spark, Seq("UUEE", "UUDD"))
      assert(rows.count() === 2)
    }
  }

  test("empty data array still short-circuits over http (F5)") {
    withServer(ex => respond(ex, 200, """{"data":[]}""")) { base =>
      val src = CheckWxSource.http("k", base = base)
      assert(src.fetchDecoded(spark, Seq("UUEE")).isEmpty)
    }
  }
}
