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

  test("live ProcessingTime collector soaks through mid-run 5xx and timeouts") {
    // The full collector path (S1 + T1 + Airflow-retry parity): a real
    // ProcessingTime stream ticks the fetch, the server injects one
    // 503 and one beyond-timeout stall MID-RUN, and the content-keyed
    // landing must still hold exactly the distinct observations —
    // at-least-once fetch, exactly-once landing, no tick lost.
    val n = new java.util.concurrent.atomic.AtomicInteger
    def body(extra: Boolean): String = {
      val base = """{"icao":"UUEE","obs":1},{"icao":"UUEE","obs":2}"""
      if (extra) s"""{"data":[$base,{"icao":"UUEE","obs":3}]}"""
      else s"""{"data":[$base]}"""
    }
    withServer { ex =>
      val i = n.incrementAndGet()
      if (i == 2) respond(ex, 503, "upstream down") // tick 2, attempt 1
      else if (i == 4) { Thread.sleep(2500); respond(ex, 200, body(false)) } // beyond 1s budget
      else respond(ex, 200, body(extra = i >= 6))
    } { base =>
      val src = graft.sources.CheckWxSource.http("k", base = base, timeoutSeconds = 1)
      val target = java.nio.file.Files
        .createTempDirectory("graft-collector-soak").resolve("bronze").toString
      val stats = graft.sources.Collector.run(spark, src, Seq("UUEE"), target,
        ticks = 5, intervalMillis = 300, retries = 3, retryDelayMillis = 50)
      // every tick landed despite the injected failures, via retries
      assert(stats.ticksOk === 5)
      assert(stats.ticksSkipped === 0)
      // 5 ticks + one 503 retry + two timeout retries = 8 on a calm
      // host: the 2.5 s stall outlives the first retry as well (the
      // single-threaded server queues it past the 1 s client budget),
      // so the stalled tick lands on its third attempt. A documented
      // degraded-host phase can push it to a fourth (retries = 3
      // leaves that headroom) — hence a range, not an exact count.
      assert(stats.attempts >= 8 && stats.attempts <= 9,
        s"attempts=${stats.attempts}")
      // idempotent landing: 5 overlapping fetches collapse to the 3
      // distinct observations on the content key
      val landed = spark.read.parquet(target)
      assert(landed.count() === 3)
      assert(landed.select("_id").distinct().count() === 3)
    }
  }
}
