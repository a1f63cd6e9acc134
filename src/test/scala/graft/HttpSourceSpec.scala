package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.source.{HttpSource, JsonIngest}

/** S1–S3 + O3 against a real HTTP boundary: a local JDK HttpServer
  * stands in for the BP/Mobil/Places endpoints, including a flaky
  * endpoint that fails twice before succeeding (exercising the retry
  * budget) and a permanently-broken one (exercising both error
  * policies).
  */
class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      f(server, server.getAddress.getPort)
    } finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("distributed fetch pulls payloads and pipes into a dialect normalizer") {
    withServer { (server, port) =>
      server.createContext("/bp", ex => respond(ex, 200, Fixtures.bp))
      val payloads = HttpSource.fetch(spark,
        Seq(s"http://127.0.0.1:$port/bp"), retries = 0)
      val rows = JsonIngest.normalizeBp(spark, payloads).collect()
      assert(rows.length == 1 && rows.head.getAs[String]("location_id") == "bp-001")
    }
  }

  test("O3: flaky endpoint succeeds within the retry budget") {
    withServer { (server, port) =>
      val calls = new AtomicInteger(0)
      server.createContext("/flaky", ex =>
        if (calls.incrementAndGet() <= 2) respond(ex, 500, "boom")
        else respond(ex, 200, """{"ok": true}"""))
      val out = HttpSource.fetch(spark, Seq(s"http://127.0.0.1:$port/flaky"),
        retries = 5, retryDelayMs = 10).collect()
      assert(out.toSeq == Seq("""{"ok": true}"""))
      assert(calls.get() == 3)
    }
  }

  test("Swallow policy: dead endpoint yields empty batch, not failure (Places behavior)") {
    withServer { (server, port) =>
      server.createContext("/dead", ex => respond(ex, 500, "nope"))
      val out = HttpSource.fetch(spark, Seq(s"http://127.0.0.1:$port/dead"),
        retries = 1, retryDelayMs = 10, policy = HttpSource.Swallow).collect()
      assert(out.isEmpty)
    }
  }

  test("Fail policy: dead endpoint propagates the task failure (BP/Mobil behavior)") {
    withServer { (server, port) =>
      server.createContext("/dead2", ex => respond(ex, 500, "nope"))
      intercept[org.apache.spark.SparkException] {
        HttpSource.fetch(spark, Seq(s"http://127.0.0.1:$port/dead2"),
          retries = 0, policy = HttpSource.Fail).collect()
      }
    }
  }
}
