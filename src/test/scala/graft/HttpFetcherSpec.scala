package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.operators.{Enrich, HttpFetcher}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** S7 over REAL sockets: an in-test JDK HttpServer plays the Drupal
  * hash service (auth-checked GET per key, 404 misses, 5xx failures)
  * and HttpFetcher drives it through Enrich's distinct-key +
  * negative-cache contract. */
object HttpFetcherSpecServer {
  val hits = new AtomicInteger(0)
  val authSeen = new ConcurrentHashMap[String, Integer]()
  @volatile var server: HttpServer = _

  def start(): Int = {
    hits.set(0); authSeen.clear()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hash/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        hits.incrementAndGet()
        Option(x.getRequestHeaders.getFirst("Authorization"))
          .foreach(a => authSeen.merge(a, 1, (p, q) => p + q))
        val key = x.getRequestURI.getPath.stripPrefix("/hash/")
        def send(code: Int, body: String): Unit = {
          val b = body.getBytes(UTF_8)
          x.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
          if (b.nonEmpty) { x.getResponseBody.write(b) }
          x.close()
        }
        key match {
          case k if k.startsWith("boom") => send(500, "server error")
          case k if k.startsWith("miss") => send(404, "")
          case k => send(200, s"sha256-of-$k")
        }
      }
    })
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}

class HttpFetcherSpec extends SparkTestBase {
  import spark.implicits._

  test("enrich over real HTTP: hits, 404 misses, 5xx failures, auth") {
    val port = HttpFetcherSpecServer.start()
    try {
      val init = HttpFetcher.forEnrich(
        k => s"http://127.0.0.1:$port/hash/$k",
        basicAuth = Some(("etl", "s3cret")),
        connectTimeoutMs = 2000, readTimeoutMs = 2000)
      // duplicate keys on purpose: the service must see each once
      val facts = Seq("img1", "img1", "img2", "missX", "boomY", "boomY")
        .zipWithIndex.toDF("k", "row_id")
      val lut = Enrich.lookupTableWith(facts, "k")(init)
        .collect()
        .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
        .toSet
      assert(lut == Set(
        ("img1", Some("sha256-of-img1"), true),
        ("img2", Some("sha256-of-img2"), true),
        ("missX", None, true),   // 404: genuine miss, fetch_ok
        ("boomY", None, false))) // 500: failure, retryable
      // distinct-key contract across the wire: 4 requests, not 6
      assert(HttpFetcherSpecServer.hits.get() == 4,
        s"expected 4 HTTP requests, saw ${HttpFetcherSpecServer.hits.get()}")
      // the basic-auth header actually reached the server on every call
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("etl:s3cret".getBytes(UTF_8))
      assert(HttpFetcherSpecServer.authSeen.getOrDefault(expected, 0) == 4)

      // full enrich path: fact rows keep their join semantics —
      // non-null hashes land on the img1 pair + img2 (missX is a 404
      // miss, boomY a failure: both null)
      val out = Enrich.enrichWith(facts, "k", "hash")(init)
      assert(out.count() == 6)
      assert(out.filter(col("hash").isNotNull).count() == 3)
    } finally HttpFetcherSpecServer.stop()
  }

  test("connection-refused surfaces as a cached failure, not a crash") {
    // a port with no listener: every fetch throws IO, Enrich records it
    val init = HttpFetcher.forEnrich(
      k => s"http://127.0.0.1:1/hash/$k",
      connectTimeoutMs = 500, readTimeoutMs = 500)
    val lut = Enrich.lookupTableWith(Seq("a", "b").toDF("k"), "k")(init)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toSet
    assert(lut == Set(("a", false), ("b", false)))
  }
}
