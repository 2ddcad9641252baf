package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** In-test TCP document server speaking SocketMarkStore's line
  * protocol — the stand-in for a live MongoDB in the zero-egress
  * sandbox. Filters SERVER-SIDE (that is the point: prove the
  * pushdown crosses the wire) and records every request line plus a
  * connection counter for the spec's assertions. */
object TcpMarkServer {
  /** A served document: sort/filter keys + its raw JSON line. */
  final case class Doc(id: String, execId: String, json: String)
}

final class TcpMarkServer(collections: Map[String, Seq[TcpMarkServer.Doc]]) {
  private val om = new ObjectMapper()
  @volatile private var sorted =
    collections.view.mapValues(_.sortBy(_.id)).toMap
  val requests = new ConcurrentLinkedQueue[String]()
  val connections = new AtomicInteger(0)
  /** Currently-open client connections — lets specs assert that an
    * early-terminated scan (limit, stopped stream) closed its socket
    * instead of leaking it. */
  val active = new AtomicInteger(0)
  /** When set, every `find` serves at most ONE document and severs
    * the connection WITHOUT the end-of-page blank line — a server
    * crash mid-page, for exactly-once restart specs. */
  @volatile var severMidPage = false
  @volatile private var server: ServerSocket = _
  @volatile private var running = false

  /** Append documents at runtime (streaming-source tests: new data
    * arriving between micro-batches). */
  def add(collection: String, docs: TcpMarkServer.Doc*): Unit =
    synchronized {
      sorted = sorted.updated(collection,
        (sorted.getOrElse(collection, Nil) ++ docs).sortBy(_.id))
    }

  /** Binds 127.0.0.1:`port` (0 = ephemeral; a fixed port lets a spec
    * restart a "crashed" server at the address a stream has pinned). */
  def start(port: Int = 0): Int = {
    server = new ServerSocket()
    server.setReuseAddress(true) // rebinding a just-crashed address
    // a fixed-port rebind can race the previous server's close (the
    // old socket lingers briefly even with SO_REUSEADDR when its
    // accept loop is mid-teardown) — retry briefly instead of
    // failing the restart spec on scheduler timing
    var attempts = 0
    var bound = false
    while (!bound) {
      try {
        server.bind(new java.net.InetSocketAddress(
          InetAddress.getByName("127.0.0.1"), port), 16)
        bound = true
      } catch {
        case e: java.net.BindException if port != 0 && attempts < 50 =>
          attempts += 1
          Thread.sleep(100)
          server.close()
          server = new ServerSocket()
          server.setReuseAddress(true)
        case e: Throwable => throw e
      }
    }
    running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          connections.incrementAndGet()
          val h = new Thread(() => handle(sock), "tcp-mark-conn")
          h.setDaemon(true)
          h.start()
        } catch { case _: Throwable => () } // closed during accept
      }
    }, "tcp-mark-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; if (server != null) server.close() }

  private def handle(sock: Socket): Unit = {
    active.incrementAndGet()
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, UTF_8))
      val out = new PrintWriter(sock.getOutputStream, true)
      var line = in.readLine()
      while (line != null) { // one connection serves many requests
        requests.add(line)
        val req = om.readTree(line)
        def str(k: String): Option[String] = {
          val n = req.get(k)
          if (n == null || n.isNull) None else Some(n.asText())
        }
        val docs = sorted.getOrElse(str("collection").getOrElse(""), Nil)
        req.get("op").asText() match {
          case "max_id" =>
            // highest _id currently in the collection (the streaming
            // source's latestOffset probe); null when empty
            val m = docs.lastOption.map(d =>
              SocketMarkStoreTestJson.js(d.id)).getOrElse("null")
            out.println(s"""{"max_id":$m}""")
          case "splits" =>
            val n = req.get("n_splits").asInt()
            // n-1 internal boundaries, evenly spaced over the id order
            val bounds = if (docs.isEmpty || n <= 1) Nil
              else (1 until n).map(i => docs(i * docs.size / n).id)
                .distinct
            out.println(bounds.map(SocketMarkStoreTestJson.js)
              .mkString("{\"splits\":[", ",", "]}"))
          case "find" =>
            val execs = Option(req.get("execution_ids"))
              .filter(n => !n.isNull).map { n =>
                import scala.jdk.CollectionConverters._
                n.elements().asScala.map(_.asText()).toSet
              }
            val page = docs.iterator
              .filter(d => str("min_id").forall(d.id >= _))
              .filter(d => str("max_id").forall(d.id < _))
              .filter(d => str("start_from").forall(d.id >= _))
              .filter(d => str("after_id").forall(d.id > _))
              .filter(d => execs.forall(_.contains(d.execId)))
              .take(req.get("batch_size").asInt())
              .toVector
            if (severMidPage) {
              page.headOption.foreach(d => out.println(d.json))
              out.flush()
              throw new java.io.IOException("simulated mid-page crash")
            }
            page.foreach(d => out.println(d.json))
            out.println() // blank line: end of page
          case other => sys.error(s"unknown op '$other' in: $line")
        }
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => () // teardown / simulated crash
      case t: Throwable =>
        // a protocol break (unknown op, missing field) must be
        // VISIBLE, not a silent close a spec could mistake for EOF
        System.err.println(s"TcpMarkServer protocol error: $t")
    }
    finally { sock.close(); active.decrementAndGet() }
  }
}

/** Tiny JSON string escape shared by the fixture server. */
object SocketMarkStoreTestJson {
  def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
