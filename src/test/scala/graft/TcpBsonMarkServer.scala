package graft

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentLinkedQueue

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.Bson

/** In-test BSON document server: the same splits / max_id / find
  * semantics as `TcpMarkServer`, but every request and document is a
  * BSON frame and pages end with an EMPTY document — the stand-in for
  * a real MongoDB wire endpoint. Records each decoded request (as
  * JSON text) so specs can assert pushdown crossed the wire in
  * binary. */
final class TcpBsonMarkServer(
  collections: Map[String, Seq[TcpMarkServer.Doc]]) {
  private val om = new ObjectMapper()
  private val sorted = collections.view.mapValues(_.sortBy(_.id)).toMap
  val requests = new ConcurrentLinkedQueue[String]()
  /** When set, every `find` serves at most ONE document and severs
    * the connection WITHOUT the end-of-page empty document. */
  @volatile var severMidPage = false
  @volatile private var server: ServerSocket = _
  @volatile private var running = false

  def start(): Int = {
    server = new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1"))
    running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val h = new Thread(() => handle(sock), "tcp-bson-conn")
          h.setDaemon(true)
          h.start()
        } catch { case _: Throwable => () }
      }
    }, "tcp-bson-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = { running = false; if (server != null) server.close() }

  private val EmptyDoc = Bson.encode(om.createObjectNode())

  private def handle(sock: Socket): Unit = {
    try {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      var req = Bson.read(in)
      while (req != null) { // one connection serves many requests
        requests.add(req.toString)
        def str(k: String): Option[String] = {
          val n = req.get(k)
          if (n == null || n.isNull) None else Some(n.asText())
        }
        val docs = sorted.getOrElse(str("collection").getOrElse(""), Nil)
        req.get("op").asText() match {
          case "max_id" =>
            val reply = om.createObjectNode()
            docs.lastOption.fold[Unit] { reply.putNull("max_id"); () } {
              d => reply.put("max_id", d.id); ()
            }
            out.write(Bson.encode(reply)); out.flush()
          case "splits" =>
            val n = req.get("n_splits").asInt()
            val bounds = if (docs.isEmpty || n <= 1) Nil
              else (1 until n).map(i => docs(i * docs.size / n).id)
                .distinct
            val reply = om.createObjectNode()
            val arr = reply.putArray("splits")
            bounds.foreach(arr.add)
            out.write(Bson.encode(reply)); out.flush()
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
              page.headOption.foreach(d =>
                out.write(Bson.encode(om.readTree(d.json))))
              out.flush()
              throw new java.io.IOException("simulated mid-page crash")
            }
            page.foreach(d =>
              out.write(Bson.encode(om.readTree(d.json))))
            out.write(EmptyDoc) // empty doc: end of page
            out.flush()
          case other => sys.error(s"unknown op '$other' in: $req")
        }
        req = Bson.read(in)
      }
    } catch {
      case _: java.io.IOException => () // teardown / simulated crash
      case t: Throwable =>
        // a protocol break must be VISIBLE, not a silent close a
        // spec could mistake for EOF
        System.err.println(s"TcpBsonMarkServer protocol error: $t")
    }
    finally sock.close()
  }
}
