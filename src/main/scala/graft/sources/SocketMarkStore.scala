package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.pipelines.MongoMarksPipeline
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** A LIVE MarkStore over a TCP line protocol — the in-sandbox analog
  * of the reference's MongoDB connector (mongo-etl/utils/
  * mongo_client.py; query construction mongodb_to_rdf.py:503-515),
  * exercising the three things a real wire connector must get right
  * that a file-backed store never does:
  *
  *  - SERVER-SIDE pushdown: `start_from` / `execution_ids` travel in
  *    the request and the server filters before anything crosses the
  *    wire (the reference's find() with `{_id: {$gte}}` /
  *    `{execution_id: {$in}}` against its own server-side indexes,
  *    build_indexes.sh:18-36);
  *  - PER-PARTITION connections (X6): the driver makes exactly one
  *    call (split boundaries — the splitVector pattern); each Spark
  *    task then opens its OWN socket for its id range, so the fetch
  *    fan-out scales with partitions, not through the driver;
  *  - CURSOR batching (T1): a task pages its range in `batch.size`
  *    chunks over one connection, `after_id`-keyed — the getMore
  *    loop — so no batch ever materializes more than batch.size
  *    documents on either side of the socket.
  *
  * Wire format, one JSON object per line:
  *   → {"op":"splits","collection":c,"n_splits":n}
  *   ← {"splits":["id…", …]}                       (internal bounds)
  *   → {"op":"find","collection":c,"min_id":m,"max_id":M,
  *      "start_from":s,"execution_ids":[…],"after_id":a,
  *      "batch_size":b}                            (nulls = absent)
  *   ← one JSON document per line, then ONE BLANK line.
  * Documents arrive ordered by _id within a range; rows parse through
  * the SAME explicit schemas as the offline store (no inference).
  *
  * Registered as format "socket" (host, port, and optionally
  * partitions / batch.size options). */
final class SocketMarkStore(options: Map[String, String])
  extends MarkStore {

  private def opt(k: String): String = options.getOrElse(k,
    throw new IllegalArgumentException(
      s"SocketMarkStore: missing option '$k'"))
  private val host = opt("host")
  private val port = opt("port").toInt
  private val nPartitions =
    options.getOrElse("partitions", "4").toInt
  private val batchSize =
    options.getOrElse("batch.size", "256").toInt
  require(nPartitions >= 1, s"partitions must be >= 1: $nPartitions")
  require(batchSize >= 1, s"batch.size must be >= 1: $batchSize")

  override def marks(spark: SparkSession, startFromId: Option[String],
    executionIds: Option[Seq[String]]): DataFrame =
    spark.read.schema(MongoMarksPipeline.markSchema)
      .json(lines(spark, "marks", startFromId, executionIds))

  override def analyses(spark: SparkSession, startFromId: Option[String],
    executionIds: Option[Seq[String]]): DataFrame =
    spark.read.schema(MongoMarksPipeline.analysisSchema)
      .json(lines(spark, "analyses", startFromId, executionIds))

  /** The raw JSONL rows of `collection`, ranged over `nPartitions`
    * tasks, each paging its own connection. */
  private def lines(spark: SparkSession, collection: String,
    startFromId: Option[String], executionIds: Option[Seq[String]])
    : Dataset[String] = {
    import spark.implicits._
    // one driver-side call: range boundaries (the splitVector step)
    val bounds = querySplits(collection)
    val ranges: Seq[(Option[String], Option[String])] =
      (None +: bounds.map(Some(_)))
        .zip(bounds.map(Some(_)) :+ None)
    val (h, p, bs) = (host, port, batchSize)
    val findFor = (min: Option[String], max: Option[String],
      after: Option[String]) => SocketMarkStore.findRequest(
      collection, min, max, startFromId, executionIds, after, bs)
    spark.createDataset(ranges)
      .repartition(ranges.size)
      .mapPartitions { it =>
        it.flatMap { case (min, max) =>
          val cursor = SocketMarkStore.pageRange(h, p, bs,
            after => findFor(min, max, after))
          // a limit/cancel stops consuming mid-range: close the
          // socket at task end, not only on drain
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => cursor.close()))
          cursor
        }
      }
  }

  /** Driver-side split query: ≤ nPartitions-1 internal boundaries. */
  private def querySplits(collection: String): Seq[String] = {
    val req = s"""{"op":"splits","collection":${
      SocketMarkStore.js(collection)},"n_splits":$nPartitions}"""
    val sock = new Socket(host, port)
    try {
      val out = new PrintWriter(new java.io.OutputStreamWriter(
        sock.getOutputStream, UTF_8), true)
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, UTF_8))
      out.println(req)
      val line = in.readLine()
      require(line != null, "splits: server closed without replying")
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(line).get("splits")
      require(node != null && node.isArray, s"bad splits reply: $line")
      import scala.jdk.CollectionConverters._
      node.elements().asScala.map(_.asText()).toSeq
    } finally sock.close()
  }
}

object SocketMarkStore {
  /** JSON string literal (escaped) — the shared graft.Json escaper
    * (its \n/\r/\t shortcuts decode identically to the \u form this
    * wire previously emitted). */
  private[sources] def js(s: String): String = graft.Json.str(s)

  private def jopt(o: Option[String]): String = o.fold("null")(js)

  private[sources] def findRequest(collection: String,
    minId: Option[String], maxId: Option[String],
    startFrom: Option[String], executionIds: Option[Seq[String]],
    afterId: Option[String], batchSize: Int): String = {
    val execs = executionIds.fold("null")(
      _.map(js).mkString("[", ",", "]"))
    s"""{"op":"find","collection":${js(collection)},""" +
      s""""min_id":${jopt(minId)},"max_id":${jopt(maxId)},""" +
      s""""start_from":${jopt(startFrom)},"execution_ids":$execs,""" +
      s""""after_id":${jopt(afterId)},"batch_size":$batchSize}"""
  }

  /** One task's whole range as a lazy page-by-page cursor: a single
    * connection, successive `find` requests keyed by the last _id of
    * the previous page (the getMore loop). The socket closes when the
    * iterator drains (a short page ends the cursor) — and document
    * order within the range is the server's _id order. An
    * early-terminated scan (limit/take, cancelled task, stopped
    * stream) never drains, so every consumer MUST also `close()` the
    * returned cursor on task completion; close is idempotent. */
  private[sources] def pageRange(host: String, port: Int,
    batchSize: Int, requestFor: Option[String] => String)
    : PagedCursor = new PagedCursor(host, port, batchSize, requestFor)

  private[sources] final class PagedCursor(host: String, port: Int,
    batchSize: Int, requestFor: Option[String] => String)
    extends Iterator[String] with AutoCloseable {
    private val sock = new Socket(host, port)
    private val out = new PrintWriter(new java.io.OutputStreamWriter(
        sock.getOutputStream, UTF_8), true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, UTF_8))

    /** One find request → its document lines. The blank end-of-page
      * line is the protocol's COMPLETION marker: EOF before it means
      * the connection died mid-page, and silently returning the
      * truncated page would look exactly like a short (final) page —
      * the task would "succeed" with missing rows and a streaming
      * batch would commit an offset it never fully read. Throw
      * instead: the task fails, the batch's offset stays uncommitted,
      * and restart re-reads the same window exactly once. */
    private def page(after: Option[String]): Seq[String] = {
      out.println(requestFor(after))
      val buf = Vector.newBuilder[String]
      var line = in.readLine()
      while (line != null && line.nonEmpty) {
        buf += line
        line = in.readLine()
      }
      if (line == null) throw new java.io.IOException(
        "mark store connection severed mid-page (EOF before the " +
          "end-of-page marker)")
      buf.result()
    }

    // the first page is fetched at construction; if IT fails there is
    // no drained/close()-able cursor yet, so release the socket here
    // or the failed task leaks its connection
    private var buf =
      try page(None)
      catch { case t: Throwable => close(); throw t }
    private var i = 0
    private var done = false
    private def advance(): Unit =
      while (!done && i >= buf.length) {
        if (buf.length < batchSize) { // short page: cursor exhausted
          done = true; close()
        } else {
          val last = lastId(buf.last)
          buf = page(Some(last)); i = 0
          if (buf.isEmpty) { done = true; close() }
        }
      }
    override def hasNext: Boolean = { advance(); !done && i < buf.length }
    override def next(): String = {
      advance()
      if (done) throw new NoSuchElementException("cursor drained")
      val l = buf(i); i += 1; l
    }
    override def close(): Unit = if (!sock.isClosed) sock.close()
  }

  /** `_id` of a served document line (cursor key). */
  private def lastId(docLine: String): String = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(docLine).get("_id")
    require(node != null, s"served doc has no _id: $docLine")
    node.asText()
  }
}
