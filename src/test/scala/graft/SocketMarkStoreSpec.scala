package graft

import graft.sources.MarkStores
import graft.pipelines.MongoMarksPipeline
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The live-protocol MarkStore against a real TCP server: per-task
  * connections, server-side pushdown, and cursor batching — the
  * contract a production Mongo-style connector must satisfy
  * (MIGRATION §S6; reference mongo-etl/mongodb_to_rdf.py:499-515). */
class SocketMarkStoreSpec extends SparkTestBase {

  private def markDoc(i: Int): TcpMarkServer.Doc = {
    val id = f"m-$i%03d"
    val exec = if (i % 2 == 0) "exec-2" else "exec-1"
    TcpMarkServer.Doc(id, exec,
      s"""{"_id":"$id","provenance":{"analysis":{"execution_id":"$exec"},""" +
        s""""image":{"imageid":"img-$i","slide":"slide-${i % 3}"}}}""")
  }
  private val marks = (1 to 20).map(markDoc)
  private val analyses = Seq(TcpMarkServer.Doc("a-001", "exec-1",
    """{"_id":"a-001","analysis":{"execution_id":"exec-1",""" +
      """"algorithm_params":{"image_width":100,"image_height":200,""" +
      """"case_id":"case-7"}},"image":{"imageid":"img-1",""" +
      """"subject":"s","study":"st","slide":"slide-0"}}"""))

  private def withServer[A](f: (TcpMarkServer, Int) => A): A = {
    val srv = new TcpMarkServer(Map("marks" -> marks,
      "analyses" -> analyses))
    val port = srv.start()
    try f(srv, port) finally srv.stop()
  }

  private def opts(port: Int, extra: (String, String)*) =
    Map("host" -> "127.0.0.1", "port" -> port.toString,
      "partitions" -> "3", "batch.size" -> "4") ++ extra

  test("a severed connection mid-page fails the read, never truncates") {
    withServer { (srv, port) =>
      srv.severMidPage = true
      val store = MarkStores("socket", opts(port))
      // the task must THROW (a truncated page is indistinguishable
      // from a short final page only if the end-of-page marker is
      // ignored) — a silent partial read here would be data loss
      val ex = intercept[Exception] {
        store.marks(spark).select("_id").collect()
      }
      def hasEof(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[java.io.IOException] ||
          Option(t.getMessage).exists(_.contains("severed")) ||
          hasEof(t.getCause))
      assert(hasEof(ex), s"expected severed-page IOException, got $ex")
      // and the FAILED tasks released their sockets (the
      // construction/first-page failure path must close too)
      val deadline = System.currentTimeMillis() + 5000
      while (srv.active.get() > 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(srv.active.get() == 0,
        s"${srv.active.get()} connections leaked after failed read")
    }
  }

  test("full read: schema'd rows over per-partition connections") {
    withServer { (srv, port) =>
      val store = MarkStores("socket", opts(port))
      val df = store.marks(spark)
      assert(df.schema == MongoMarksPipeline.markSchema)
      val ids = df.select("_id").collect().map(_.getString(0)).sorted
      assert(ids.toSeq == marks.map(_.id))
      // 1 driver splits call + one connection PER partition
      assert(srv.connections.get() >= 4,
        s"expected >= 4 connections, saw ${srv.connections.get()}")
      assert(srv.requests.asScala.count(_.contains("\"op\":\"splits\"")) == 1)

      val analysesDf = store.analyses(spark)
      assert(analysesDf.schema == MongoMarksPipeline.analysisSchema)
      assert(analysesDf.select("analysis.algorithm_params.case_id")
        .collect().map(_.getString(0)).toSeq == Seq("case-7"))
    }
  }

  test("cursor batching: ranges page with after_id, never over batch_size") {
    withServer { (srv, port) =>
      MarkStores("socket", opts(port)).marks(spark).count()
      val finds = srv.requests.asScala.filter(_.contains("\"op\":\"find\""))
      // 20 docs / 3 ranges / batch 4 → every range needs >= 2 pages
      assert(finds.size >= 6, s"expected >= 6 find pages, saw $finds")
      assert(finds.exists(_.contains("\"after_id\":\"m-")),
        "no after_id cursor request seen — paging did not happen")
      assert(finds.forall(_.contains("\"batch_size\":4")))
    }
  }

  test("pushdown travels in the request and filters server-side") {
    withServer { (srv, port) =>
      val store = MarkStores("socket", opts(port))
      val fromIds = store.marks(spark, startFromId = Some("m-010"))
        .select("_id").collect().map(_.getString(0)).sorted
      assert(fromIds.toSeq == marks.map(_.id).filter(_ >= "m-010"))
      assert(srv.requests.asScala
        .exists(_.contains("\"start_from\":\"m-010\"")))

      val exec1 = store.marks(spark,
        executionIds = Some(Seq("exec-1")))
      assert(exec1.select("provenance.analysis.execution_id").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("exec-1"))
      assert(exec1.count() == marks.count(_.execId == "exec-1"))
      assert(srv.requests.asScala
        .exists(_.contains("\"execution_ids\":[\"exec-1\"]")))
    }
  }

  test("the pipeline's query path runs unchanged over the live store") {
    withServer { (_, port) =>
      // the S6 filtered-scan seam: same call shape as the jsonl store
      val store = MarkStores("socket",
        opts(port, "batch.size" -> "7"))
      val df = store.marks(spark, startFromId = Some("m-005"),
        executionIds = Some(Seq("exec-1")))
      val got = df.select("_id").collect().map(_.getString(0)).sorted
      assert(got.toSeq ==
        marks.filter(d => d.id >= "m-005" && d.execId == "exec-1").map(_.id))
    }
  }
}
