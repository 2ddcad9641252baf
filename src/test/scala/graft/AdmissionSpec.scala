package graft

import graft.streaming.Admission
import graft.streaming.Admission.{Admitted, Doc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming token-budget admission: greedy arrival-order per-source
  * admission with skip-not-stop semantics, state = one counter per
  * source, exactly-once across a checkpoint restart. */
class AdmissionSpec extends SparkTestBase {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocks[T](f: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev.fold(spark.conf.unset(providerKey))(
      spark.conf.set(providerKey, _))
  }

  test("per-source budget admits greedily, skips what no longer " +
    "fits, survives restart") { withRocks {
    implicit val sql = spark.sqlContext
    val ck = java.nio.file.Files
      .createTempDirectory("adm_ck").toString
    val out = java.nio.file.Files
      .createTempDirectory("adm_out").toString
    val in = MemoryStream[Doc]
    // parquet sink, not memory: the memory sink cannot recover from
    // a checkpoint, and the restart IS what's under test; reading
    // the stream's own output dir goes through _spark_metadata, so
    // uncommitted files stay invisible
    def start() = Admission.tokenBudget(in.toDS(), budget = 100L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    def got: Set[(Long, String, Long, Long)] =
      spark.read.parquet(out).as[Admitted].collect()
        .map(a => (a.doc_id, a.source, a.n_tokens, a.cum_tokens)).toSet
    val q1 = start()
    try {
      // wave 1: s fills to 70; t independently to 90
      in.addData(Doc(1, "s", 40), Doc(2, "s", 30), Doc(1, "t", 90))
      q1.processAllAvailable()
      assert(got == Set((1L, "s", 40L, 40L), (2L, "s", 30L, 70L),
        (1L, "t", 90L, 90L)), got)
    } finally q1.stop()
    // restart on the same checkpoint: used=70/90 must persist
    val q2 = start()
    try {
      // doc 3 (50) no longer fits s (70+50>100) — SKIPPED, but doc 4
      // (20) after it still fits (skip-not-stop); t is full for 20
      // but admits the 10
      in.addData(Doc(3, "s", 50), Doc(4, "s", 20),
        Doc(2, "t", 20), Doc(3, "t", 10))
      q2.processAllAvailable()
      val after = got
      assert(after.contains((4L, "s", 20L, 90L)),
        s"skip-not-stop violated: $after")
      assert(!after.exists(_ == ((3L, "s", 50L, 120L))) &&
        !after.exists(a => a._1 == 3L && a._2 == "s"),
        s"over-budget doc admitted: $after")
      assert(after.contains((3L, "t", 10L, 100L)), after)
      assert(!after.exists(a => a._1 == 2L && a._2 == "t"), after)
      // totals never exceed the budget
      assert(after.groupBy(_._2).forall(_._2.map(_._3).sum <= 100L))
    } finally q2.stop()
  } }

  test("within-batch admission order is doc_id, not arrival") {
    withRocks {
      implicit val sql = spark.sqlContext
      val in = MemoryStream[Doc]
      val q = Admission.tokenBudget(in.toDS(), budget = 50L)
        .writeStream.format("memory").queryName("adm_order")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("adm_ck2").toString)
        .outputMode(OutputMode.Append).start()
      try {
        // arrival order 9 then 1 — but 1 admits first (doc_id sort),
        // so 9 (40) no longer fits after 1 (30)
        in.addData(Doc(9, "s", 40), Doc(1, "s", 30))
        q.processAllAvailable()
        val got = spark.table("adm_order").as[Admitted].collect()
          .map(a => (a.doc_id, a.cum_tokens)).toSet
        assert(got == Set((1L, 30L)), got.toString)
      } finally q.stop()
    }
  }
}
