package graft

import graft.operators.MinHashLsh
import graft.streaming.LshIndexMaintenance
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming twin of d4_lsh_pairs: per-batch index maintenance
  * must (a) reproduce the batch operator's candidate set on the
  * final corpus, (b) absorb post-crash batch replays exactly-once,
  * and (c) only ever broadcast the NEW batch's bands — the index
  * side never shuffles. */
class LshIndexMaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  // three near-dup families spread across batches so pairs form
  // within AND across batches
  private val b1 = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again today ok",
    2L -> "the quick brown fox jumps over the lazy dog again today yes",
    10L -> "spark plans shuffle exchanges and broadcast joins at scale")
  private val b2 = Seq(
    3L -> "the quick brown fox jumps over the lazy dog again today no",
    11L -> "spark plans shuffle exchanges and broadcast joins at scales")
  private val b3 = Seq(
    12L -> "spark plans shuffle exchanges and broadcast joins at scaled",
    20L -> "completely unrelated words about cooking pasta and sauces")

  private def dirs(tag: String): (String, String) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"lsh_ix_$tag").toString
    (s"$base/index", s"$base/pairs")
  }

  test("union of per-batch pair outputs equals batch d4 on the " +
    "final corpus") {
    implicit val sql = spark.sqlContext
    val (ix, pr) = dirs("stream")
    val in = MemoryStream[(Long, String)]
    val q = LshIndexMaintenance.maintain(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", ix, pr)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lsh_ck").toString)
      .start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable() // one micro-batch per family wave
      }
    } finally q.stop()
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(batch.nonEmpty, "fixture produced no candidate pairs")
    assert(streamed == batch,
      s"stream=$streamed\nbatch=$batch")
    // cross-batch pairs really happened (not all within one batch)
    assert(streamed.exists { case (a, b, _) => a == 1L && b == 3L },
      s"expected the cross-batch near-dup (1,3): $streamed")
  }

  test("checkpoint restart resumes batch ids — no re-emission, no " +
    "lost index bands") {
    // the T2 face for the index maintainer: stop after wave 1,
    // restart the SAME checkpoint, feed waves 2-3 — the committed
    // batch must not replay (ids resume at 1), and the final state
    // must still equal the batch operator on the full corpus
    implicit val sql = spark.sqlContext
    val (ix, pr) = dirs("restart")
    val ck = java.nio.file.Files
      .createTempDirectory("lsh_rs_ck").toString
    val in = MemoryStream[(Long, String)]
    def start() = LshIndexMaintenance.maintain(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", ix, pr)
      .option("checkpointLocation", ck).start()
    val q1 = start()
    try { in.addData(b1: _*); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try {
      in.addData(b2: _*); q2.processAllAvailable()
      in.addData(b3: _*); q2.processAllAvailable()
    } finally q2.stop()
    val streamed = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val corpus = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val batch = MinHashLsh.candidatePairs(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    graft.operators.Broadcasting.releaseAll()
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // every doc's 4 bands indexed exactly once across the restart
    val idx = LshIndexMaintenance.readIndex(spark, ix).get
    assert(idx.count() == (b1 ++ b2 ++ b3).size * 4L)
    assert(idx.select("batch").distinct().count() == 3L,
      "batch ids did not resume across the restart")
  }

  test("replaying a committed batch is a no-op; a half-written batch " +
    "overwrites cleanly") {
    val (ix, pr) = dirs("replay")
    def run(batch: Seq[(Long, String)], id: Long): Unit =
      LshIndexMaintenance.processBatch(
        batch.toDF("doc_id", "text"), id, "doc_id", "text", ix, pr)
    run(b1, 0L); run(b2, 1L)
    val before = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    val ixBefore = LshIndexMaintenance.readIndex(spark, ix)
      .get.count()
    // replay of a COMMITTED batch: gated off by the band _SUCCESS
    run(b2, 1L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    assert(LshIndexMaintenance.readIndex(spark, ix).get.count()
      == ixBefore, "replay duplicated index bands")
    // crash BETWEEN the pair write and the band commit: simulate by
    // deleting batch 1's band dir (pairs left behind), then replay —
    // the batch must re-run and converge to the same state
    val fs = new org.apache.hadoop.fs.Path(ix).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ix/batch=1"), true)
    // while torn, the batch's pairs are INVISIBLE (gated on the band
    // commit) even though the pair parquet sits fully readable
    val torn = LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet
    assert(torn != before && torn.subsetOf(before),
      s"torn batch leaked into pairsSoFar: $torn")
    run(b2, 1L)
    assert(LshIndexMaintenance.pairsSoFar(spark, pr, ix)
      .as[(Long, Long, Long)].collect().toSet == before)
    assert(LshIndexMaintenance.readIndex(spark, ix).get.count()
      == ixBefore)
  }
}
