package graft

import graft.incremental.{BatchLedger, Ledger}
import graft.streaming.BatchDirs
import org.apache.spark.sql.functions._

/** The wave-keyed work ledger over the BatchDirs layout: pending
  * narrows to the unrecorded keys, a replayed wave is exactly-once,
  * folds on the cadence keep the listing bounded WITHOUT changing
  * doneKeys, and the status filter matches Ledger's contract. */
class BatchLedgerSpec extends SparkTestBase {
  import spark.implicits._

  private def dir(): String = java.nio.file.Files
    .createTempDirectory("bledger").toString + "/ledger"

  private def keysOf(d: String): Set[String] =
    BatchLedger.doneKeys(spark, d).as[String].collect().toSet

  test("pending anti-joins the recorded waves; a replayed wave id " +
    "overwrites its own directory (no duplicates, no double work)") {
    val d = dir()
    val work = Seq("a", "b", "c", "d").toDF("k")
    assert(BatchLedger.pending(work, d, "k").count() == 4L)
    BatchLedger.record(Seq("a", "b").toDF("k"), d, waveId = 0L)
    assert(BatchLedger.pending(work, d, "k")
      .as[String].collect().toSet == Set("c", "d"))
    // wave replay (post-crash re-run of the same wave id): the
    // directory is overwritten, the view unchanged
    BatchLedger.record(Seq("a", "b").toDF("k"), d, waveId = 0L)
    assert(keysOf(d) == Set("a", "b"))
    BatchLedger.record(Seq("c").toDF("k"), d, waveId = 1L)
    assert(BatchLedger.pending(work, d, "k")
      .as[String].collect().toSet == Set("d"))
  }

  test("folding on the cadence keeps doneKeys and pending identical " +
    "and the listing bounded; failed keys block reprocessing like " +
    "Ledger's should_process") {
    val d = dir()
    val work = (0 until 40).map(i => s"k$i").toDF("k")
    (0L until 8L).foreach { w =>
      val slice = (0 until 40).filter(_ % 8 == w).map(i => s"k$i")
      BatchLedger.record(slice.toDF("k"), d, w,
        status = if (w == 3L) Ledger.Failed else Ledger.Completed)
      if (w > 0) BatchLedger.fold(spark, d, w - 1, nBuckets = 4)
    }
    // every recorded key — completed or failed — is done (the
    // reference reprocesses neither); the folds changed nothing
    assert(keysOf(d) == (0 until 40).map(i => s"k$i").toSet)
    assert(BatchLedger.pending(work, d, "k").count() == 0L)
    // the completed-only view excludes exactly wave 3's keys
    assert(BatchLedger.doneKeys(spark, d, Seq(Ledger.Completed))
      .count() == 35L)
    // the layout is folded: coverage reached wave 6, so at most the
    // newest wave's dir plus tiers plus one call of grace remain
    assert(BatchDirs.compactedThrough(spark, d) == 6L)
    val fs = new org.apache.hadoop.fs.Path(d).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .map(_.getPath.getName).count(_.startsWith("batch="))
    assert(batchDirs <= 2, s"unfolded tail too deep: $batchDirs dirs")
  }

  test("doneOf point lookup: exact subset over the folded layout, " +
    "pruned to the asked keys' buckets; status filter honored") {
    val d = dir()
    BatchLedger.record(Seq("a", "b").toDF("k"), d, 0L)
    // pre-fold (no generation yet): full-scan fallback, still exact
    assert(BatchLedger.doneOf(spark, d, Seq("a", "x"))
      .as[String].collect().toSet == Set("a"))
    BatchLedger.record(Seq("c").toDF("k"), d, 1L,
      status = Ledger.Failed)
    BatchLedger.record(Seq("e", "f").toDF("k"), d, 2L)
    BatchLedger.fold(spark, d, 1L, nBuckets = 4)
    // post-fold: pruned read over tiers + raw tail, one frame
    assert(BatchLedger.doneOf(spark, d, Seq("a", "c", "e", "nope"))
      .as[String].collect().toSet == Set("a", "c", "e"))
    // completed-only excludes the failed key
    assert(BatchLedger.doneOf(spark, d, Seq("a", "c"),
      Seq(Ledger.Completed)).as[String].collect().toSet == Set("a"))
    // pruning is structural: an asked-key set whose buckets miss a
    // stored key must not surface it (bucket filter + isin agree)
    assert(BatchLedger.doneOf(spark, d, Seq("nope"))
      .as[String].collect().isEmpty)
  }
}
