package graft

import graft.streaming.BatchDirs
import org.apache.spark.sql.functions._

/** Unit behavior of the batch-dir compaction layer, independent of
  * any maintainer: the size-tiered fold governor (write-amplification
  * bound), cutoff/coverage bookkeeping, and the reader's view across
  * deferred and executed folds. */
class BatchDirsSpec extends SparkTestBase {

  private def writeBatch(dir: String, id: Long, rows: Long,
    offset: Long = 0L): Unit =
    spark.range(rows).select((col("id") + offset).as("k"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/batch=$id")

  private def names(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  test("minFoldRatio defers a rewrite for a tiny tail, folds once " +
    "the tail pays for it; readers see one view throughout") {
    val dir = java.nio.file.Files
      .createTempDirectory("bd_tier").toString + "/ix"
    def total: Long =
      BatchDirs.readCommitted(spark, dir).map(_.count()).getOrElse(0L)
    // first fold always proceeds (nothing to rewrite yet)
    writeBatch(dir, 0L, rows = 500)
    assert(BatchDirs.compact(spark, dir, 0L, "k", nBuckets = 4,
      minFoldRatio = 0.1) == 0L)
    assert(names(dir) == Seq("compact=0.n4") && total == 500)
    // a 1-row tail is far under 10% of 500 — the fold must DEFER:
    // cutoff stays 0, the batch dir stays, the reader still sees all
    writeBatch(dir, 1L, rows = 1, offset = 500)
    assert(BatchDirs.compact(spark, dir, 1L, "k", nBuckets = 4,
      minFoldRatio = 0.1) == 0L,
      "tiny tail must not trigger an O(index) rewrite")
    assert(names(dir) == Seq("batch=1", "compact=0.n4"))
    assert(total == 501 && BatchDirs.compactedThrough(spark, dir) == 0L)
    // grow the tail past the ratio: now the fold proceeds and sweeps
    writeBatch(dir, 2L, rows = 500, offset = 501)
    assert(BatchDirs.compact(spark, dir, 2L, "k", nBuckets = 4,
      minFoldRatio = 0.1) == 2L)
    assert(names(dir) == Seq("compact=2.n4") && total == 1001)
    // ratio 0 (the default) always folds — the spec-friendly mode
    writeBatch(dir, 3L, rows = 1, offset = 1001)
    assert(BatchDirs.compact(spark, dir, 3L, "k", nBuckets = 4) == 3L)
    assert(names(dir) == Seq("compact=3.n4") && total == 1002)
  }

  test("a deferred fold keeps coverage semantics exact: ids above " +
    "the cutoff stay visible as batch dirs, below stay covered") {
    val dir = java.nio.file.Files
      .createTempDirectory("bd_cov").toString + "/ix"
    writeBatch(dir, 0L, rows = 400)
    writeBatch(dir, 1L, rows = 400, offset = 400)
    BatchDirs.compact(spark, dir, 1L, "k", nBuckets = 4,
      minFoldRatio = 0.1)
    writeBatch(dir, 2L, rows = 1, offset = 800)
    BatchDirs.compact(spark, dir, 2L, "k", nBuckets = 4,
      minFoldRatio = 0.1) // defers
    assert(BatchDirs.compactedThrough(spark, dir) == 1L)
    assert(BatchDirs.committedIds(spark, dir) == Seq(2L))
    val df = BatchDirs.readCommitted(spark, dir).get
    assert(df.count() == 801)
    // the batch column survives both layouts as a LONG data column
    assert(df.schema("batch").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.groupBy("batch").count().count() == 3)
  }
}
