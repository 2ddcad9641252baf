package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-id-keyed parquet directory layout shared by the streaming
  * index maintainers (`<dir>/batch=<id>/`, `_SUCCESS` as the commit
  * marker). The layout IS the exactly-once mechanism: a replayed
  * micro-batch either skips (marker present) or overwrites its own
  * directory with deterministic content — nothing accumulates. */
object BatchDirs {

  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Ids of the batches whose directory under `baseDir` carries the
    * commit marker (empty batches included — a commit is a commit;
    * only READING their parquet needs the part-file guard below). */
  def committedIds(spark: SparkSession, baseDir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(baseDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
  }

  /** Every COMMITTED batch directory under `baseDir` as one frame
    * (partition column `batch` included); None before the first
    * commit. Half-written directories (no marker) are excluded, so a
    * reader never sees a torn batch — and so are committed-but-EMPTY
    * batches (marker, zero part files: an empty micro-batch, e.g. a
    * watermark-only trigger, can commit without writing any data
    * file, and feeding a file-less directory to the parquet reader
    * throws on schema inference, wedging every subsequent batch). */
  def readCommitted(spark: SparkSession, baseDir: String,
    excludeBatch: Long = -1L): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(baseDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = if (!fs.exists(path)) Nil
      else fs.listStatus(path).toSeq
        .filter { s =>
          s.isDirectory &&
          s.getPath.getName.startsWith("batch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")) &&
          fs.listStatus(s.getPath).exists(f =>
            f.isFile && f.getPath.getName.startsWith("part-"))
        }
        .map(_.getPath.toString)
        .filterNot(_.endsWith(s"batch=$excludeBatch"))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", baseDir).parquet(dirs: _*))
  }
}
