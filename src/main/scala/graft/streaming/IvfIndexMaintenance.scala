package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental IVF (ANN) index maintenance — the streaming twin of
  * the batch `v4/v13` faces: centroids are trained ONCE on a
  * bootstrap corpus (they are the quantizer, and re-training them
  * would silently re-key every existing posting list), then each
  * embedding micro-batch assigns its NEW vectors to their nearest
  * centroid and appends the (cluster_id, vec_id, embedding) postings
  * to the index. Searches run against everything committed so far
  * with the unchanged batch `IvfIndex.search`.
  *
  * Scale shape: per batch the only work is the batch-sized
  * assignment — a broadcast-centroid argmax, NO shuffle of the index
  * (appends are new files; the index is never rewritten). Exactly
  * the update cost a 100 TB vector store wants: O(new vectors), not
  * O(index).
  *
  * Exactly-once: [[BatchDirs]] layout — a replayed batch skips on
  * the `_SUCCESS` marker or overwrites its own directory with
  * deterministic content (assignment is deterministic: argmax ties
  * break to the lowest cluster_id). The incremental index therefore
  * equals `IvfIndex.build` over the final corpus row-for-row
  * (spec-pinned), and searches against it match the batch index
  * exactly.
  *
  * Centroid drift is the documented operational caveat, as in every
  * production IVF deployment: when the ingest distribution walks
  * away from the bootstrap corpus, recall decays — re-train on a
  * sample and REBUILD (a new index dir), don't mutate in place. */
object IvfIndexMaintenance {

  /** Start maintaining: wire to `.option("checkpointLocation", …)
    * .start()`. `centroids` should be the (small, localized) frame
    * `IvfIndex.buildCentroids` returns. `compactEvery` ≤ 0 disables
    * compaction; with it on, every N committed batches fold into one
    * consolidated dir hash-bucketed by `cluster_id` — the posting-
    * list key — so reads list O(1 + N) dirs regardless of stream age
    * ([[BatchDirs.compact]], same commit-marker replay safety). */
  def maintain(emb: DataFrame, centroids: DataFrame,
    indexDir: String, compactEvery: Int = 0,
    nBuckets: Int = 64): DataStreamWriter[Row] =
    emb.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, centroids, indexDir,
          compactEvery, nBuckets)
    }

  /** One micro-batch: assign, append, compact on cadence. Public for
    * replay specs and synthetic-batch backfills. */
  def processBatch(batch: DataFrame, batchId: Long,
    centroids: DataFrame, indexDir: String,
    compactEvery: Int = 0, nBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val dir = s"$indexDir/batch=$batchId"
    if (!BatchDirs.committed(spark, dir))
      IvfIndex.build(batch.select(col("vec_id"), col("embedding")),
          centroids)
        .write.mode("overwrite").parquet(dir)
    // idempotent on replay, like the append itself
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      BatchDirs.compact(spark, indexDir, batchId, "cluster_id",
        nBuckets)
  }

  /** The postings accumulated so far, search-ready. None before the
    * first commit. */
  def index(spark: SparkSession, indexDir: String): Option[DataFrame] =
    BatchDirs.readCommitted(spark, indexDir)
      .map(_.select("cluster_id", "vec_id", "embedding"))

  /** Search the incremental index — the batch `IvfIndex.search`,
    * unchanged, over the committed postings. */
  def search(spark: SparkSession, indexDir: String,
    centroids: DataFrame, probes: DataFrame,
    nProbe: Int, topK: Int): DataFrame =
    IvfIndex.search(
      index(spark, indexDir).getOrElse(
        throw new IllegalStateException(
          s"no committed index batches under $indexDir")),
      centroids, probes, nProbe, topK)
}
