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
  * sample and REBUILD (a new index dir), don't mutate in place. The
  * caveat has an OBSERVABLE trigger: pass a [[ProgressMetrics]] and
  * every batch emits `ivf.mean_dist` (mean cosine distance of the
  * batch's vectors to their assigned centroid) and `ivf.entropy`
  * (assignment entropy in nats) — a sustained mean_dist climb or an
  * entropy collapse (everything landing in one catch-all cluster) is
  * the rebuild signal, spec-pinned against a mid-stream distribution
  * shift in IvfIndexMaintenanceSpec. */
object IvfIndexMaintenance {

  /** Start maintaining: wire to `.option("checkpointLocation", …)
    * .start()`. `centroids` should be the (small, localized) frame
    * `IvfIndex.buildCentroids` returns. `compactEvery` ≤ 0 disables
    * compaction; with it on, every N committed batches the tail
    * folds into an L0 run hash-bucketed by `cluster_id` — the
    * posting-list key — with major merges on the byte-ratio/run-count
    * triggers ([[BatchDirs.compactTiered]]; `tiered = false` selects
    * the single-tier baseline, same commit-marker replay safety
    * either way). Listing bound per read: O(1 compact + ≤ maxL0Runs
    * L0 runs + one cadence of batch dirs + one call of grace debris);
    * never O(stream age).
    *
    * `idOffset` shifts the engine's batch ids before they key the
    * layout: a stream resumed over a [[rebuild]]-bootstrapped dir
    * (bootstrap occupies `batch=0`) passes 1, so a FRESH checkpoint's
    * batch 0 never collides with the bootstrap's commit marker (a
    * collision would silently skip the stream's first batch). */
  def maintain(emb: DataFrame, centroids: DataFrame,
    indexDir: String, compactEvery: Int = 0, nBuckets: Int = 64,
    metrics: Option[ProgressMetrics] = None,
    idOffset: Long = 0L, tiered: Boolean = true,
    majorRatio: Double = 0.1, mergeFactor: Double = 2.0)
    : DataStreamWriter[Row] =
    emb.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId + idOffset, centroids, indexDir,
          compactEvery, nBuckets, metrics, tiered, majorRatio,
          mergeFactor)
    }

  /** The drift caveat's operational answer, as an operator: re-key
    * EVERY committed posting to `newCentroids` into a fresh
    * `newDir` — triggered when the [[ProgressMetrics]] gauges
    * (`ivf.mean_dist` climb, `ivf.entropy` collapse) say the
    * bootstrap quantizer no longer fits the ingest distribution.
    * One batch job: a broadcast-centroid argmax over the postings
    * scan. Unlike the per-batch append (batch-sized), here the batch
    * IS the index — the argmax's groupBy(vec_id) exchange carries one
    * row per posting (embedding riding in the max-struct), so budget
    * a full O(index) shuffle for a production rebuild. The result
    * lands as `batch=0` with the usual commit marker, so every
    * reader face works unchanged; `oldDir` is untouched — in-flight
    * readers drain against it, then it retires. `newDir` must hold
    * no committed index state (fail-fast — leftover batch or folded
    * dirs from an earlier aborted rebuild into the same path would
    * silently merge into the rebuilt view, since every reader unions
    * committed dirs); pick a fresh path per rebuild. Resume the
    * stream over `newDir` with a fresh checkpoint and
    * `maintain(idOffset = 1)` (class doc on the collision). Returns
    * the posting count (sanity: equals the old index's row count),
    * counted from the persisted assignment the write itself
    * materialized — NOT a second O(index) scan of the fresh dir. */
  def rebuild(spark: SparkSession, oldDir: String,
    newCentroids: DataFrame, newDir: String): Long = {
    val (covered, ids) = BatchDirs.committedState(spark, newDir)
    require(covered < 0 && ids.isEmpty,
      s"rebuild target $newDir already holds committed index state " +
        s"(coverage $covered, batch dirs ${ids.sorted.mkString(",")})" +
        " — readers union every committed dir, so an aborted earlier " +
        "rebuild's leftovers would silently merge into the rebuilt " +
        "view; rebuild into a fresh directory")
    val postings = index(spark, oldDir).getOrElse(
      throw new IllegalStateException(
        s"no committed index batches under $oldDir"))
    val assigned = IvfIndex.build(
      postings.select(col("vec_id"), col("embedding")), newCentroids)
      .persist()
    try {
      assigned.write.mode("overwrite").parquet(s"$newDir/batch=0")
      assigned.count() // served from the cache the write populated
    } finally { assigned.unpersist(); () }
  }

  /** One micro-batch: assign, append, compact on cadence. Public for
    * replay specs and synthetic-batch backfills. With `metrics`, the
    * drift gauges emit for every FRESH batch (a replayed committed
    * batch re-emits nothing — its numbers already fired). */
  def processBatch(batch: DataFrame, batchId: Long,
    centroids: DataFrame, indexDir: String,
    compactEvery: Int = 0, nBuckets: Int = 64,
    metrics: Option[ProgressMetrics] = None,
    tiered: Boolean = true, majorRatio: Double = 0.1,
    mergeFactor: Double = 2.0): Unit = {
    val spark = batch.sparkSession
    val dir = s"$indexDir/batch=$batchId"
    if (!BatchDirs.committed(spark, dir)) {
      val postings = IvfIndex.build(
        batch.select(col("vec_id"), col("embedding")), centroids)
      val kept = if (metrics.isDefined) postings.persist() else postings
      // unpersist in a finally (like the LSH twin's bands): a metrics
      // failure after the parquet commit must not leak the cached
      // postings — the batch is committed, so a replay skips the
      // whole block and would never release them
      try {
        kept.write.mode("overwrite").parquet(dir)
        metrics.foreach { m =>
          // one aggregation pass over the (persisted) batch postings;
          // the collect is ≤ k rows — bounded by design, same budget
          // as the centroid localization in IvfIndex
          graft.expressions.GraftFunctions.register(spark)
          // nd/d count and sum only DEFINED distances: a zero-norm
          // embedding (real ingest-defect mode) has no cosine — its
          // NULL must neither NPE the stream nor silently deflate the
          // mean. It still counts in n, so entropy sees the assignment.
          val dist = expr(
            """1.0 - graft_dot(embedding, centroid)
              | / (sqrt(graft_dot(embedding, embedding))
              |    * sqrt(graft_dot(centroid, centroid)))""".stripMargin)
          val per = kept.join(broadcast(centroids), Seq("cluster_id"))
            .groupBy(col("cluster_id"))
            .agg(count(lit(1)).as("n"), count(dist).as("nd"),
              sum(dist).as("d"))
            .select(col("n"), col("nd"), col("d")).collect()
          val n = per.map(_.getLong(0)).sum
          val nd = per.map(_.getLong(1)).sum
          if (nd > 0)
            m.recordGauge("ivf.mean_dist", batchId,
              per.filterNot(_.isNullAt(2)).map(_.getDouble(2)).sum / nd)
          if (n > 0)
            m.recordGauge("ivf.entropy", batchId,
              -per.map { r =>
                val p = r.getLong(0).toDouble / n
                p * math.log(p)
              }.sum)
        }
      } finally if (metrics.isDefined) { kept.unpersist(); () }
    }
    // idempotent on replay, like the append itself. upTo =
    // batchId − 1: the current batch's dir carries the _SUCCESS
    // marker a post-crash replay checks — folding it would turn the
    // replay into a full (wasted) rebuild; earlier batches are in
    // the engine's commit log and can never replay.
    // The in-band cadence path skips the out-of-band guard: upTo =
    // batchId − 1 < batchId (committed above) holds by construction,
    // and the guard's extra listing has no business inside the
    // foreachBatch body. On compactor-lease contention (an
    // out-of-band fold in flight) the fold defers silently — the
    // next cadence retries.
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      if (tiered)
        BatchDirs.compactTiered(spark, indexDir, batchId - 1,
          "cluster_id", nBuckets, majorRatio = majorRatio,
          mergeFactor = mergeFactor)
      else
        BatchDirs.compact(spark, indexDir, batchId - 1, "cluster_id",
          nBuckets, minFoldRatio = 0.1)
      ()
    }
  }

  /** Out-of-band fold of committed batches ≤ `upTo` — same contract
    * as [[LshIndexMaintenance.compactNow]]: run it from a separate
    * maintenance job to keep a major merge out of the micro-batch
    * path. `upTo` STRICTLY below the newest committed batch
    * (enforced — folding the possibly-replaying newest batch destroys
    * its replay marker and the replay double-appends its postings);
    * the single-compactor lease serializes all folds — the in-band
    * cadence defers to this face, while this face fails loudly
    * (`IllegalStateException`) against ANY concurrent holder,
    * including a mid-flight cadence fold: catch and retry later, the
    * collision is transient and never corrupts. Space invocations at
    * least one micro-batch /
    * external-reader duration apart: the grace window covers ONE
    * compactor call per in-flight pinned read
    * ([[BatchDirs.materialized]] for longer-lived handles). */
  def compactNow(spark: SparkSession, indexDir: String,
    upTo: Long, nBuckets: Int = 64, tiered: Boolean = true,
    majorRatio: Double = 0.1, mergeFactor: Double = 2.0): Long =
    if (!BatchDirs.foldableUpTo(spark, indexDir, upTo)) -1L
    else if (tiered)
      BatchDirs.compactTiered(spark, indexDir, upTo, "cluster_id",
        nBuckets, majorRatio = majorRatio, mergeFactor = mergeFactor,
        failIfBusy = true)
    else
      BatchDirs.compact(spark, indexDir, upTo, "cluster_id",
        nBuckets, minFoldRatio = 0.1, failIfBusy = true)

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

  /** [[search]] with the folded tiers of the scan PRUNED to the
    * hash buckets the probed clusters land in — the payoff of the
    * cluster_id-bucketed fold layout: a search touches
    * O(probed buckets + recent tail) of the index, not O(index).
    * Identical results to [[search]] by construction (a candidate
    * must share its probe's cluster_id, hence its bucket;
    * spec-pinned). Falls back to the full scan before the first
    * fold. The probed-cluster collect is ≤ k rows — the same
    * bounded-by-design budget as IvfIndex's centroid localization.
    *
    * Consumption deadline: the returned frame's folded-tier file
    * listing is pinned to the generation resolved HERE, which the
    * two-phase sweep guarantees for ONE subsequent compactor call — a
    * caller holding the frame lazy across two or more maintainer
    * compaction calls can hit swept files; consume within a cadence,
    * or pass `materialize = true` to detach the result from the
    * pinned files ([[BatchDirs.materialized]] — an eager local
    * checkpoint, paid once) when it must live longer. */
  def searchPruned(spark: SparkSession, indexDir: String,
    centroids: DataFrame, probes: DataFrame,
    nProbe: Int, topK: Int, materialize: Boolean = false)
    : DataFrame = {
    val gen = BatchDirs.generation(spark, indexDir)
    val out = gen.modulus match {
      case None => search(spark, indexDir, centroids, probes,
        nProbe, topK)
      case Some(n) =>
        // ONE probes×centroids scoring pass: the same frame derives
        // the bucket filter and feeds the candidate join
        // (searchFrom). Persisted — the bucket collect materializes
        // it, the candidate join re-reads it from cache; released by
        // the caller's Broadcasting.releaseAll(), the operator-wide
        // cache discipline (unpersisting here would drop the cache
        // before the returned lazy frame is ever consumed).
        val pc = graft.operators.Broadcasting.track(
          IvfIndex.probeClusters(centroids, probes, nProbe).persist())
        // bucketOf over the ORIGINAL cluster_id column type —
        // xxhash64 is type-width-sensitive, so the bucket must be
        // computed on the same type compact() hashed. One collect
        // yields both the bucket set (partition pruning of the
        // folded tiers) and the probed cluster ids themselves
        val probed = pc
          .select(col("cluster_id"),
            BatchDirs.bucketOf(col("cluster_id"), n).as("b"))
          .distinct().collect()
        val buckets = probed.map(_.getLong(1)).distinct.toSeq
        val cids = probed.map(_.get(0)).distinct.toSeq
        // readCommittedAt pins the read to the generation the
        // buckets were computed for: a concurrent re-bucketing
        // fold must not swap the modulus under the filter
        // (the two-phase sweep keeps the pinned dirs alive)
        val ix = BatchDirs
          .readCommittedAt(spark, indexDir, gen,
            pbuckets = Some(buckets))
          .getOrElse(throw new IllegalStateException(
            s"no committed index batches under $indexDir"))
          .select("cluster_id", "vec_id", "embedding")
          // probed-cluster DATA predicate (≤ k values): parquet
          // row-group skipping inside the probed buckets and —
          // crucially — on the recent TAIL, which is not bucketed
          // and is otherwise scanned whole. No result change: the
          // candidate join restricts on cluster_id anyway
          .filter(col("cluster_id").isin(cids: _*))
        IvfIndex.searchFrom(pc, ix, topK)
    }
    if (materialize) BatchDirs.materialized(out) else out
  }
}
