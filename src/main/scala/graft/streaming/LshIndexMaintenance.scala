package graft.streaming

import graft.operators.MinHashLsh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Incremental MinHash-LSH index maintenance — the streaming twin of
  * the batch `d4_lsh_pairs` face: documents arrive on an unbounded
  * stream, each micro-batch (1) flags near-dup candidate pairs
  * against everything indexed SO FAR, (2) flags pairs WITHIN the
  * batch, and (3) appends its own band buckets to the index — so the
  * corpus-wide candidate set is maintained without ever re-banding
  * the corpus.
  *
  * Exactly-once contract (spec'd in LshIndexMaintenanceSpec): all
  * output is keyed by `batchId` — pairs land in
  * `<pairsDir>/batch=<id>/`, bands in `<indexDir>/batch=<id>/`, and
  * the band write commits LAST. A post-crash replay of a committed
  * batch is a no-op (the band `_SUCCESS` marker gates it); a replay
  * of a half-written batch overwrites both dirs with byte-identical
  * content (the pipeline is deterministic), so the index never holds
  * duplicate bands and no pair is emitted twice.
  *
  * Completeness: a pair {a, b} (a ingested no later than b) is
  * emitted exactly once — in b's batch — with the SAME
  * `n_shared_bands` the batch operator computes, because a's four
  * band rows are all indexed by the time b arrives. Union over batch
  * outputs therefore equals `MinHashLsh.candidatePairs` over the
  * final corpus (spec-pinned). Re-ingesting an id is out of
  * contract, as in every append-only index.
  *
  * Scale shape: per batch, only the NEW documents' bands shuffle.
  * The index side joins under an explicit `broadcast` of the batch
  * bands (a micro-batch is trigger-bounded and tiny next to the
  * index; stats-gating can't see that, streaming frames carry no
  * stats), so the index is SCANNED map-side, never shuffled. At a
  * scale where even the scan hurts, the production layout buckets
  * the index table by (k1) so the scan prunes — the directory
  * layout here keeps the spec self-contained.
  */
object LshIndexMaintenance {

  /** Start maintaining: wire to `.option("checkpointLocation", …)
    * .start()`. Restarts resume from the checkpoint and the batch-id
    * keyed layout absorbs replays (see class doc). */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
    indexDir: String, pairsDir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, pairsDir)
    }

  /** One micro-batch: emit pairs, append bands. Public — the spec
    * drives it directly for the replay cases, and a backfill job can
    * call it with synthetic batch ids. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
    textCol: String, indexDir: String, pairsDir: String): Unit = {
    val spark = batch.sparkSession
    val bandDir = s"$indexDir/batch=$batchId"
    val pairDir = s"$pairsDir/batch=$batchId"
    if (BatchDirs.committed(spark, bandDir)) return // finished batch
    val bands = MinHashLsh.bands(
      MinHashLsh.signatures(
        batch.select(col(idCol), col(textCol)), idCol, textCol), idCol)
      .select(col(idCol).as("doc_id"), col("band"), col("k1"), col("k2"))
      .persist()
    try {
      // face 1 — new ⋈ new: the batch operator's bucket-group pair
      // generation, restricted to this batch's bands
      val self = bands.groupBy(col("band"), col("k1"), col("k2"))
        .agg(sort_array(collect_list(col("doc_id"))).as("xs"))
        .filter(size(col("xs")) >= 2)
        .select(explode(expr(MinHashLsh.bucketPairs("xs"))).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      // face 2 — new ⋈ indexed-so-far: broadcast the batch bands so
      // the index never shuffles (class doc); earlier doc first only
      // when ids order that way — canonical (least, greatest)
      val cross = readIndex(spark, indexDir, excludeBatch = batchId)
        .map { ix =>
          ix.join(broadcast(bands.withColumnRenamed("doc_id", "new_id")),
              Seq("band", "k1", "k2"))
            .filter(col("doc_id") =!= col("new_id"))
            .select(least(col("doc_id"), col("new_id")).as("doc_a"),
              greatest(col("doc_id"), col("new_id")).as("doc_b"))
        }
      val pairs = cross.fold(self)(self.unionAll)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared_bands"))
      // pairs first, bands LAST (the commit marker — class doc)
      pairs.write.mode("overwrite").parquet(pairDir)
      bands.write.mode("overwrite").parquet(bandDir)
    } finally bands.unpersist()
  }

  /** Every candidate pair emitted by COMMITTED batches — union of
    * the per-batch outputs (disjoint by the completeness contract),
    * gated on the BAND commit: pairs write before bands, so a crash
    * between the two leaves a readable pair dir for a batch that
    * will re-run — exposing it would show candidates whose bands are
    * absent from [[readIndex]] (a torn view). The sibling index dir
    * is the gate. */
  def pairsSoFar(spark: SparkSession, pairsDir: String,
    indexDir: String): DataFrame = {
    val ok = BatchDirs.committedIds(spark, indexDir)
    BatchDirs.readCommitted(spark, pairsDir) match {
      case None => // schema-stable empty frame
        import spark.implicits._
        Seq.empty[(Long, Long, Long)]
          .toDF("doc_a", "doc_b", "n_shared_bands")
      case Some(df) =>
        val gated =
          if (ok.isEmpty) df.filter(lit(false))
          else df.filter(col("batch").isin(ok: _*))
        gated.select("doc_a", "doc_b", "n_shared_bands")
    }
  }

  /** The band index accumulated so far, `batch` partition column
    * included. None before the first commit ([[BatchDirs]]). */
  def readIndex(spark: SparkSession, indexDir: String,
    excludeBatch: Long = -1L): Option[DataFrame] =
    BatchDirs.readCommitted(spark, indexDir, excludeBatch)
}
