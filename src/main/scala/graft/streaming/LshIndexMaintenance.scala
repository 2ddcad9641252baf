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
  * stats), so the index is SCANNED map-side, never shuffled.
  *
  * Compaction (`compactEvery`): a directory per micro-batch is an
  * O(batches) listing per read and an unbounded small-files pile —
  * every `compactEvery` committed batches, [[BatchDirs.compactTiered]]
  * folds the index tail (bucketed by `k1`, the band-bucket join key)
  * and the pairs tail (bucketed by `doc_a`) into L0 runs, with major
  * merges on the byte-ratio/run-count triggers and the same
  * commit-marker replay safety (tiering rationale and bounds:
  * [[BatchDirs]] class doc). Listing bound per read: O(1 compact +
  * ≤ maxL0Runs L0 runs + one cadence of batch dirs + one call of
  * grace debris); never O(stream age). The bucketed layout also lets
  * face 2 PRUNE every folded tier to the k1 hash buckets the batch
  * actually probes ([[BatchDirs.bucketOf]] on both sides — a
  * micro-batch touches at most its own band count of buckets, so at
  * production index sizes the scan reads a fraction of the folded
  * table, plus the whole — cadence-bounded — recent tail). Index
  * compaction runs BEFORE pairs compaction, so the pairs coverage
  * never exceeds the band coverage and [[pairsSoFar]]'s gate stays
  * uniform. `tiered = false` selects the single-tier fold
  * ([[BatchDirs.compact]]) — the flat-layout baseline the ladder
  * probe compares against; `majorRatio`/`mergeFactor` pass through
  * to [[BatchDirs.compactTiered]] (major-merge byte trigger, L0
  * cascade factor — the write-amplification/read-depth trade the
  * StreamLadder measures per setting). */
object LshIndexMaintenance {

  /** Start maintaining: wire to `.option("checkpointLocation", …)
    * .start()`. Restarts resume from the checkpoint and the batch-id
    * keyed layout absorbs replays (see class doc). `compactEvery`
    * ≤ 0 disables compaction (the spec-friendly default); production
    * streams want it at, say, 32. */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
    indexDir: String, pairsDir: String, compactEvery: Int = 0,
    nBuckets: Int = 64, tiered: Boolean = true,
    majorRatio: Double = 0.1, mergeFactor: Double = 2.0)
    : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir,
          pairsDir, compactEvery, nBuckets, tiered, majorRatio,
          mergeFactor)
    }

  /** One micro-batch: emit pairs, append bands, compact on cadence.
    * Public — the spec drives it directly for the replay cases, and
    * a backfill job can call it with synthetic batch ids. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
    textCol: String, indexDir: String, pairsDir: String,
    compactEvery: Int = 0, nBuckets: Int = 64,
    tiered: Boolean = true, majorRatio: Double = 0.1,
    mergeFactor: Double = 2.0): Unit = {
    val spark = batch.sparkSession
    val bandDir = s"$indexDir/batch=$batchId"
    val pairDir = s"$pairsDir/batch=$batchId"
    if (!BatchDirs.committed(spark, bandDir)) { // else: finished batch
      val bands = MinHashLsh.bands(
        MinHashLsh.signatures(
          batch.select(col(idCol), col(textCol)), idCol, textCol), idCol)
        .select(col(idCol).as("doc_id"), col("band"), col("k1"),
          col("k2"))
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
        // the index never shuffles (class doc); when the index holds
        // folded tiers, prune their scan to the k1 buckets this batch
        // probes (bounded driver collect: ≤ nBuckets values); earlier
        // doc first only when ids order that way — canonical
        // (least, greatest). The read is PINNED to the generation the
        // buckets were derived from (readCommittedAt): with in-band
        // cadence folds this is a no-op (processBatch serializes
        // them), but it makes an out-of-band [[compactNow]] landing
        // mid-batch safe — a re-resolved layout with a different
        // modulus under buckets computed for the old one would
        // silently drop matches
        val gen = BatchDirs.generation(spark, indexDir)
        val probeBuckets = gen.modulus
          .map { n =>
            bands.select(BatchDirs.bucketOf(col("k1"), n).as("b"))
              .distinct().collect().map(_.getLong(0)).toSeq
          }
        val cross = BatchDirs.readCommittedAt(spark, indexDir, gen,
          excludeBatch = batchId, pbuckets = probeBuckets)
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
    // cadence-gated compaction AFTER the band commit; a replayed
    // committed batch re-runs it, which is an idempotent sweep.
    // upTo = batchId - 1, NEVER the current batch: folding (and
    // eventually sweeping) batch=<batchId> would destroy the very
    // _SUCCESS marker that makes a post-crash replay of THIS batch a
    // no-op — the replay would reprocess and join its own bands back
    // against the folded index, triple-counting its pairs. Batches
    // ≤ batchId−1 are in the engine's commit log by the time this
    // batch runs, so they can never replay.
    // The pairs fold is capped at the BAND coverage actually reached
    // (majors defer independently under the ratio governor), keeping
    // the documented invariant pairsCoverage ≤ bandCoverage
    // structural. The in-band cadence path skips the out-of-band
    // guard: upTo = batchId − 1 < batchId (committed two lines above)
    // holds by construction, and the guard's extra listing has no
    // business inside the latency-sensitive foreachBatch body. On
    // compactor-lease contention (an out-of-band fold in flight) the
    // fold defers silently — the next cadence retries.
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      foldBoth(spark, indexDir, pairsDir, batchId - 1, nBuckets,
        tiered, majorRatio, mergeFactor, failIfBusy = false)
  }

  /** Fold committed batches ≤ `upTo` now — the OUT-OF-BAND face of
    * the cadence compaction: an in-band fold is a potentially
    * O(index) job running inside a micro-batch (the StreamLadder rung
    * shows a major merge spiking the triggering batch's latency),
    * which at production index sizes can blow the trigger interval.
    * Running this from a separate maintenance job between
    * micro-batches keeps per-batch cost flat; it is safe against
    * concurrent `processBatch` calls because (a) `upTo` must stay
    * STRICTLY below the newest dir-committed batch (enforced here —
    * same rule as the cadence path: folding the batch the engine may
    * still replay destroys the replay marker, and the replayed batch
    * would re-join its own folded bands, permanently double-counting
    * its pairs), (b) face 2's pruned read is pinned to the generation
    * its probe buckets came from, (c) the two-phase sweep keeps any
    * generation a concurrent reader resolved alive for ONE more
    * compactor call — so space invocations at least one micro-batch
    * (and one external-reader) duration apart: two calls landing
    * inside a single in-flight read exhaust its grace window and the
    * read FAILS LOUDLY, never returns a short answer — a frame built
    * before the folds hits swept files at execution
    * (FileNotFoundException), and a read BUILT against an
    * already-outdated pin is rejected up front by
    * [[BatchDirs.readCommittedAt]]'s exactness guard
    * (IllegalStateException) — crash/retry either way, not
    * corruption; see [[BatchDirs.materialized]] /
    * [[BatchDirs.materializedTo]] for long-lived
    * handles), and (d) the single-compactor LEASE
    * ([[BatchDirs]] class doc) serializes all folds: the in-band
    * cadence defers to a running out-of-band fold, while THIS face
    * FAILS LOUDLY (`IllegalStateException`) against ANY concurrent
    * lease holder — a cadence fold that happens to be mid-flight
    * (transient: catch and retry after a batch) as well as a
    * misconfigured second cron (persistent: surfaces on its first
    * collision). Corruption is off the table either way; callers
    * that co-run the cadence should treat the exception as a retry
    * signal, not a failure. A dir with nothing (left) to fold is a
    * no-op returning −1 (a maintenance job racing stream startup, or
    * re-running after a fully-folded quiet period, must not crash).
    * Band fold first, then pairs capped at the band coverage reached,
    * keeping pairsCoverage ≤ bandCoverage structural. When the INDEX
    * side has nothing left to fold, the pairs side may still carry a
    * tail — a single-tier pairs major the byte-ratio governor
    * deferred on an earlier call, or a crash between the two folds —
    * so the pairs fold still runs, capped at the band coverage
    * already reached (the invariant is unchanged); the call then
    * returns −1 to report the index no-op. */
  def compactNow(spark: SparkSession, indexDir: String,
    pairsDir: String, upTo: Long, nBuckets: Int = 64,
    tiered: Boolean = true, majorRatio: Double = 0.1,
    mergeFactor: Double = 2.0): Long =
    if (BatchDirs.foldableUpTo(spark, indexDir, upTo))
      foldBoth(spark, indexDir, pairsDir, upTo, nBuckets, tiered,
        majorRatio, mergeFactor, failIfBusy = true)
    else {
      val bandCoverage = BatchDirs.compactedThrough(spark, indexDir)
      // the pairs cap honors ALL THREE bounds: the caller's upTo, the
      // band coverage (pairsCoverage ≤ bandCoverage), and the pairs
      // side's own never-fold-the-newest rule — after a backfill that
      // folded the index through its newest batch, bandCoverage can
      // EQUAL the newest pairs id, and handing that straight to
      // foldableUpTo would throw where this face promises a no-crash
      // no-op (the newest pairs batch may still replay; its marker
      // stays)
      val (prCovered, prIds) = BatchDirs.committedState(spark, pairsDir)
      prIds.maxOption.foreach { newestPair =>
        val cap = Seq(upTo, bandCoverage, newestPair - 1).min
        if (cap > prCovered && prIds.exists(_ <= cap))
          foldOne(spark, pairsDir, "doc_a", cap, nBuckets, tiered,
            majorRatio, mergeFactor, failIfBusy = true)
      }
      -1L
    }

  /** Band fold then pairs fold capped at the band coverage reached —
    * the shared body of the cadence path and [[compactNow]]. */
  private def foldOne(spark: SparkSession, dir: String, key: String,
    limit: Long, nBuckets: Int, tiered: Boolean, majorRatio: Double,
    mergeFactor: Double, failIfBusy: Boolean): Long =
    if (tiered)
      BatchDirs.compactTiered(spark, dir, limit, key, nBuckets,
        majorRatio = majorRatio, mergeFactor = mergeFactor,
        failIfBusy = failIfBusy)
    else
      BatchDirs.compact(spark, dir, limit, key, nBuckets,
        minFoldRatio = 0.1, failIfBusy = failIfBusy)

  private def foldBoth(spark: SparkSession, indexDir: String,
    pairsDir: String, upTo: Long, nBuckets: Int, tiered: Boolean,
    majorRatio: Double, mergeFactor: Double,
    failIfBusy: Boolean): Long = {
    val bandCoverage = foldOne(spark, indexDir, "k1", upTo, nBuckets,
      tiered, majorRatio, mergeFactor, failIfBusy)
    foldOne(spark, pairsDir, "doc_a", bandCoverage, nBuckets, tiered,
      majorRatio, mergeFactor, failIfBusy)
    bandCoverage
  }

  /** Every candidate pair emitted by COMMITTED batches — union of
    * the per-batch outputs (disjoint by the completeness contract),
    * gated on the BAND commit: pairs write before bands, so a crash
    * between the two leaves a readable pair dir for a batch that
    * will re-run — exposing it would show candidates whose bands are
    * absent from [[readIndex]] (a torn view). The sibling index dir
    * is the gate: a pairs batch is visible iff its id is at or below
    * the index's fold coverage (folded bands — committed by the
    * coverage rule) or among the index's committed batch dirs. */
  def pairsSoFar(spark: SparkSession, pairsDir: String,
    indexDir: String): DataFrame =
    gatedPairs(spark, indexDir,
      BatchDirs.readCommitted(spark, pairsDir))

  /** The band-commit visibility gate shared by [[pairsSoFar]] and
    * [[pairsFor]] — ONE definition so the two read faces can never
    * disagree on which pairs are visible. The index dir's (coverage,
    * committed ids) come from a single listing
    * ([[BatchDirs.committedState]]): resolving them separately races
    * a concurrent index compaction — a new coverage paired with the
    * pre-fold id list makes just-folded batches vanish from the
    * disjunction for one read. */
  private def gatedPairs(spark: SparkSession, indexDir: String,
    read: Option[DataFrame]): DataFrame = {
    val (coveredThrough, ok) = BatchDirs.committedState(spark, indexDir)
    read match {
      case None =>
        // schema-stable empty frame: the id columns inherit the
        // caller's idCol type once real pairs exist, so the empty
        // face derives that type from the committed INDEX's doc_id
        // when it can (reachable: a batch can commit bands while
        // producing zero pairs — marker-only pairs dirs read as
        // None). Before ANY commit nothing stores the type and the
        // ids default to bigint (the common case; string-id streams
        // should gate unions on nonEmpty until first commit).
        import spark.implicits._
        val idType = BatchDirs.readCommitted(spark, indexDir)
          .map(_.schema("doc_id").dataType)
          .getOrElse(org.apache.spark.sql.types.LongType)
        Seq.empty[(Long, Long, Long)]
          .toDF("doc_a", "doc_b", "n_shared_bands")
          .select(col("doc_a").cast(idType),
            col("doc_b").cast(idType), col("n_shared_bands"))
      case Some(df) =>
        val inDirs =
          if (ok.isEmpty) lit(false) else col("batch").isin(ok: _*)
        df.filter(col("batch") <= coveredThrough || inDirs)
          .select("doc_a", "doc_b", "n_shared_bands")
    }
  }

  /** The candidate pairs whose CANONICAL (lesser) member is in
    * `docIds` — the dedup-cluster point-lookup face ("what does
    * canonical doc X subsume"), and the payoff of the pairs fold
    * layout's `doc_a` bucketing: the folded-tier scan PRUNES to the
    * buckets the requested ids hash into, so a lookup touches
    * O(|docIds| buckets + cadence-bounded recent tail) of the pairs
    * table, not O(pairs). Same band-commit gate as [[pairsSoFar]];
    * the read is pinned to the generation the buckets were computed
    * for ([[BatchDirs.readCommittedAt]]). `docIds` is a bounded
    * lookup set (it becomes an `isin` filter and a driver-side bucket
    * derivation) — for a frame-scale probe, join against
    * [[pairsSoFar]] instead. Pairs are stored once, keyed by least
    * id: a by-EITHER-member lookup is a different, unbucketed access
    * path — filter [[pairsSoFar]].
    *
    * `materialize = true` detaches the result from the pinned files
    * ([[BatchDirs.materialized]]) for consumers holding it across
    * more than one compactor call. */
  def pairsFor(spark: SparkSession, pairsDir: String,
    indexDir: String, docIds: Seq[Long],
    materialize: Boolean = false): DataFrame = {
    import spark.implicits._
    val gen = BatchDirs.generation(spark, pairsDir)
    // the bucket set must be derived with the IDENTICAL hash
    // compact() wrote — xxhash64 is type-width-sensitive, so the
    // lookup ids are first try_cast to the STORED doc_a type (one
    // footer read from a tier dir that actually HOLDS data — an
    // all-empty-batches fold commits marker-only dirs with no schema
    // to infer, in which case the read falls back to unpruned; an id
    // outside the stored domain try_casts to NULL, whose junk bucket
    // is harmless — the final typed isin filter excludes it). A
    // local ≤|docIds|-row job.
    val buckets = for {
      n <- gen.modulus
      (dataDir, _) <- BatchDirs.genDataDirs(spark, pairsDir, gen)
        .headOption
    } yield {
      val stored =
        spark.read.parquet(dataDir).schema("doc_a").dataType
      docIds.toDF("raw")
        .select(BatchDirs.bucketOf(
          expr(s"try_cast(raw as ${stored.sql})"), n).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
    }
    val out = gatedPairs(spark, indexDir,
      BatchDirs.readCommittedAt(spark, pairsDir, gen,
        pbuckets = buckets))
      .filter(col("doc_a").isin(docIds: _*))
    if (materialize) BatchDirs.materialized(out) else out
  }

  /** The band index accumulated so far, `batch` column included.
    * None before the first commit ([[BatchDirs]]). `pbuckets` prunes
    * the folded tiers of the scan to the given
    * [[BatchDirs.bucketOf]] k1 buckets. */
  def readIndex(spark: SparkSession, indexDir: String,
    excludeBatch: Long = -1L, pbuckets: Option[Seq[Long]] = None)
    : Option[DataFrame] =
    BatchDirs.readCommitted(spark, indexDir, excludeBatch, pbuckets)
}
