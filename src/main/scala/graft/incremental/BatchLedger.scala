package graft.incremental

import graft.streaming.BatchDirs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The work-ledger contract of [[Ledger]] over the [[BatchDirs]]
  * layout — for LONG-LIVED incremental jobs (a nightly ETL over the
  * reference's ~4M analyses, a resumable backfill) whose ledger
  * accrues appends for months. [[Ledger]]'s append-only directory is
  * the right shape for a handful of runs, but its [[Ledger.compact]]
  * is a single-shot whole-ledger rewrite with a no-concurrent-reader
  * caveat; here each wave's keys land in `<dir>/batch=<waveId>/`
  * (Spark's `_SUCCESS` is the commit marker, so a replayed wave
  * overwrites its own directory — exactly-once per wave id, same
  * discipline as the streaming index maintainers), and
  * [[fold]] = [[BatchDirs.compactTiered]] keyed on `key` keeps the
  * listing bounded at O(compact + log runs + one cadence of waves)
  * with O(tail) minor folds — the ledger inherits the streaming
  * layer's measured LSM write/read bounds, its single-compactor
  * lease, and its two-phase grace-window sweep instead of a bespoke
  * rewrite. Readers and folds interleave safely (the grace window);
  * the key-bucketed layout also means a future point-lookup face
  * ("is THIS analysis done?") can prune to one bucket.
  *
  * Semantics match [[Ledger]]: at-least-once work, a key is done once
  * recorded with a terminal status (completed/failed — the
  * reference's should_process, mongodb_to_rdf.py:149-152), selection
  * is the anti-join. The `batch` wave id is bookkeeping, not
  * ordering: doneKeys unions every committed wave.
  */
object BatchLedger {

  /** Append one wave's keys (FIRST column, cast to string) under
    * `batch=<waveId>`. Distributive — never collects. Re-running a
    * wave id overwrites its own directory (deterministic input ⇒
    * byte-identical, the exactly-once contract above).
    *
    * PRECONDITION the overwrite makes load-bearing: `keys` must be a
    * deterministic function of the wave id — the wave's assigned
    * slice, NOT the still-pending subset. Pending depends on ledger
    * state, so after a crash-rerun it shrinks at already-done waves,
    * and overwriting with the shrunken set ERASES completion records
    * (each execution then cascades one wave forward per rerun — the
    * failure tools/crash_rig.sh's census caught in r20). */
  def record(keys: DataFrame, ledgerDir: String, waveId: Long,
    status: String = Ledger.Completed, runId: String = ""): Unit =
    keys.select(col(keys.columns.head).cast("string").as("key"))
      .withColumn("status", lit(status))
      .withColumn("run_id", lit(runId))
      .write.mode("overwrite").parquet(s"$ledgerDir/batch=$waveId")

  /** All keys recorded with the given statuses across every committed
    * wave — folded tiers and raw tail in one frame. */
  def doneKeys(spark: SparkSession, ledgerDir: String,
    statuses: Seq[String] = Seq(Ledger.Completed, Ledger.Failed))
    : DataFrame =
    BatchDirs.readCommitted(spark, ledgerDir) match {
      case None =>
        import spark.implicits._
        Seq.empty[String].toDF("key")
      case Some(df) =>
        df.filter(col("status").isin(statuses: _*))
          .select("key").distinct()
    }

  /** Work still to do = work anti-join done (unhinted, like
    * [[Ledger.pending]]: AQE broadcasts while the done side is small
    * and degrades to a shuffle join instead of OOMing past it). */
  def pending(work: DataFrame, ledgerDir: String, keyCol: String)
    : DataFrame = {
    val done = doneKeys(work.sparkSession, ledgerDir)
      .withColumnRenamed("key", keyCol)
    work.join(done, Seq(keyCol), "left_anti")
  }

  /** The subset of `keys` already done — the point-lookup face, and
    * the payoff of the key-bucketed fold layout: the folded tiers of
    * the scan PRUNE to the buckets the asked keys hash into
    * ([[BatchDirs.bucketOf]] over the stored string key type), so an
    * "is THIS analysis done?" probe touches O(|keys| buckets +
    * cadence-bounded tail) of the ledger, not O(ledger). `keys` is a
    * bounded driver-known set (it becomes an `isin` filter and a
    * driver-side bucket derivation); for a frame-scale probe use
    * [[pending]]. The read is pinned to the generation the buckets
    * were computed for ([[BatchDirs.readCommittedAt]]). */
  def doneOf(spark: SparkSession, ledgerDir: String,
    keys: Seq[String],
    statuses: Seq[String] = Seq(Ledger.Completed, Ledger.Failed))
    : DataFrame = {
    import spark.implicits._
    val gen = BatchDirs.generation(spark, ledgerDir)
    val buckets = gen.modulus.map { n =>
      keys.toDF("raw")
        .select(BatchDirs.bucketOf(col("raw"), n).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
    }
    BatchDirs.readCommittedAt(spark, ledgerDir, gen,
      pbuckets = buckets) match {
      case None => Seq.empty[String].toDF("key")
      case Some(df) =>
        df.filter(col("status").isin(statuses: _*))
          .filter(col("key").isin(keys: _*))
          .select("key").distinct()
    }
  }

  /** Fold committed waves ≤ `upTo` ([[BatchDirs.compactTiered]],
    * bucketed by `key`). Call on a cadence from the job that owns the
    * ledger — `upTo = currentWave − 1`, the same
    * never-fold-the-newest rule as the streaming maintainers (the
    * newest wave may be re-run after a crash and needs its replay
    * marker). Returns the coverage reached. */
  def fold(spark: SparkSession, ledgerDir: String, upTo: Long,
    nBuckets: Int = 16): Long =
    BatchDirs.compactTiered(spark, ledgerDir, upTo, "key", nBuckets)
}
