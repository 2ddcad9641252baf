package graft.incremental

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable work ledger: the engine's replacement for the reference's
  * checkpoint files (T2, mongo-etl/mongodb_to_rdf.py:114-192 and
  * utils/checkpoint.py:9-235 — append + fsync text files of completed/
  * failed ids).
  *
  * Design: an append-only parquet directory of (key, status, run_id)
  * rows. Appends are atomic at file granularity (parquet commit
  * protocol), so a killed run never corrupts the ledger — at worst the
  * last in-flight keys are absent and get reprocessed (same at-least-
  * once semantics as the reference's fsync'd append, :157-188).
  *
  * Work selection is the J5/P12/E2 anti-join: work ∖ completed. At
  * 100 TB the ledger (one row per work unit — analyses, not marks;
  * ~4M rows) broadcast-joins against the work table; if it ever
  * outgrows the broadcast threshold, AQE falls back to a shuffle join
  * — semantics unchanged. A bloom-filter pre-pass is the documented
  * escape hatch (SURVEY §7.4).
  */
object Ledger {
  val Completed = "completed"
  val Failed = "failed"

  /** Append keys with a status. Call once per finished unit-of-work
    * batch (the driver's foreachBatch / job end). */
  def record(spark: SparkSession, ledgerDir: String, keys: Seq[String],
    status: String = Completed, runId: String = ""): Unit = {
    import spark.implicits._
    record(keys.toDF("key"), ledgerDir, status, runId)
  }

  /** Distributive record: append the FIRST column of `keys` (cast to
    * string) without ever collecting to the driver — the right call
    * when the key set is itself a big frame (e.g. 4M analysis ids at
    * reference scale; the Seq overload above is for driver-known
    * handfuls only). */
  def record(keys: DataFrame, ledgerDir: String,
    status: String, runId: String): Unit = {
    keys.select(col(keys.columns.head).cast("string").as("key"))
      .withColumn("status", lit(status))
      .withColumn("run_id", lit(runId))
      .write.mode(SaveMode.Append).parquet(ledgerDir)
  }
  def record(keys: DataFrame, ledgerDir: String): Unit =
    record(keys, ledgerDir, Completed, "")

  /** All keys ever recorded with the given statuses (default: anything
    * that should NOT be reprocessed — completed or failed, matching
    * should_process, mongodb_to_rdf.py:149-152). */
  def doneKeys(spark: SparkSession, ledgerDir: String,
    statuses: Seq[String] = Seq(Completed, Failed)): DataFrame = {
    val df =
      try spark.read.parquet(ledgerDir)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          import spark.implicits._
          Seq.empty[(String, String, String)]
            .toDF("key", "status", "run_id")
      }
    df.filter(col("status").isin(statuses: _*)).select("key").distinct()
  }

  /** P12/J5: the work still to do = work anti-join done. `keyCol` names
    * the work table's key column. No broadcast hint: an explicit hint
    * is honored REGARDLESS of size, so a ledger that outgrew the
    * threshold would OOM the driver instead of degrading. Unhinted,
    * AQE broadcasts while the done-side is small and falls back to a
    * shuffle join when it is not — `pendingBloom` is the explicit
    * escape hatch beyond that. */
  def pending(work: DataFrame, ledgerDir: String, keyCol: String)
    : DataFrame = {
    val done = doneKeys(work.sparkSession, ledgerDir)
      .withColumnRenamed("key", keyCol)
    work.join(done, Seq(keyCol), "left_anti")
  }

  /** Compaction: append-only ledgers accrue one parquet file per
    * record() call (4M analyses → millions of tiny files). Strategy:
    * snapshot the current part-file list, APPEND one file holding
    * their distinct (key, status, run_id='compacted') rows, then
    * delete exactly the snapshotted inputs. No directory renames, so
    * there is no window where the ledger is missing: a crash at any
    * point leaves the dir with either originals + the compacted file
    * (duplicate rows — harmless, doneKeys is distinct) or a partial
    * delete (still a superset of the truth). Concurrent record()
    * appends are never deleted (they are not in the snapshot). The
    * full (key, status) SET is preserved, so doneKeys with any status
    * filter returns identical results before and after. Run while no
    * concurrent READER is active (a reader that planned against a
    * snapshotted file could hit FileNotFound mid-scan). */
  def compact(spark: SparkSession, ledgerDir: String): Unit = {
    // Hadoop FS, not java.nio: the production ledger lives on
    // HDFS/object storage (the 100 TB shape this scaladoc targets),
    // where a local-path API would silently no-op and the small-file
    // pile would grow forever
    val path = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val snapshot = fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    if (snapshot.length <= 1) return
    spark.read.parquet(snapshot.map(_.toString): _*)
      .select("key", "status").distinct()
      .withColumn("run_id", lit("compacted"))
      .repartition(1)
      .write.mode(SaveMode.Append).parquet(ledgerDir)
    snapshot.foreach(p => fs.delete(p, false))
  }

  /** Bloom-filter pre-pass (SURVEY §7.4's 100 TB escape hatch): when
    * the ledger outgrows the broadcast threshold, probe a compact
    * bloom of done keys first — rows the bloom rejects are DEFINITELY
    * pending and skip the join entirely; only might-contain rows
    * (done ∪ false positives, rate `fpp`) go through the exact
    * anti-join. Result is exactly `pending` (the bloom only prunes).
    *
    * Routed through BloomJoin.antiJoin: the filter is BUILT
    * distributively (per-partition word bitmaps, ≤ numBits/64 rows to
    * the driver) and PROBED by the native codegen'd expression — no
    * driver-side sketch aggregation, no per-row UDF boxing. The DONE
    * keys are cast to the WORK key's type first — the same direction
    * ANSI coercion takes in pending()'s join (string → numeric), so
    * both entry points compare (and here: hash) identical values; a
    * string-side cast of the work key would let a DOUBLE 5.0 vs
    * ledger "5" agree in pending() but miss here. */
  def pendingBloom(work: DataFrame, ledgerDir: String, keyCol: String,
    fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    require(!work.columns.contains("_ledger_done_key"),
      "column _ledger_done_key collides with the bloom pre-pass")
    // persisted: the count (sizing), the bloom build, and the exact
    // anti-join of candidates all consume this frame — unpersisted
    // they would each re-scan and re-distinct the whole append-only
    // ledger directory, 3× the I/O on exactly the hot path this
    // method exists to cheapen. Tracked via Broadcasting so the
    // operator-wide releaseAll() discipline frees it (unpersisting
    // here would drop the cache before the returned lazy frame runs).
    val done = graft.operators.Broadcasting.track(
      doneKeys(work.sparkSession, ledgerDir)
        .select(col("key").cast(work.schema(keyCol).dataType)
          .as("_ledger_done_key"))
        .persist())
    val n = math.max(done.count(), 1L)
    // standard sizing: m = -n·ln(fpp)/ln²2 (rounded up to words),
    // k = (m/n)·ln2
    val ln2 = math.log(2)
    val rawBits = math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong
    val numBits = math.min(1L << 30, ((rawBits + 63) / 64) * 64).toInt
    if (numBits < rawBits)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Ledger.pendingBloom: requested fpp=$fpp needs $rawBits bits " +
          s"for $n done keys but the filter is capped at $numBits — " +
          "realized fpp will be higher; the pre-pass prunes less and " +
          "more rows pay the exact anti-join")
    val numHashes = math.max(1,
      math.round(numBits.toDouble / n * ln2).toInt.min(16))
    graft.operators.BloomJoin.antiJoin(work, done,
      keyCol, "_ledger_done_key", numBits, numHashes)
  }
}
