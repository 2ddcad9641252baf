package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** A5's runtime metrics, streaming-native: the reference computes
  * marks/sec and ETA by hand in its driver loop (mongodb_to_rdf.py:
  * 799-821) and never persists them; here a StreamingQueryListener
  * accumulates per-QUERY rows/batches/rate (keyed by query id, so
  * multiple concurrent streams never blend into one bogus total) and
  * exposes both per-query and whole-session views.
  */
final class ProgressMetrics extends StreamingQueryListener {
  private final class Q {
    val rows = new AtomicLong(0L)
    val batches = new AtomicLong(0L)
    @volatile var lastRate: Double = 0.0
  }
  private val byQuery = new ConcurrentHashMap[UUID, Q]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  /** A terminated query contributes no throughput: zero its rate so
    * `rowsPerSecond` (sum of ACTIVE rates) never accumulates stale
    * rates from dead queries. Row/batch totals stay — they are
    * cumulative session counters, not rates. */
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    Option(byQuery.get(event.id)).foreach(_.lastRate = 0.0)
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val q = byQuery.computeIfAbsent(event.progress.id, _ => new Q)
    q.rows.addAndGet(event.progress.numInputRows)
    q.batches.incrementAndGet()
    q.lastRate = event.progress.processedRowsPerSecond
  }

  import scala.jdk.CollectionConverters._
  private def all = byQuery.values.asScala

  def totalRows: Long = all.map(_.rows.get()).sum
  def totalBatches: Long = all.map(_.batches.get()).sum
  /** Aggregate throughput = sum of each active query's last rate. */
  def rowsPerSecond: Double = all.map(_.lastRate).sum

  def rowsFor(queryId: UUID): Long =
    Option(byQuery.get(queryId)).map(_.rows.get()).getOrElse(0L)
  def rateFor(queryId: UUID): Double =
    Option(byQuery.get(queryId)).map(_.lastRate).getOrElse(0.0)

  /** Remaining-work ETA in seconds for one query, like the
    * reference's ETA-hours report — NaN until a rate is observed. */
  def etaSeconds(queryId: UUID, remainingRows: Long): Double = {
    val r = rateFor(queryId)
    if (r > 0) remainingRows / r else Double.NaN
  }

  // ── operator-emitted gauges ────────────────────────────────────
  // Per-batch health series an operator computes from its own data
  // (what a listener cannot see): e.g. the IVF maintainer's mean
  // distance-to-assigned-centroid and assignment entropy, the
  // observable trigger behind its rebuild-don't-mutate caveat.
  // Bounded: one double per (gauge, batch).
  private final class Series {
    val byBatch = new ConcurrentHashMap[Long, Double]()
    // highest-batchId entry, maintained on write so the alerting
    // face is O(1) — an always-on monitor polling lastGauge every
    // trigger must not re-sort the stream-lifetime series each time
    val last = new java.util.concurrent.atomic
      .AtomicReference[(Long, Double)](null)
  }
  private val gauges = new ConcurrentHashMap[String, Series]()

  def recordGauge(name: String, batchId: Long, value: Double): Unit = {
    val s = gauges.computeIfAbsent(name, _ => new Series)
    s.byBatch.put(batchId, value)
    s.last.updateAndGet(p =>
      if (p == null || batchId >= p._1) (batchId, value) else p)
    ()
  }

  /** The gauge's full (batchId, value) series, batch-ordered — the
    * debugging/plotting face. Holds one double per (gauge, batch)
    * for the stream's lifetime: O(n log n) to materialize, and on a
    * months-long always-on stream the series itself is the bound —
    * poll [[lastGauge]] for alerting, it never touches this. */
  def gauge(name: String): Seq[(Long, Double)] =
    Option(gauges.get(name)).toSeq
      .flatMap(_.byBatch.asScala.toSeq).sortBy(_._1)

  /** Latest value — the alerting face ("did assignment drift?").
    * O(1): served from the write-maintained last entry. */
  def lastGauge(name: String): Option[Double] =
    Option(gauges.get(name)).flatMap(s => Option(s.last.get()))
      .map(_._2)
}

object ProgressMetrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): ProgressMetrics = {
    val m = new ProgressMetrics
    spark.streams.addListener(m)
    m
  }
}
