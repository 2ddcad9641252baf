package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** A5's runtime metrics, streaming-native: the reference computes
  * marks/sec and ETA by hand in its driver loop (mongodb_to_rdf.py:
  * 799-821) and never persists them; here a StreamingQueryListener
  * accumulates rows processed and the engine-reported rate, giving
  * the same progress report for any query without touching the
  * dataflow.
  */
final class ProgressMetrics extends StreamingQueryListener {
  private val rows = new AtomicLong(0L)
  private val batches = new AtomicLong(0L)
  private val lastRate = new AtomicReference[Double](0.0)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    rows.addAndGet(event.progress.numInputRows)
    batches.incrementAndGet()
    lastRate.set(event.progress.processedRowsPerSecond)
  }

  def totalRows: Long = rows.get()
  def totalBatches: Long = batches.get()
  def rowsPerSecond: Double = lastRate.get()

  /** Remaining-work ETA in seconds, like the reference's ETA-hours
    * report — NaN until a rate is observed. */
  def etaSeconds(remainingRows: Long): Double = {
    val r = rowsPerSecond
    if (r > 0) remainingRows / r else Double.NaN
  }
}

object ProgressMetrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): ProgressMetrics = {
    val m = new ProgressMetrics
    spark.streams.addListener(m)
    m
  }
}
