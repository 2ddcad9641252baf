package graft

import graft.streaming.{EventStreams, ProgressMetrics}
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class ProgressMetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("listener accumulates rows/batches across micro-batches") {
    implicit val sql = spark.sqlContext
    val metrics = ProgressMetrics.attach(spark)
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream.format("memory")
      .queryName("pm_sink").outputMode(OutputMode.Append).start()
    try {
      in.addData(Event(1, Timestamp.valueOf("2026-01-01 10:00:00"), 1,
        "a", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(
        Event(2, Timestamp.valueOf("2026-01-01 10:01:00"), 1, "a", 1.0,
          "{}"),
        Event(3, Timestamp.valueOf("2026-01-01 10:02:00"), 1, "a", 1.0,
          "{}"))
      q.processAllAvailable()
      // listener events are async; wait for delivery
      val deadline = System.nanoTime() + 10e9.toLong
      while (metrics.totalRows < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(metrics.totalRows == 3)
      assert(metrics.totalBatches >= 2)
      assert(metrics.rowsFor(q.id) == 3) // per-query view
      val eta = metrics.etaSeconds(q.id, 0)
      assert(eta == 0.0 || eta.isNaN || eta >= 0.0)
    } finally {
      q.stop()
      spark.streams.removeListener(metrics)
    }
  }

  test("terminated queries stop contributing to the aggregate rate") {
    implicit val sql = spark.sqlContext
    val metrics = ProgressMetrics.attach(spark)
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream.format("memory")
      .queryName("pm_evict_sink").outputMode(OutputMode.Append).start()
    try {
      in.addData(Event(1, Timestamp.valueOf("2026-01-01 10:00:00"), 1,
        "a", 1.0, "{}"))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 10e9.toLong
      while (metrics.rowsFor(q.id) < 1 && System.nanoTime() < deadline)
        Thread.sleep(50)
      q.stop()
      q.awaitTermination()
      // termination events are async too
      val d2 = System.nanoTime() + 10e9.toLong
      while (metrics.rateFor(q.id) != 0.0 && System.nanoTime() < d2)
        Thread.sleep(50)
      assert(metrics.rateFor(q.id) == 0.0,
        s"stale rate ${metrics.rateFor(q.id)} after termination")
      assert(metrics.rowsPerSecond == 0.0)
      // cumulative counters survive eviction
      assert(metrics.rowsFor(q.id) == 1)
    } finally {
      spark.streams.removeListener(metrics)
    }
  }
}
