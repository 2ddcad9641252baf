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
}
