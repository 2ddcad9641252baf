package graft

import graft.operators.IncrementalAgg
import graft.streaming.StreamingSummary
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Changelog row for the streaming-IVM spec: group, measure, sign. */
case class Change(g: String, m: Long, _op: Long)

class StreamingSummarySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("micro-batches fold into the stored summary; result = direct agg") {
    implicit val sql = spark.sqlContext
    val dir = tmp("graft_ssum")
    val in = MemoryStream[Change]
    val q = StreamingSummary.start(in.toDF(), dir, tmp("graft_ssum_cp"),
      Seq("g"), Seq("m"))
    try {
      in.addData(Change("a", 10, 1), Change("a", 20, 1),
        Change("b", 5, 1))
      q.processAllAvailable()
      // batch 2: update a's 20→25 (-/+ pair), delete b entirely
      in.addData(Change("a", 20, -1), Change("a", 25, 1),
        Change("b", 5, -1))
      q.processAllAvailable()
      val rows = spark.read.parquet(
          s"$dir/gen=${StreamingSummary.current(spark, dir).get._1}")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(rows == Set(("a", 2L, 35L)), s"got $rows")
    } finally q.stop()
  }

  test("replayed batch id is a no-op (exactly-once under recovery)") {
    val dir = tmp("graft_ssum2")
    val b0 = Seq(Change("a", 10, 1), Change("a", 30, 1)).toDF()
    StreamingSummary.applyBatch(b0, 0L, dir, Seq("g"), Seq("m"))
    val b1 = Seq(Change("a", 10, -1)).toDF()
    StreamingSummary.applyBatch(b1, 1L, dir, Seq("g"), Seq("m"))
    StreamingSummary.applyBatch(b1, 1L, dir, Seq("g"), Seq("m")) // replay
    val (gen, lastBatch) = StreamingSummary.current(spark, dir).get
    assert(gen == 1L && lastBatch == 1L)
    val rows = spark.read.parquet(s"$dir/gen=$gen")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("a", 1L, 30L)), s"replay double-applied: $rows")
  }

  test("pointer survives a failed generation write (old gen stays current)") {
    val dir = tmp("graft_ssum3")
    StreamingSummary.applyBatch(
      Seq(Change("a", 7, 1)).toDF(), 0L, dir, Seq("g"), Seq("m"))
    // a batch that fails mid-write (negative count raises) must not
    // swing the pointer
    intercept[Exception] {
      StreamingSummary.applyBatch(
        Seq(Change("a", 7, -1), Change("a", 7, -1)).toDF(),
        1L, dir, Seq("g"), Seq("m"))
    }
    val (gen, lastBatch) = StreamingSummary.current(spark, dir).get
    assert(gen == 0L && lastBatch == 0L,
      s"pointer moved past a failed batch: gen=$gen batch=$lastBatch")
    val rows = spark.read.parquet(s"$dir/gen=$gen")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("a", 1L, 7L)))
  }

  test("superseded generations are GC'd: current plus one remain") {
    val dir = tmp("graft_ssum5")
    (0 to 3).foreach { i =>
      StreamingSummary.applyBatch(
        Seq(Change("a", 1, 1)).toDF(), i.toLong, dir, Seq("g"), Seq("m"))
    }
    val gens = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens == Seq("gen=2", "gen=3"), s"got $gens")
    val (gen, _) = StreamingSummary.current(spark, dir).get
    val rows = spark.read.parquet(s"$dir/gen=$gen")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rows == Set(("a", 4L, 4L)))
  }

  test("batch-id regression beyond replay fails loudly") {
    val dir = tmp("graft_ssum6")
    (0 to 2).foreach { i =>
      StreamingSummary.applyBatch(
        Seq(Change("a", 1, 1)).toDF(), i.toLong, dir, Seq("g"), Seq("m"))
    }
    // fresh-checkpoint restart: ids reset to 0 against applied=2
    val e = intercept[IllegalStateException] {
      StreamingSummary.applyBatch(
        Seq(Change("a", 1, 1)).toDF(), 0L, dir, Seq("g"), Seq("m"))
    }
    assert(e.getMessage.contains("fresh checkpoint"))
    // ANY regression below the applied id is the fresh-checkpoint
    // signature (legitimate recovery only ever re-presents the last
    // applied id itself): regression 1 must fail loudly too — with a
    // 2-batch summary it would otherwise silently drop deltas FOREVER
    intercept[IllegalStateException] {
      StreamingSummary.applyBatch(
        Seq(Change("a", 1, 1)).toDF(), 1L, dir, Seq("g"), Seq("m"))
    }
    // the exact-replay id stays a silent no-op
    StreamingSummary.applyBatch(
      Seq(Change("a", 1, 1)).toDF(), 2L, dir, Seq("g"), Seq("m"))
    assert(StreamingSummary.current(spark, dir).get == ((2L, 2L)))
  }

  test("empty-store read returns the canonical empty summary schema") {
    val dir = tmp("graft_ssum4")
    val schema = Seq(Change("x", 1, 1)).toDF()
      .select("g").schema
    val df = StreamingSummary.read(spark, dir, schema, Seq("m"))
    assert(df.columns.toSeq == Seq("g", "cnt", "sum_m"))
    assert(df.count() == 0)
  }
}
