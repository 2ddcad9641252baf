package graft

import graft.incremental.Ledger
import graft.pipelines.MongoMarksPipeline
import graft.streaming.StreamingTtlEtl
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.{Files, Paths}

class StreamingTtlEtlSpec extends SparkTestBase {

  test("micro-batched marks stream → TTL files + ledger rows") {
    implicit val sql = spark.sqlContext
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(MongoMarksPipeline.markSchema)
    val fx = "src/test/resources/fixtures/mongo"
    val marks = MongoMarksPipeline.readMarks(spark, s"$fx/marks.jsonl")
      .collect()
    val analyses = MongoMarksPipeline
      .readAnalyses(spark, s"$fx/analyses.jsonl")
    import spark.implicits._
    val hashes = Seq.empty[(String, String)].toDF("slide", "real_hash")

    val work = Files.createTempDirectory("stream_etl")
    val in = MemoryStream[Row](enc, spark)
    val q = StreamingTtlEtl.start(in.toDF(), analyses, hashes,
      s"$work/out", s"$work/ledger", s"$work/ckpt", batchSize = 2)
    try {
      in.addData(marks.take(2).toSeq)   // first micro-batch: 2 marks
      q.processAllAvailable()
      in.addData(marks.drop(2).toSeq)   // second: 1 valid + 1 dropped
      q.processAllAvailable()
    } finally q.stop()

    assert(Files.exists(Paths.get(s"$work/out",
      "mb000000/exec-1/img-1/batch_000001.ttl.gz")))
    assert(Files.exists(Paths.get(s"$work/out",
      "mb000001/exec-1/img-1/batch_000001.ttl.gz")))
    val done = Ledger.doneKeys(spark, s"$work/ledger").collect()
      .map(_.getString(0)).sorted
    assert(done.toSeq == Seq("mb000000", "mb000001"))
  }
}
