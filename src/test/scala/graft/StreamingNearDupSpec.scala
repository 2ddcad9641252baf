package graft

import graft.operators.MinHashLsh

/** Streaming near-dup screening: incoming documents are MinHash-
  * signed and band-joined against a STATIC corpus index — the
  * "is this new document a near-duplicate of anything we already
  * hold" check, running incrementally.
  *
  * Why this works unchanged: `MinHashLsh.signatures`/`bands` are
  * narrow stateless maps (tokenize → shingle → hash → fold), so they
  * are legal on an unbounded frame, and a stream ⋈ static equi-join
  * needs no watermark (the static side is broadcast/looked up per
  * micro-batch). The only stateful op, per-doc dedup of multi-band
  * hits, stays INSIDE each result row via a grouped count.
  */
class StreamingNearDupSpec extends SparkTestBase {
  import spark.implicits._

  test("stream⋈static band join flags near-dups incrementally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq(
      100L -> "the quick brown fox jumps over the lazy dog again today",
      101L -> "completely different text about spark plans and shuffles ok")
      .toDF("doc_id", "text")
    val corpusBands = MinHashLsh.bands(
      MinHashLsh.signatures(corpus, "doc_id", "text"), "doc_id")
      .withColumnRenamed("doc_id", "corpus_id")

    val in = MemoryStream[(Long, String)]
    val streamBands = MinHashLsh.bands(
      MinHashLsh.signatures(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
    val flagged = streamBands.join(corpusBands, Seq("band", "k1", "k2"))
      .select("doc_id", "corpus_id").dropDuplicates()

    val q = flagged.writeStream.format("memory")
      .queryName("neardup_stream").outputMode("append").start()
    try {
      in.addData(
        // near-dup of corpus 100 (one word differs)
        1L -> "the quick brown fox jumps over the lazy dog again tomorrow",
        // unrelated
        2L -> "unrelated words entirely nothing shared with anything here")
      q.processAllAvailable()
      val hits = spark.table("neardup_stream")
        .as[(Long, Long)].collect().toSet
      assert(hits.contains((1L, 100L)), hits.toString)
      assert(!hits.exists(_._1 == 2L), hits.toString)
      // the stream result equals the batch computation on the same rows
      val batch = MinHashLsh.bands(MinHashLsh.signatures(
        Seq(1L -> ("the quick brown fox jumps over the lazy dog again " +
          "tomorrow"),
          2L -> "unrelated words entirely nothing shared with anything here")
          .toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
        .join(corpusBands, Seq("band", "k1", "k2"))
        .select("doc_id", "corpus_id").dropDuplicates()
        .as[(Long, Long)].collect().toSet
      assert(hits == batch, "stream and batch flag sets diverged")
    } finally q.stop()
  }
}
