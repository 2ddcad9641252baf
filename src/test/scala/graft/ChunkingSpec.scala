package graft

import graft.operators.Chunking

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, text: String) = Seq((id, text)).toDF("id", "text")

  test("overlapping windows cover the document with the right strides") {
    val df = doc(1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
    val out = Chunking.byTokenWindow(df, "id", "text", chunkSize = 4,
      stride = 3)
      .orderBy("chunk_no")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // starts 1, 4, 7: ceil((10-4)/3)+1 = 3 chunks
    assert(out.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10")))
  }

  test("short documents yield exactly one chunk") {
    val out = Chunking.byTokenWindow(doc(1L, "a b c"), "id", "text", 10, 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((0L, 3L, "a b c")))
  }

  test("the last window may be shorter but never starts past the text") {
    val df = doc(1L, (1 to 11).map(i => s"w$i").mkString(" "))
    val out = Chunking.byTokenWindow(df, "id", "text", 5, 5)
      .orderBy("chunk_no")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 5L), (1L, 5L), (2L, 1L)))
  }

  test("empty and whitespace-only documents produce no chunks") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("id", "text")
    val out = Chunking.byTokenWindow(df, "id", "text", 4, 2)
    assert(out.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("non-overlapping stride equals chunkSize partitions the tokens") {
    val df = doc(7L, (1 to 12).map(_.toString).mkString(" "))
    val out = Chunking.byTokenWindow(df, "id", "text", 4, 4)
      .orderBy("chunk_no")
      .collect().map(_.getString(3))
    assert(out.toSeq == Seq("1 2 3 4", "5 6 7 8", "9 10 11 12"))
  }

  test("parameters and column collisions are validated") {
    val df = doc(1L, "a b")
    intercept[IllegalArgumentException](
      Chunking.byTokenWindow(df, "id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Chunking.byTokenWindow(df, "id", "text", 4, 5))
    intercept[IllegalArgumentException](
      Chunking.byTokenWindow(df.withColumnRenamed("text", "chunk_no"),
        "id", "chunk_no", 4, 2))
  }
}
