package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training/RAG assembly: split each document
  * into fixed-size overlapping word windows (chunk i covers tokens
  * [i·stride, i·stride + chunkSize)), the standard long-document →
  * context-window preprocessing step.
  *
  * Pure narrow plan: tokenize → per-row chunk-count arithmetic →
  * explode → slice/join — zero shuffles, stays inside whole-stage
  * codegen, scales linearly with corpus bytes. Chunk counts are
  * computed with integer ceil-division (`div`, no doubles), so the
  * same arithmetic replays exactly in any SQL oracle.
  */
object Chunking {

  /** One row per (id, chunk_no): `n_tokens` tokens of the window and
    * the window text re-joined with single spaces. `chunkSize` =
    * window width in tokens, `stride` = hop (stride < chunkSize ⇒
    * overlap of chunkSize − stride tokens). Documents with no tokens
    * produce no chunks; every other document produces ≥ 1 (the last
    * window may be shorter than `chunkSize`). Chunk starts never
    * point past the text: n_chunks = 1 + ceil((len − chunkSize) /
    * stride) for len > chunkSize, else 1. */
  def byTokenWindow(df: DataFrame, idCol: String, textCol: String,
    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (size $chunkSize)")
    val clash = df.columns.toSet.intersect(Set("chunk_no", "n_tokens",
      "chunk_text", "w", "n_chunks"))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with chunking " +
        "output/internal columns — rename before chunking")
    df.withColumn("w", expr(MinHashLsh.tokensSql(textCol)))
      .filter(size(col("w")) > 0)
      .withColumn("n_chunks", expr(
        s"""if(size(w) <= $chunkSize, 1L,
           |  ((size(w) - $chunkSize + $stride - 1) div $stride) + 1L)"""
          .stripMargin))
      .select(col(idCol),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_no"),
        col("w"))
      .withColumn("toks", slice(col("w"),
        (col("chunk_no") * stride + 1).cast("int"), lit(chunkSize)))
      .select(col(idCol), col("chunk_no"),
        size(col("toks")).cast("long").as("n_tokens"),
        array_join(col("toks"), " ").as("chunk_text"))
  }
}
