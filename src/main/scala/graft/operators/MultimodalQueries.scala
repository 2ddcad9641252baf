package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-checked coverage for the multimodal binary-column path: the
  * documents table's text bytes stand in for media payloads, running
  * through the REAL typed-Dataset mapPartitions plumbing
  * (Multimodal.extractFeatures) whose codec is a deterministic stub.
  * The oracle recomputes byte length / sha256 / mean byte in SQL
  * (documents are pure ASCII, so char ops == byte ops in DuckDB).
  */
object MultimodalQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("sha256"),
          col("mean_byte_e4"))
        .orderBy("media_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "m1_binary_meta" -> """
      |SELECT doc_id AS media_id,
      | octet_length(encode(text))::BIGINT AS n_bytes,
      | sha256(text) AS sha256,
      | CAST(floor(list_reduce(list_prepend(0::BIGINT,
      |   list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))), (a, b) -> a + b)
      |  * 10000.0 / len(text) + 0.5) AS BIGINT) AS mean_byte_e4
      |FROM documents ORDER BY media_id""".stripMargin
  )
}
