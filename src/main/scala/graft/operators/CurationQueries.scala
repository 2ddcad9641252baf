package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-checked coverage for the corpus-curation operator family:
  * bloom-pruned joins (BloomJoin), context-window chunking (Chunking),
  * benchmark decontamination (Decontaminate), PII redaction (Redaction)
  * and Gopher-style repetition signals (Repetition).
  *
  * Conventions shared with the other query modules: every float leaves
  * as a half-up-scaled integer (`*_e4`), every aggregate is aliased
  * identically on both engines, and every query orders by a unique key.
  */
object CurationQueries {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** doc_id-derived synthetic PII appended to each document: a lower-
    * case email, an SSN-shaped id, a phone-shaped number. Deterministic
    * on both engines, so the redaction rules have real matches to
    * consume (the raw corpus text is plain words). */
  private val piiSql =
    """concat_ws(' ', text,
      |  concat('user', cast(doc_id as string), '@mail.com'),
      |  concat(lpad(cast(doc_id % 900 + 100 as string), 3, '0'), '-',
      |         lpad(cast(doc_id % 90 + 10 as string), 2, '0'), '-',
      |         lpad(cast(doc_id % 9000 + 1000 as string), 4, '0')),
      |  concat(lpad(cast(doc_id % 800 + 200 as string), 3, '0'), '-',
      |         lpad(cast(doc_id % 8000 + 2000 as string), 4, '0')))"""
      .stripMargin

  private val piiOracle =
    """concat_ws(' ', text,
      |  'user' || doc_id::VARCHAR || '@mail.com',
      |  lpad((doc_id % 900 + 100)::VARCHAR, 3, '0') || '-' ||
      |    lpad((doc_id % 90 + 10)::VARCHAR, 2, '0') || '-' ||
      |    lpad((doc_id % 9000 + 1000)::VARCHAR, 4, '0'),
      |  lpad((doc_id % 800 + 200)::VARCHAR, 3, '0') || '-' ||
      |    lpad((doc_id % 8000 + 2000)::VARCHAR, 4, '0'))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom-pruned EXACT semi join: lineitem ⋉ urgent orders. The
    // bloom filter drops most non-matching lineitem rows in the scan
    // stage; the left_semi join removes false positives, so the result
    // equals a plain IN-subquery — which is exactly what the oracle
    // runs.
    "j10_bloom_semi" -> ((s, dir) => {
      val line = Tables.load(s, dir, "lineitem")
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      BloomJoin.semiJoin(line, urgent, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Bloom-short-circuited EXACT anti join: rows whose key the bloom
    // proves absent skip the join entirely; only candidates are
    // checked. Equals NOT IN over non-null keys.
    "j11_bloom_anti" -> ((s, dir) => {
      val line = Tables.load(s, dir, "lineitem")
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      BloomJoin.antiJoin(line, urgent, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // Context-window chunking: 40-token windows, stride 30 (10-token
    // overlap). Pure narrow plan; the oracle replays the identical
    // integer ceil-division and list-slice arithmetic.
    "c1_chunk_windows" -> ((s, dir) =>
      Chunking.byTokenWindow(docs(s, dir), "doc_id", "text",
        chunkSize = 40, stride = 30)
        .orderBy("doc_id", "chunk_no")),

    // Benchmark decontamination: src0 is the "eval set"; every other
    // document is scored by how many distinct word 4-grams it shares
    // with src0. The engine joins on xxhash64(gram) (8-byte keys);
    // the oracle joins raw grams — identical short of a 2^-64
    // collision.
    "c2_decontam_hits" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontaminate.hits(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"),
        "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // PII redaction over synthesized identifiers: sequential rules
    // (email, then SSN-shaped, then phone-shaped), counts measured on
    // the progressively-redacted text exactly as the oracle's staged
    // CTEs do.
    "c3_redact" -> ((s, dir) =>
      Redaction.redact(
        docs(s, dir).select(col("doc_id"), expr(piiSql).as("pii")),
        "pii")
        .select(col("doc_id"), col("n_email"), col("n_ssn"),
          col("n_phone"), col("pii_redacted"))
        .orderBy("doc_id")),

    // Gopher-style repetition signals: duplicate-word fraction and
    // top-bigram fraction per document, computed in one mapPartitions
    // pass (O(words) per doc, zero shuffles).
    "c4_repetition" -> ((s, dir) =>
      Repetition.stats(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id"))
  )

  private val oracleToks =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "j10_bloom_semi" -> """
      |SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j11_bloom_anti" -> """
      |SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders
      |                         WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c1_chunk_windows" -> (oracleToks + """,
      |c AS (SELECT doc_id, w,
      |  CASE WHEN len(w) <= 40 THEN 1::BIGINT
      |       ELSE ((len(w) - 40 + 29) // 30)::BIGINT + 1 END AS n_chunks
      | FROM toks WHERE len(w) > 0),
      |e AS (SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_no, w
      |      FROM c)
      |SELECT doc_id, chunk_no,
      | len(list_slice(w, chunk_no * 30 + 1, chunk_no * 30 + 40))::BIGINT
      |  AS n_tokens,
      | array_to_string(list_slice(w, chunk_no * 30 + 1,
      |   chunk_no * 30 + 40), ' ') AS chunk_text
      |FROM e ORDER BY doc_id, chunk_no""".stripMargin),
    "c2_decontam_hits" -> (oracleToks + """,
      |g AS (SELECT doc_id, source,
      |  list_distinct(list_transform(range(1, len(w) - 2),
      |    i -> array_to_string(list_slice(w, i, i + 3), ' '))) AS grams
      | FROM toks WHERE len(w) >= 4),
      |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |       WHERE source = 'src0'),
      |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |       WHERE source <> 'src0')
      |SELECT doc_id, count(*) AS n_hits
      |FROM cg JOIN bg USING (gram)
      |GROUP BY 1 ORDER BY 1""".stripMargin),
    "c3_redact" -> (s"""
      |WITH base AS (SELECT doc_id, $piiOracle AS t0 FROM documents),
      |s1 AS (SELECT doc_id,
      |  len(regexp_extract_all(t0,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))::BIGINT AS n_email,
      |  regexp_replace(t0, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
      |    '[EMAIL]', 'g') AS t1 FROM base),
      |s2 AS (SELECT doc_id, n_email,
      |  len(regexp_extract_all(t1,
      |    '[0-9]{3}-[0-9]{2}-[0-9]{4}'))::BIGINT AS n_ssn,
      |  regexp_replace(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[ID]', 'g')
      |    AS t2 FROM s1),
      |s3 AS (SELECT doc_id, n_email, n_ssn,
      |  len(regexp_extract_all(t2, '[0-9]{3}-[0-9]{4}'))::BIGINT
      |    AS n_phone,
      |  regexp_replace(t2, '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS t3
      |  FROM s2)
      |SELECT doc_id, n_email, n_ssn, n_phone, t3 AS pii_redacted
      |FROM s3 ORDER BY doc_id""".stripMargin),
    "c4_repetition" -> (oracleToks + """,
      |t AS (SELECT doc_id, w FROM toks WHERE len(w) > 0),
      |dup AS (SELECT doc_id, len(w)::BIGINT AS n_words,
      |  CAST(floor((len(w) - len(list_distinct(w))) * 10000.0 / len(w)
      |    + 0.5) AS BIGINT) AS dup_word_frac_e4 FROM t),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i + 1])) AS bigram
      |  FROM t WHERE len(w) >= 2),
      |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS top_c FROM bc GROUP BY 1)
      |SELECT d.doc_id, d.n_words, d.dup_word_frac_e4,
      | CASE WHEN d.n_words < 2 THEN 0::BIGINT
      |      ELSE CAST(floor(t.top_c * 10000.0 / (d.n_words - 1) + 0.5)
      |        AS BIGINT) END AS top_bigram_frac_e4
      |FROM dup d LEFT JOIN top t ON d.doc_id = t.doc_id
      |ORDER BY d.doc_id""".stripMargin)
  )
}
