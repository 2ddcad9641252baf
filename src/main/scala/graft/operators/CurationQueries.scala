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
        .orderBy("doc_id")),

    // The END-TO-END curation pipeline: lang → quality → decontam →
    // exact dedup → LSH near-dup, per-stage (n_docs, n_tokens)
    // summary. The oracle replays every stage's predicate over the
    // progressively filtered set — the strongest composition check in
    // the suite.
    "c6_curation_pipeline" -> ((s, dir) => {
      val (_, summary) = CurationPipeline.run(docs(s, dir))
      summary.orderBy("stage")
    })
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
    "c6_curation_pipeline" -> {
      val P = MinHashLsh.P
      val mins = MinHashLsh.perms.zipWithIndex.map { case ((a, b), i) =>
        s"  min((h * $a + $b) % $P) AS mh$i" }.mkString(",\n")
      s"""
      |WITH ctoks AS (
      |  SELECT doc_id, source, text,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents WHERE source <> 'src0'),
      |sigs AS (
      |  SELECT doc_id, source, text, w, len(w)::BIGINT AS n_tok,
      |    len(list_filter(w, t -> t IN ('the', 'a'))) AS s_en,
      |    len(list_filter(w, t -> t IN ('el', 'la'))) AS s_es,
      |    len(list_filter(w, t -> t IN ('der', 'die'))) AS s_de,
      |    len(list_filter(w, t -> t IN ('le', 'les'))) AS s_fr,
      |    len(list_filter(w, t -> t IN ('的'))) AS s_zh
      |  FROM ctoks),
      |base AS (
      |  SELECT doc_id, source, text, w, n_tok,
      |    CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
      |     WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
      |      AND s_en >= s_zh THEN 'en'
      |     WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |     WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |     WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted,
      |    CASE WHEN n_tok = 0 THEN 0 ELSE CAST(floor((
      |        0.5 * len(list_distinct(w)) / n_tok
      |      + 0.3 * (1.0 - len(list_filter(w, t -> t IN ('the', 'a')))
      |               / CAST(n_tok AS DOUBLE))
      |      + 0.2 * least(1.0, n_tok / 100.0)) * 10000 + 0.5) AS BIGINT)
      |    END AS score_e4
      |  FROM sigs),
      |k1 AS (SELECT * FROM base WHERE predicted IN ('en')),
      |k2 AS (SELECT * FROM k1 WHERE score_e4 >= 6000),
      |bg AS (SELECT DISTINCT unnest(list_distinct(list_transform(
      |         range(1, len(w) - 2),
      |         i -> array_to_string(list_slice(w, i, i + 3), ' ')))) AS g
      |       FROM (SELECT list_filter(string_split(text, ' '),
      |               t -> t <> '') AS w
      |             FROM documents WHERE source = 'src0')
      |       WHERE len(w) >= 4),
      |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, len(w) - 2),
      |         i -> array_to_string(list_slice(w, i, i + 3), ' ')))) AS g
      |       FROM k2 WHERE len(w) >= 4),
      |bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (g)),
      |k3 AS (SELECT * FROM k2
      |       WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
      |reps AS (SELECT min(doc_id) AS doc_id FROM k3
      |         GROUP BY sha256(text)),
      |k4 AS (SELECT * FROM k3
      |       WHERE doc_id IN (SELECT doc_id FROM reps)),
      |sh4 AS (SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      |  FROM k4 WHERE len(w) >= 3),
      |hx4 AS (SELECT doc_id,
      |    ('0x' || substr(md5(unnest(shingles)), 1, 15))::BIGINT % $P AS h
      |  FROM sh4),
      |sig4 AS (SELECT doc_id,
      |$mins
      |  FROM hx4 GROUP BY 1),
      |bands4 AS (
      |  SELECT doc_id, 0 AS band, mh0 AS k1, mh1 AS k2 FROM sig4
      |  UNION ALL SELECT doc_id, 1, mh2, mh3 FROM sig4
      |  UNION ALL SELECT doc_id, 2, mh4, mh5 FROM sig4
      |  UNION ALL SELECT doc_id, 3, mh6, mh7 FROM sig4),
      |losers AS (SELECT DISTINCT b.doc_id FROM bands4 a JOIN bands4 b
      |  ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
      |  AND a.doc_id < b.doc_id),
      |k5 AS (SELECT * FROM k4
      |       WHERE doc_id NOT IN (SELECT doc_id FROM losers))
      |SELECT 0::BIGINT AS stage, count(*)::BIGINT AS n_docs,
      |  coalesce(sum(n_tok), 0)::BIGINT AS n_tokens FROM base
      |UNION ALL SELECT 1, count(*), coalesce(sum(n_tok), 0)::BIGINT FROM k1
      |UNION ALL SELECT 2, count(*), coalesce(sum(n_tok), 0)::BIGINT FROM k2
      |UNION ALL SELECT 3, count(*), coalesce(sum(n_tok), 0)::BIGINT FROM k3
      |UNION ALL SELECT 4, count(*), coalesce(sum(n_tok), 0)::BIGINT FROM k4
      |UNION ALL SELECT 5, count(*), coalesce(sum(n_tok), 0)::BIGINT FROM k5
      |ORDER BY stage""".stripMargin
    },
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
