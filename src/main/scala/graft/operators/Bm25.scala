package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a text column — the lexical search
  * scorer a corpus pipeline runs for retrieval-augmented data
  * curation (find the documents most relevant to a probe query) and
  * for search-quality triage next to `TfIdf`.
  *
  * score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard
  * Robertson/Sparck-Jones formulation.
  *
  * Numeric contract (cross-engine exactness): every shared aggregate
  * is integer (N, df, dl, Σdl — `avgdl` is `sum(dl)::double / N`,
  * never a float `avg` whose partial-sum order varies); the per-term
  * double chain (one `ln` + correctly-rounded · / + ops in fixed
  * evaluation order) is quantized HALF-UP to `tscore_e4` per (doc,
  * term) BEFORE the per-doc sum, which is then pure int64 — float
  * addition order never touches a result.
  *
  * Residual transcendental risk (same caveat as TfIdf): `ln` is not
  * guaranteed correctly rounded by either java.lang.Math or DuckDB's
  * libm, so a 1-ulp divergence landing exactly on a
  * floor(x·1e4 + 0.5) boundary could flip the quantized score on
  * some corpus/platform. Observed bit-identical on this corpus;
  * compare `tscore_e4` with ±1 tolerance instead of hash-exact if a
  * port ever hits a boundary case.
  *
  * Plan shape at 100 TB: query terms are a LITERAL array — the
  * corpus × terms expansion is a narrow explode (|q| rows per doc,
  * no shuffle), tf is an in-array count (no tokenize-explode
  * shuffle), df is a |q|-row aggregate joined back as the trivially
  * small side, and top-k is a TakeOrdered (per-partition heap + one
  * driver merge of k·partitions rows), never a global sort.
  */
object Bm25 {

  /** Per-(doc, term) BM25 partial scores for `terms`: (idCol, term,
    * tf, df, dl, tscore_e4), rows only where tf > 0. */
  def termScores(df: DataFrame, idCol: String, textCol: String,
    terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val clash = df.columns.toSet.intersect(Set("w", "dl", "term", "tf",
      "df", "n_docs", "sum_dl", "tscore_e4"))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with BM25 " +
        "columns — rename before scoring")
    val base = df
      .withColumn("w", expr(MinHashLsh.tokensSql(textCol)))
      .filter(size(col("w")) > 0)
      .select(col(idCol), col("w"), size(col("w")).cast("long").as("dl"))
    // N and Σdl: one tiny global aggregate, crossed in (Catalyst
    // broadcasts a 1-row side on its own)
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val perTerm = base
      .select(col(idCol), col("w"), col("dl"),
        explode(array(terms.map(lit): _*)).as("term"))
      .withColumn("tf", expr("cast(size(filter(w, x -> x = term)) as long)"))
      .filter(col("tf") > 0)
      .drop("w")
    // document frequency per query term: a |terms|-row frame
    val docFreq = Broadcasting.maybeBroadcast(
      perTerm.groupBy(col("term")).agg(count(lit(1)).as("df")))
    perTerm.join(docFreq, "term")
      .crossJoin(stats)
      .withColumn("tscore_e4", expr(
        s"""cast(floor(
           |  ln(1.0d + (cast(n_docs - df as double) + 0.5d)
           |            / (cast(df as double) + 0.5d))
           |  * (cast(tf as double) * ${k1 + 1.0}d)
           |  / (cast(tf as double)
           |     + ${k1}d * (${1.0 - b}d + ${b}d * cast(dl as double)
           |                 / (cast(sum_dl as double)
           |                    / cast(n_docs as double))))
           |  * 10000.0d + 0.5d) as bigint)""".stripMargin))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        col("tscore_e4"))
  }

  /** Global top-`k` documents by summed BM25 score (ties: id asc) —
    * (idCol, score_e4). TakeOrdered plan, no full sort. */
  def topDocs(df: DataFrame, idCol: String, textCol: String,
    terms: Seq[String], k: Int,
    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    termScores(df, idCol, textCol, terms, k1, b)
      .groupBy(col(idCol))
      .agg(sum(col("tscore_e4")).as("score_e4"))
      .orderBy(col("score_e4").desc, col(idCol).asc)
      .limit(k)
  }
}
