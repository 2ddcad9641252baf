package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-substring (token-window) duplication detection — the
  * distributed approximation of suffix-array exact-substring dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"): a document sharing any `window`-token span with another
  * document is flagged, with the count of such spans as the signal a
  * span-removal pass would act on.
  *
  * Plan (100 TB shape): tokenize → per-doc DISTINCT window hashes
  * (narrow map: the window text never materializes, each window
  * collapses to one xxhash64 long inside the building transform) →
  * explode → document-frequency count per span hash → join back on
  * the 8-byte hash → per-doc aggregate. An inverted index on span
  * hashes, exactly the d2 shingle-index shape: cost scales with
  * corpus × windows-per-doc, never with document pairs². A span
  * shared by B documents costs B index rows — NOT B²/2 pairs,
  * because the operator counts duplicated spans per document instead
  * of generating pairs.
  *
  * Exactness: two different spans hashing to one xxhash64 value
  * (~2^-64) could over-count; the same accepted trade as
  * Decontaminate's gram hashing (CurationQueries c2).
  */
object SpanDedup {

  /** Per-document duplicated-span counts: documents sharing at least
    * one `window`-token span with ANOTHER document, with `n_spans` =
    * distinct spans in the doc and `n_dup_spans` = how many of those
    * appear in ≥1 other document. Documents shorter than `window`
    * tokens have no spans and never appear. */
  def dupSpanCounts(docsDf: DataFrame, idCol: String, textCol: String,
    window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    // the window expression must be TOTAL: the join on `h` below makes
    // Catalyst infer isnotnull over this expression and evaluate it in
    // a filter that can run BEFORE the row-count guard — and
    // `sequence(1, stop)` with stop < 1 is a DESCENDING sequence whose
    // 0/negative indices blow up slice(). The `if` keeps short docs on
    // the empty-array branch wherever the expression lands in the plan;
    // the row filter below still prunes them early on the happy path.
    val spans = docsDf
      .withColumn("w", expr(
        s"filter(split($textCol, ' '), t -> t <> '')"))
      .filter(size(col("w")) >= window)
      .withColumn("hs", expr(
        s"""if(size(w) < $window, array(),
           | array_distinct(transform(sequence(1, size(w) - $window + 1),
           |  i -> xxhash64(concat_ws(' ', slice(w, i, $window))))))"""
          .stripMargin))
      .select(col(idCol), size(col("hs")).cast("long").as("n_spans"),
        explode(col("hs")).as("h"))
    // document frequency per span hash; spans in one doc only carry
    // no dedup signal and are dropped before the join back
    val shared = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select("h")
    spans.join(shared, Seq("h"))
      .groupBy(col(idCol))
      .agg(max(col("n_spans")).as("n_spans"),
        count(lit(1)).as("n_dup_spans"))
  }
}
