package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring (token-window) duplication detection — the
  * distributed approximation of suffix-array exact-substring dedup
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"): a document sharing any `window`-token span with another
  * document is flagged, with the count of such spans as the signal a
  * span-removal pass would act on.
  *
  * Plan (100 TB shape): tokenize → explode a CHEAP guarded position
  * sequence → ONE xxhash64 per window position above the generator →
  * document-frequency count per span hash (count_distinct folds
  * within-doc repeats) → join back on the 8-byte hash → per-doc
  * aggregate. An inverted index on span hashes, exactly the d2
  * shingle-index shape: cost scales with corpus × windows-per-doc,
  * never with document pairs² — a span shared by B documents costs B
  * index rows, NOT B²/2 pairs, because the operator counts duplicated
  * spans per document instead of generating pairs.
  *
  * Why positions explode before hashing (load-bearing, measured 6×):
  * exploding a per-doc ARRAY of window hashes puts the expensive
  * expression into the generator's child, and Catalyst's
  * InferFiltersFromGenerate clones it into a `size(..) > 0 AND
  * isnotnull(..)` predicate that whole-stage evaluates the full array
  * TWICE more per input row (and inlines the tokenizer six times).
  * With the generator child a guarded `sequence(...)` the inferred
  * filter costs integer arithmetic, and each window is hashed exactly
  * once, per exploded row. The sequence guard is also a correctness
  * guard: `sequence(1, stop < 1)` DESCENDS through 0, and those
  * inferred filters run BEFORE the row-count filter, so short docs
  * must take the empty-array branch explicitly.
  *
  * The position frame feeds two consumers (the frequency count and
  * the join-back), so it is persisted (`Broadcasting.track` registry
  * — call `Broadcasting.releaseAll()` when done, same contract as
  * TfIdf/ConnectedComponents); unpersisted it would re-tokenize and
  * re-hash the corpus once per consumer.
  *
  * Exactness: two different spans hashing to one xxhash64 value
  * (~2^-64) could over-count; the same accepted trade as
  * Decontaminate's gram hashing (CurationQueries c2).
  */
object SpanDedup {

  /** Per-document duplicated-span counts: (idCol, n_dup_spans) for
    * every document whose text shares ≥ 1 distinct `window`-token
    * span with at least one OTHER document. A span repeated only
    * within a single document does not count; documents shorter than
    * `window` tokens have no spans and never appear. */
  def dupSpanCounts(docsDf: DataFrame, idCol: String, textCol: String,
    window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val positions = docsDf
      .withColumn("w", expr(MinHashLsh.tokensSql(textCol)))
      .filter(size(col("w")) >= window)
      .select(col(idCol), col("w"), explode(expr(
        s"""if(size(w) < $window, array(),
           |  sequence(1, size(w) - $window + 1))""".stripMargin))
        .as("i"))
      .select(col(idCol),
        xxhash64(expr(s"concat_ws(' ', slice(w, i, $window))")).as("h"))
    val spans = Broadcasting.track(positions.persist())
    // document frequency per span hash; spans in one doc only carry
    // no dedup signal and are dropped before the join back
    val shared = spans.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("df"))
      .filter(col("df") >= 2)
      .select("h")
    spans.join(shared, Seq("h"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("h")).as("n_dup_spans"))
  }
}
