package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * share word n-grams with an evaluation/benchmark set — the overlap
  * check every serious pre-training pipeline runs so test questions
  * don't leak into the training corpus.
  *
  * Shape at 100 TB: the benchmark side is SMALL BY NATURE (eval sets
  * are thousands of documents, not billions), so its distinct n-gram
  * set broadcasts — the corpus side is a scan → narrow n-gram
  * explode → broadcast-hash semi match → per-doc count. One shuffle
  * (the per-doc aggregation, map-side combinable), nothing driver-
  * side, corpus never self-joins. The broadcast is size-gated
  * (`Broadcasting.maybeBroadcast`): an unexpectedly huge benchmark
  * degrades to a shuffle join instead of OOMing the driver.
  *
  * n-grams are hashed (xxhash64) before the join: the match moves
  * 8-byte keys, not n-word strings. A 64-bit collision can flag one
  * extra doc (~2^-64 per pair) — fine for a contamination FILTER;
  * callers needing exact audit trails join on the raw n-gram.
  */
object Decontaminate {

  /** Distinct word `n`-grams of `textCol`, one row per (id, gram
    * hash). Tokens are whitespace words, empties dropped. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
    n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // total expression: the join on `gh` infers isnotnull over this
    // subtree and may evaluate it BEFORE the row filter below —
    // sequence(1, stop < 1) DESCENDS through 0 and blows up slice(),
    // so short docs must take the empty-array branch explicitly
    // (same hazard class as SpanDedup; found live there)
    val grams =
      s"""if(size(w) < $n, array(),
         | array_distinct(transform(sequence(1, size(w) - ${n - 1}),
         |  i -> concat_ws(' ', slice(w, i, $n)))))""".stripMargin
    df.withColumn("w", expr(MinHashLsh.tokensSql(textCol)))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(expr(grams)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gh"))
  }

  /** Per-corpus-doc contamination hits: (idCol, n_hits) for every
    * corpus doc sharing at least one n-gram with the benchmark.
    * n_hits counts DISTINCT shared n-grams.
    *
    * The benchmark gram set is a DERIVED frame (explode + distinct)
    * whose Catalyst byte estimate lies, so no broadcast hint is
    * forced here: the distinct is a shuffle stage, and AQE sees its
    * ACTUAL output size at runtime and converts the join to a
    * broadcast-hash join when the gram set is genuinely small — the
    * same decision an eager count-probe would make, without running
    * the subtree at query-CONSTRUCTION time (the round-7 harness
    * killer: every probe executed the full tokenize→gram→distinct
    * pipeline before the caller's own action even started). */
  def hits(corpus: DataFrame, benchmark: DataFrame, idCol: String,
    textCol: String, n: Int): DataFrame = {
    val benchGrams = gramHashes(benchmark, idCol, textCol, n)
      .select("gh").distinct()
    gramHashes(corpus, idCol, textCol, n)
      .join(benchGrams, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The clean corpus: every document with zero benchmark overlap.
    * Contaminated ids are tiny relative to the corpus (that is the
    * point of the check); they come out of `hits`' aggregation, so
    * AQE broadcast-converts the anti join at runtime — again no
    * eager probe, the whole thing stays one lazy plan. */
  def clean(corpus: DataFrame, benchmark: DataFrame, idCol: String,
    textCol: String, n: Int): DataFrame = {
    val bad = hits(corpus, benchmark, idCol, textCol, n).select(idCol)
    corpus.join(bad, Seq(idCol), "left_anti")
  }
}
