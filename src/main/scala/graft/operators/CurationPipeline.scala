package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline — the composition a
  * pretraining data team actually ships, built from this library's
  * verified stages in their standard order:
  *
  *   0 raw corpus (benchmark source held out)
  *   1 language filter        (x3's marker-word predictor)
  *   2 quality filter         (x2's score ≥ threshold)
  *   3 benchmark decontamination (c2's exact n-gram overlap → drop)
  *   4 exact dedup            (d1/d7's min-id survivor per sha256)
  *   5 near-dup dedup         (d4/d7's LSH keep-lowest rule)
  *
  * Ordering rationale: the cheap narrow filters (1, 2) run first so
  * every later stage — especially the shuffling dedup joins — sees
  * the smallest possible corpus; near-dup LSH runs last because its
  * band-bucket shuffle is the most expensive stage. Greedy
  * keep-lowest (not transitive closure) for stage 5 — same contract
  * and caveats as d7; route through ConnectedComponents when group
  * closure matters.
  *
  * Stage frames are persisted (`Broadcasting.track` registry — call
  * `Broadcasting.releaseAll()` when done): each feeds both its
  * successor and the stage summary, and unpersisted each consumer
  * would recompute the whole prefix of the pipeline.
  *
  * Every predicate is a pure function of row content (scores,
  * hashes) — no RNG, no partition dependence — so the survivor set
  * is reproducible across runs, retries, and engines, and the whole
  * pipeline replays in the DuckDB oracle (c6_curation_pipeline).
  */
object CurationPipeline {

  /** `langs`: keep documents whose predicted language is in the set.
    * `minScoreE4`: x2-quality floor (e4-scaled). `decontamN`: n-gram
    * width for the benchmark-overlap check. `benchmarkSource`: the
    * held-out source treated as the eval set. */
  final case class Config(
    langs: Set[String] = Set("en"),
    minScoreE4: Long = 6000L,
    decontamN: Int = 4,
    benchmarkSource: String = "src0")

  /** x3's marker-word language predictor over token array `w`. */
  private val predictedSql =
    """CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
      | WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
      |  AND s_en >= s_zh THEN 'en'
      | WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
      | WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
      | WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END""".stripMargin

  /** Run the pipeline over a (doc_id, source, text) frame. Returns
    * (surviving documents, per-stage summary (stage, n_docs,
    * n_tokens)). Summary rows exist for every stage even when a
    * stage empties the corpus. */
  def run(docs: DataFrame, cfg: Config = Config())
    : (DataFrame, DataFrame) = {
    require(cfg.langs.nonEmpty, "langs must not be empty")
    require(cfg.decontamN >= 1, s"bad n-gram width ${cfg.decontamN}")
    def keep(df: DataFrame): DataFrame =
      Broadcasting.track(df.persist())

    val corpus = docs
      .filter(col("source") =!= cfg.benchmarkSource)
      .withColumn("w", expr(MinHashLsh.tokensSql("text")))
      .withColumn("n_tok", size(col("w")).cast("long"))
    // language + quality signals in ONE narrow pass over the corpus;
    // score is if-guarded so a 0-token doc (always 'und', dropped at
    // stage 1) cannot divide by zero wherever the optimizer floats
    // the expression
    val base = keep(corpus
      .withColumn("s_en", expr("size(filter(w, t -> t IN ('the', 'a')))"))
      .withColumn("s_es", expr("size(filter(w, t -> t IN ('el', 'la')))"))
      .withColumn("s_de", expr("size(filter(w, t -> t IN ('der', 'die')))"))
      .withColumn("s_fr", expr("size(filter(w, t -> t IN ('le', 'les')))"))
      .withColumn("s_zh", expr("size(filter(w, t -> t IN ('的')))"))
      .withColumn("predicted", expr(predictedSql))
      .withColumn("score_e4", expr(
        """if(n_tok = 0, 0L, cast(floor((
          |   0.5 * size(array_distinct(w)) / n_tok
          | + 0.3 * (1.0 - size(filter(w, t -> t IN ('the', 'a')))
          |          / cast(n_tok as double))
          | + 0.2 * least(1.0, n_tok / 100.0)) * 10000 + 0.5) as bigint))"""
          .stripMargin))
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"),
        col("predicted"), col("score_e4")))

    // k1/k2 are narrow filters over the CACHED base — re-running them
    // per consumer is a cache scan, so they are not persisted
    val k1 = base.filter(col("predicted").isInCollection(cfg.langs))
    val k2 = k1.filter(col("score_e4") >= cfg.minScoreE4)
    val bench = docs.filter(col("source") === cfg.benchmarkSource)
      .select(col("doc_id"), col("text"))
    val k3 = keep(Decontaminate.clean(k2, bench, "doc_id", "text",
      cfg.decontamN))
    val reps = k3.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val k4 = keep(k3.join(reps, Seq("doc_id"), "left_semi"))
    val losers = MinHashLsh.candidatePairs(k4, "doc_id", "text")
      .select(col("doc_b").as("doc_id")).distinct()
    val k5 = keep(k4.join(losers, Seq("doc_id"), "left_anti"))

    def stat(stage: Int, f: DataFrame): DataFrame =
      f.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
        .select(lit(stage.toLong).as("stage"), col("n_docs"),
          col("n_tokens"))
    val summary = Seq(base, k1, k2, k3, k4, k5).zipWithIndex
      .map { case (f, i) => stat(i, f) }
      .reduce(_ unionByName _)
    (k5.select("doc_id", "source", "text", "n_tok"), summary)
  }
}
