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
  * Plan shape (the round-7 rework): stages 1–4 are SURVIVAL FLAGS on
  * ONE frame, not five progressively filtered frames. Language and
  * quality are pure column predicates; decontamination is a left
  * join against the (small) contaminated-id set; exact dedup is a
  * conditional min window over sha256(text) — `min(CASE WHEN s3 THEN
  * doc_id END) OVER (PARTITION BY h)`, one shuffle, no groupBy+semi
  * join pair. The per-stage summary is then a SINGLE conditional
  * aggregation over that frame (stack-unpivoted to 6 rows) instead
  * of a 6-branch union that re-scanned every stage. Nothing runs at
  * query-construction time: the previous version's count-gated
  * broadcasts executed the full decontamination subtree twice before
  * the caller's first action — minutes of eager work that made the
  * whole harness time out; broadcast decisions now belong to AQE,
  * which sees actual shuffle sizes at runtime.
  *
  * Two frames are persisted (`Broadcasting.track` registry — call
  * `Broadcasting.releaseAll()` when done): `base` (feeds both the
  * contamination subtree and the flagged frame) and `flagged` (feeds
  * the LSH subtree, the summary, and the survivor output). Both have
  * ≥2 consumers; everything else is single-consumer and stays lazy.
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
    // language + quality signals + stage-1/2 flags in ONE narrow pass
    // over the corpus; score is if-guarded so a 0-token doc (always
    // 'und', dropped at stage 1) cannot divide by zero wherever the
    // optimizer floats the expression
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
      .withColumn("s1", col("predicted").isInCollection(cfg.langs))
      .withColumn("s2", col("s1") && col("score_e4") >= cfg.minScoreE4)
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"),
        col("s1"), col("s2")))

    val bench = docs.filter(col("source") === cfg.benchmarkSource)
      .select(col("doc_id"), col("text"))
    // contaminated ids among stage-2 survivors — small by nature
    // (that is the point of the check); the left join below is AQE
    // broadcast-converted at runtime
    val bad = Decontaminate.hits(base.filter(col("s2")), bench,
      "doc_id", "text", cfg.decontamN)
      .select(col("doc_id"), lit(true).as("contam"))
    // stage 3 (decontam) as a flag, then stage 4 (exact dedup) as a
    // conditional-min window: among same-sha256 docs that survived
    // stage 3, the lowest doc_id wins — one shuffle, no join
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"))
    val flagged = keep(base
      .join(bad, Seq("doc_id"), "left")
      .withColumn("s3", col("s2") && col("contam").isNull)
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("s4", col("s3") &&
        col("doc_id") ===
          min(when(col("s3"), col("doc_id"))).over(byHash))
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"),
        col("s1"), col("s2"), col("s3"), col("s4")))

    // stage 5: LSH keep-lowest over stage-4 survivors; losers is a
    // small distinct-id set consumed by both the summary and the
    // survivor output, so it is persisted too
    val losers = keep(
      MinHashLsh.candidatePairs(flagged.filter(col("s4")),
        "doc_id", "text")
        .select(col("doc_b").as("doc_id"), lit(true).as("loser"))
        .distinct())
    val fin = flagged.join(losers, Seq("doc_id"), "left")
      .withColumn("s5", col("s4") && col("loser").isNull)

    // per-stage summary in ONE conditional aggregation, unpivoted to
    // (stage, n_docs, n_tokens) — no 6-branch union re-scanning
    val stages = Seq(
      ("d0", "t0", lit(true)), ("d1", "t1", col("s1")),
      ("d2", "t2", col("s2")), ("d3", "t3", col("s3")),
      ("d4", "t4", col("s4")), ("d5", "t5", col("s5")))
    val aggs = stages.flatMap { case (d, t, p) => Seq(
      count(when(p, 1)).as(d),
      coalesce(sum(when(p, col("n_tok"))), lit(0L)).as(t)) }
    val stackSql = stages.zipWithIndex
      .map { case ((d, t, _), i) => s"bigint($i), $d, $t" }
      .mkString(s"stack(${stages.size}, ", ", ",
        ") as (stage, n_docs, n_tokens)")
    val summary = fin.agg(aggs.head, aggs.tail: _*).selectExpr(stackSql)
    (fin.filter(col("s5"))
      .select("doc_id", "source", "text", "n_tok"), summary)
  }
}
