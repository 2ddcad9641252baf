package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (the tokenizer-training
  * counterpart of x5's tokenizer APPLICATION): per round, count
  * adjacent symbol pairs over the whole corpus, learn the most
  * frequent pair (ties: cnt desc, a asc, b asc — deterministic end to
  * end), merge it greedily left-to-right in every word, recount.
  *
  * The round-N merge pair can name symbols PRODUCED by earlier rounds
  * (multi-char), so "apply the merge" cannot be a substring replace on
  * the raw word — `ma||mb` may straddle a symbol boundary ("abc" as
  * [a,bc] must NOT match pair (ab,c)). Instead every word is encoded
  * ONCE as a boundary-delimited symbol string
  *
  *   \u0001\u0001 sym1 \u0001\u0001 sym2 \u0001\u0001 … symN \u0001\u0001
  *
  * and the greedy merge of (a,b) is ONE codegen'd literal replace:
  *
  *   replace(enc, S·a·SS·b·S,  S·ab·S)        (S = \u0001, SS = S·S)
  *
  * Why this is exactly the greedy left-to-right merge:
  *  - ALIGNMENT: symbols contain no \u0001, so the only SS runs in the
  *    encoding are boundaries; the pattern's inner SS must land on one,
  *    which forces `a` and `b` to be WHOLE adjacent symbols (the S
  *    before `a` / after `b` are the inner halves of their outer
  *    boundaries). No cross-boundary or partial-symbol match exists.
  *  - GREEDY + OVERLAP: `replace` scans left-to-right, non-overlapping.
  *    A match consumes only the INNER S of each outer boundary, so the
  *    next adjacent pair's leading S survives ([a,b,a,b] with (a,b) →
  *    [ab,ab]) while a run sharing the middle symbol does not
  *    ([a,a,a] with (a,a) → [aa,a]) — precisely BPE's semantics.
  * `BpeMergesSpec` pins the equivalence against a straight-line Scala
  * fold, multi-char pairs included.
  *
  * Scale shape: ONE corpus-sized shuffle total — the collapse to the
  * distinct-word-type dictionary with instance counts (what every BPE
  * trainer keeps). Each round then runs over word TYPES only
  * (Zipf-bounded, orders of magnitude below corpus cardinality at any
  * scale): a weighted pair-count shuffle (vocab²-bounded output), a
  * 1-row broadcast, a NARROW codegen'd replace. Nothing is quadratic
  * and nothing returns to the driver but the top-k report.
  *
  * Contract: symbols must not contain U+0001 (true for any text
  * tokenizer; the encoder does not re-check per row).
  */
object BpeMerges {
  private val S = "\u0001"
  private val SS = S + S

  /** Word → boundary-encoded single-char symbol string: SS between
    * (and around) every char. Codegen'd: one regexp_replace appending
    * SS to each char, one concat for the leading boundary. */
  def encode(word: Column): Column =
    concat(lit(SS), regexp_replace(word, "(?s).", "$0" + SS))

  /** Encoded string → symbol array. `split` on the boundary yields
    * exactly one leading and one trailing empty string — slice them
    * off rather than filter (keeps the lambda-free codegen path). */
  def symbols(enc: Column): Column = {
    val sp = split(enc, SS)
    slice(sp, lit(2), size(sp) - 2)
  }

  /** Greedy left-to-right merge of pair (a, b) on the encoding — the
    * single literal replace proven in the object scaladoc. */
  def applyMerge(enc: Column, a: Column, b: Column): Column =
    replace(enc,
      concat(lit(S), a, lit(SS), b, lit(S)),
      concat(lit(S), a, b, lit(S)))

  /** WEIGHTED adjacent-pair counts over (encoded word TYPE, weight):
    * pair instances = sum of word-type weights. All codegen'd — the
    * pair list is arrays_zip of two slices, not a lambda (HOF lambdas
    * evaluate interpreted per element; this is the hot loop). Output
    * cardinality is bounded by the symbol vocabulary squared. */
  def pairCounts(enc: DataFrame, encCol: String = "enc",
    weightCol: String = "wcnt"): DataFrame =
    enc.select(col(weightCol), symbols(col(encCol)).as("s"))
      .filter(size(col("s")) >= 2)
      .withColumn("l", slice(col("s"), lit(1), size(col("s")) - 1))
      .withColumn("r", slice(col("s"), lit(2), size(col("s")) - 1))
      .select(col(weightCol),
        explode(arrays_zip(col("l"), col("r"))).as("p"))
      .select(col("p.l").as("a"), col("p.r").as("b"), col(weightCol))
      .groupBy(col("a"), col("b"))
      .agg(sum(col(weightCol)).as("cnt"))

  /** `rounds` rounds of induction over `words(wordCol)`; returns the
    * report frame (round, rnk, a, b, cnt) — top `topK` pairs per
    * round, rnk by (cnt desc, a, b).
    *
    * The corpus is collapsed ONCE to distinct word types with
    * instance counts (the dictionary every BPE trainer keeps): that
    * one corpus-sized shuffle is the only place data volume appears.
    * Every round after it runs over the WORD-TYPE table — Zipf keeps
    * its cardinality orders of magnitude below the corpus at any
    * scale — with pair counts weighted by type frequency (identical
    * totals to instance counting). Per-round pair counts are persisted
    * (tiny) because each feeds BOTH its report rows and the next
    * round's learned merge. */
  def learn(words: DataFrame, wordCol: String, rounds: Int,
    topK: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = Window.partitionBy(lit(1)) // topK-row frames post-limit
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
    def top(pc: DataFrame, k: Int): DataFrame = pc
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(k)
    def ranked(pc: DataFrame, round: Int): DataFrame =
      top(pc, topK).withColumn("round", lit(round.toLong))
        .withColumn("rnk", row_number().over(w).cast("long"))
    val wordCounts = Broadcasting.track(words
      .groupBy(col(wordCol)).agg(count(lit(1)).as("wcnt"))
      .persist())
    // NOT persisted per round (r22 A/B): caching each round's encoded
    // dictionary was measured a wash-to-loss at sf0.1 — the re-derived
    // encode+replace passes run over the Zipf-bounded word-TYPE
    // dictionary (cheap), while the columnar cache build of the
    // boundary-encoded strings costs a comparable pass of its own.
    var enc = wordCounts
      .select(encode(col(wordCol)).as("enc"), col("wcnt"))
    var reports = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val pc = Broadcasting.track(pairCounts(enc).persist())
      reports :+= ranked(pc, r)
      if (r < rounds)
        enc = enc.crossJoin(broadcast(top(pc, 1)
            .select(col("a").as("ma"), col("b").as("mb"))))
          .select(applyMerge(col("enc"), col("ma"), col("mb")).as("enc"),
            col("wcnt"))
    }
    reports.reduce(_.unionByName(_))
      .select(col("round"), col("rnk"), col("a"), col("b"), col("cnt"))
      .orderBy("round", "rnk")
  }

  /** TOKENIZE with the learned vocabulary: the word-type dictionary
    * after `nMerges` greedy merges, as a LAZY (enc, wcnt) frame —
    * learning and application in one plan (chain `symbols(col("enc"))`
    * to read the token arrays; weight per-instance stats by `wcnt`).
    * Merge selection replays learn()'s exact tie-break, so
    * applied(n) is the corpus state learn() sees at round n+1. */
  def applied(words: DataFrame, wordCol: String,
    nMerges: Int): DataFrame = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    def top1(pc: DataFrame): DataFrame = pc
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
    var enc = Broadcasting.track(words
        .groupBy(col(wordCol)).agg(count(lit(1)).as("wcnt"))
        .persist())
      .select(encode(col(wordCol)).as("enc"), col("wcnt"))
    // intermediates NOT persisted (same r22 A/B note as learn()); the
    // FINAL enc persists below — it is the caller's tokenized
    // dictionary, typically read by more than one consumer (x17's
    // stats + vocab aggregates re-derived the whole encode+merge
    // chain per consumer before this).
    for (_ <- 1 to nMerges) {
      val pc = Broadcasting.track(pairCounts(enc).persist())
      enc = enc.crossJoin(broadcast(top1(pc)
          .select(col("a").as("ma"), col("b").as("mb"))))
        .select(applyMerge(col("enc"), col("ma"), col("mb")).as("enc"),
          col("wcnt"))
    }
    Broadcasting.track(enc.persist())
  }
}
