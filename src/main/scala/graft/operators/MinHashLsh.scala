package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable MinHash + banded-LSH machinery over any (id, text) frame —
  * the production near-dup join at corpus scale. Extracted from the
  * d3/d4 query path so pipelines can run the same signatures over
  * arbitrary (e.g. progressively filtered) document sets; the
  * TextDedupQueries oracles replay these exact constants.
  *
  * Contract: word 3-gram shingles over whitespace tokens, 60-bit md5
  * shingle hashes folded into the prime field P (md5 so any oracle
  * can replay bit-identically), 8 universal-hash permutations →
  * signature mh0..mh7, banded 4 × 2 for candidate generation.
  *
  * Scale shape: signatures are a pure narrow map (the shingle array
  * is hashed per doc and folded with array_min — zero shuffle);
  * candidate pairs group band buckets and generate in-bucket pairs —
  * never a self-join, never pairs². All window expressions are TOTAL
  * (explicit empty-array branches) so optimizer-inferred predicates
  * evaluated ahead of row filters cannot hit descending `sequence`.
  */
object MinHashLsh {

  /** The minhash prime field (also the shingle-hash modulus). */
  val P = 1000000007L

  /** 8 universal-hash permutations (a·h + b) % P; a,b < 2^27 so a·h
    * stays under 2^57 — no int64 overflow under ANSI mode. */
  val perms: Seq[(Long, Long)] = Seq(
    (73856093L, 19349663L), (83492791L, 29474327L),
    (15485863L, 32452843L), (49979687L, 67867967L),
    (23456789L, 98765431L), (54321893L, 12345701L),
    (28657L, 514229L), (433494437L, 39916801L))

  /** 60-bit stable hash of a string expression folded into P — md5
    * keeps Spark and any oracle bit-identical (both hash UTF-8). */
  def md5Hash(c: String): String =
    s"cast(conv(substr(md5($c), 1, 15), 16, 10) as bigint) % $P"

  /** Whitespace tokens, empties dropped. */
  def tokensSql(textCol: String): String =
    s"filter(split($textCol, ' '), t -> t <> '')"

  /** Per-doc frame (idCol, carry..., n, sh): distinct word 3-gram
    * shingles + their count. Docs under 3 tokens vanish. */
  def shingled(df: DataFrame, idCol: String, textCol: String,
    carry: Seq[String] = Nil): DataFrame =
    df.withColumn("w", expr(tokensSql(textCol)))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", expr(
        """if(size(w) < 3, array(),
          | array_distinct(transform(sequence(1, size(w) - 2),
          |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1),
          |              ' ', element_at(w, i + 2)))))""".stripMargin))
      .select(col(idCol) +: carry.map(col) :+
        size(col("sh")).cast("long").as("n") :+ col("sh"): _*)

  /** Per-doc hashed shingle array (idCol, carry..., hs: Array[Long]
    * folded into P) — the tokenize→shingle→md5 pass as a standalone
    * frame, so a caller that needs BOTH the signatures and the raw
    * shingle-hash index (d13's estimator eval) can persist this ONE
    * pass and derive each side narrowly instead of re-tokenizing and
    * re-hashing the corpus per consumer. */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String,
    carry: Seq[String] = Nil): DataFrame =
    shingled(df, idCol, textCol, carry)
      .withColumn("hs", expr(s"transform(sh, x -> ${md5Hash("x")})"))
      .select(col(idCol) +: carry.map(col) :+ col("hs"): _*)

  /** Per-doc minhash signature (idCol, carry..., mh0..mh7), fused into
    * a single narrow map: hash the shingle array once per doc, then 8
    * array_min folds — zero shuffle (vs. explode → groupBy(min), which
    * moves one row per shingle). The stacked projection keeps the md5
    * hash array from being inlined 8× (CollapseProject skips non-cheap
    * exprs). */
  def signatures(df: DataFrame, idCol: String, textCol: String,
    carry: Seq[String] = Nil): DataFrame =
    signaturesFromHashed(hashedShingles(df, idCol, textCol, carry),
      idCol, carry)

  /** [[signatures]] from an ALREADY-hashed shingle frame
    * ([[hashedShingles]]) — 8 array_min folds, zero shuffle. */
  def signaturesFromHashed(hashed: DataFrame, idCol: String,
    carry: Seq[String] = Nil): DataFrame = {
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      expr(s"array_min(transform(hs, h -> (h * ${a}L + ${b}L) % $P))")
        .as(s"mh$i")
    }
    hashed.select(col(idCol) +: carry.map(col) ++: mins: _*)
  }

  /** The 4-band × 2-key banding of a signature frame: one row per
    * (doc, band) with the band's two minhash values as bucket key. */
  def bands(sig: DataFrame, idCol: String, carry: Seq[String] = Nil)
    : DataFrame =
    sig.select(col(idCol) +: carry.map(col) :+ expr(
      """explode(array(
        | struct(0 as band, mh0 as k1, mh1 as k2),
        | struct(1 as band, mh2 as k1, mh3 as k2),
        | struct(2 as band, mh4 as k1, mh5 as k2),
        | struct(3 as band, mh6 as k1, mh7 as k2)))""".stripMargin)
      .as("b"): _*)
      .withColumn("band", col("b.band"))
      .withColumn("k1", col("b.k1"))
      .withColumn("k2", col("b.k2"))
      .drop("b")

  /** Ordered (a,b) pairs from a sorted in-bucket array — turns the
    * classic inverted-index SELF-JOIN into group + generate, so the
    * upstream pipeline (tokenize/shingle/hash) runs ONCE instead of
    * once per join side, and one shuffle disappears. Buckets are
    * small by construction (docs-per-shingle / band collisions), so
    * the quadratic is local and bounded. */
  def bucketPairs(xs: String): String =
    s"""if(size($xs) < 2, array(),
       | flatten(transform(sequence(1, size($xs) - 1),
       |  i -> transform(slice($xs, i + 1, size($xs) - i),
       |    y -> named_struct('a', element_at($xs, i), 'b', y)))))"""
      .stripMargin

  /** LSH candidate pairs (doc_a < doc_b, n_shared_bands): band-bucket
    * grouping + in-bucket pair generation over `df`'s documents. At
    * 100 TB this is THE dedup join — band-bucket cardinality scales
    * with the corpus, not pairs².
    *
    * `bucketCap` is the opt-in pair-blowup lever, the same dial as
    * `TextDedupQueries.simhashPairs` (whose r13 ladder showed the
    * shape: uncapped rows ×104.6 at a 10× near-dup-heavy corpus vs
    * ×1.53 capped): keep only the `cap` LOWEST doc ids per band
    * bucket — routed through the GroupedTopK heap, so the per-bucket
    * AGGREGATION BUFFER is bounded at cap entries, not just the pair
    * output at cap·(cap−1)/2. Deterministic (each doc appears once
    * per bucket; keep-lowest is a total order) but LOSSY: an evicted
    * doc can only pair via its other bands, and a surviving pair's
    * `n_shared_bands` counts only the buckets where BOTH survived.
    * Capped output pairs ⊆ uncapped pairs. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
    bucketCap: Option[Int] = None): DataFrame =
    candidatePairsFromSignatures(signatures(df, idCol, textCol), idCol,
      bucketCap)

  /** [[candidatePairs]] over an ALREADY-computed signature frame —
    * lets a caller persist ONE signature pass and share it between
    * the pair build and its own per-side signature joins (d13), so
    * the tokenize→shingle→md5 map is not re-derived per branch. */
  def candidatePairsFromSignatures(sig: DataFrame, idCol: String,
    bucketCap: Option[Int] = None): DataFrame = {
    bucketCap.foreach(c => require(c >= 2,
      s"bucketCap must be >= 2 to ever emit a pair, got $c"))
    val banded = bands(sig, idCol)
    val capped = bucketCap.fold(banded)(c =>
      graft.plans.GroupedTopK.topK(banded, Seq("band", "k1", "k2"),
        idCol, c, descending = false))
    capped.groupBy(col("band"), col("k1"), col("k2"))
      .agg(sort_array(collect_list(col(idCol))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(bucketPairs("xs"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }
}
