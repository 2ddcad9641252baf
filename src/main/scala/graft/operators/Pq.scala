package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the ANN compression workhorse beyond v6's
  * scalar int8: split each vector into `m` equal subvectors, learn a
  * small k-means codebook PER SUBSPACE, and store each vector as m
  * small codes (64-dim float32 → m bytes at k ≤ 256, a 256× cut at
  * m=8/k=256). Residual distances against the codebooks then
  * approximate full distances for coarse ANN search (the IVF-PQ
  * pairing; IvfIndex supplies the coarse stage here).
  *
  * INTEGER-EXACT like the rest of the v-family: subvectors quantize
  * e6 on ingest, codebooks come from [[KMeans.fitE6]] (deterministic
  * first-k-by-id seeding, integer centroid updates), and assignment
  * is the same min-(dist2, c) integer argmax — which is what lets a
  * LEARNED quantizer hash-match a DuckDB oracle of unrolled CTEs.
  *
  * Plan shape at 100 TB: per subspace, fitE6's iterations each cost
  * one corpus pass against k BROADCAST centroids (corpus × k
  * integer ops, the codegen'd `graft_l2sq` kernel), and the final
  * code assignment is one more such pass — m small independent
  * pipelines over a column slice, never a shuffle of the vectors
  * themselves; the only shuffles are the k-sized centroid updates
  * inside fitE6.
  */
object Pq {

  /** The ONE quantized corpus pass every Pq entry point persists and
    * shares (tracked — `Broadcasting.releaseAll()` reclaims): before
    * this seam existed, each subspace fit / code assignment / LUT /
    * coarse stage re-derived scan→quantize from the raw frame — 24–52
    * source scans per query in the v11–v15 plans; now each is a cache
    * read. Same integers: quantization is elementwise, so slicing the
    * quantized full vector equals quantizing the float slice. */
  private def quantizedFull(emb: DataFrame): DataFrame =
    Broadcasting.track(Caching.persistCorpus(KMeans.quantizeE6(emb)))

  /** The persisted quantized pass as a PUBLIC frame (vec_id, v:
    * Array[Long] e6) — for callers that need the e6 vectors
    * THEMSELVES beside a PQ search (the v12/v14/v15 recall evals'
    * exact ground-truth side), so query and index share ONE corpus
    * quantization instead of each deriving their own. Tracked:
    * `Broadcasting.releaseAll()` reclaims it. */
  def quantized(emb: DataFrame): DataFrame = quantizedFull(emb)

  /** One subspace's machinery over the SHARED quantized frame:
    * (e6 subvectors as `v`, LOCALIZED codebook (c, cv, cnt), assigned
    * codes (vec_id, m, code, dist2)). Code assignment is the same
    * narrow argmin map the fit itself uses (KMeans.argminStruct — the
    * identical min-(dist2, c) tie rule), so it no longer costs a
    * corpus-sized crossJoin+groupBy(vec_id) shuffle per subspace. */
  private def subspace(v6full: DataFrame, m: Int, k: Int, iters: Int,
    i: Int): (DataFrame, Seq[KMeans.CentroidE6], DataFrame) = {
    val guarded = v6full.withColumn("_dim",
      when(size(col("v")) % m =!= 0, raise_error(lit(
        s"Pq: embedding length must be divisible by m=$m")))
        .otherwise(size(col("v")) / m))
    val v6 = guarded.select(col("vec_id"),
      expr(s"slice(v, _dim * $i + 1, _dim)").as("v"))
    val cent = KMeans.fitE6Local(v6, k, iters)
    val codes =
      if (cent.isEmpty) // empty corpus: no codebook, no codes
        v6.select(col("vec_id"), lit(i.toLong).as("m"),
          lit(null).cast("long").as("code"),
          lit(null).cast("long").as("dist2")).filter(lit(false))
      else {
        val best = KMeans.argminStruct(col("v"), cent)
        v6.select(col("vec_id"), lit(i.toLong).as("m"),
          best.getField("c").as("code"),
          best.getField("dist2").as("dist2"))
      }
    (v6, cent, codes)
  }

  /** Codes for every vector: (vec_id, m, code, dist2) — one row per
    * (vector, subspace), `dist2` the e6² integer residual to the
    * assigned codeword. `embedding` must have length divisible by
    * `m` (checked per row). */
  def codes(emb: DataFrame, m: Int, k: Int, iters: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    graft.expressions.GraftFunctions.register(emb.sparkSession)
    val v6full = quantizedFull(emb)
    (0 until m).map(subspace(v6full, m, k, iters, _)._3)
      .reduce(_ unionByName _)
  }

  /** Asymmetric-distance top-N search over the PQ codes — how a
    * compressed index answers a query without decompressing anything:
    * per subspace, ONE k-row lookup table of exact query-to-codeword
    * distances (the "asymmetric" part: the query stays full
    * precision, only the corpus side is quantized), then every
    * vector's approximate distance is m table lookups summed. Plan:
    * the LUT is a k-row broadcast; codes join it broadcast-side and
    * partial-agg the per-vector sum; the final top-N is a
    * TakeOrdered, never a global sort. All integer → oracle-exact.
    *
    * Returns (vec_id, adc_dist2) for the `topN` nearest by
    * (approximate distance, vec_id). A `queryVecId` absent from
    * `emb` yields an EMPTY frame (its LUT has no rows) — checked
    * lazily, since an eager existence probe would cost a corpus
    * action during plan construction. */
  def adcTopK(emb: DataFrame, m: Int, k: Int, iters: Int,
    queryVecId: Long, topN: Int): DataFrame =
    adcTopKQuantized(quantizedFull(emb), m, k, iters, queryVecId, topN)

  /** [[adcTopK]] over an already-[[quantized]] frame. */
  def adcTopKQuantized(v6full: DataFrame, m: Int, k: Int, iters: Int,
    queryVecId: Long, topN: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(v6full.sparkSession)
    adcCore(v6full, m, k, iters, queryVecId, topN, candidates = None)
  }

  /** IVF-PQ — the production ANN search shape the two operators were
    * built for: a COARSE quantizer (full-vector k-means, `coarseK`
    * cells) narrows the corpus to the `nProbe` cells nearest the
    * query, and the ADC machinery re-ranks only those candidates
    * against the PQ codebooks. Same integer-e6 discipline end to end
    * (coarse stage included — [[KMeans.fitE6]]), so the composed
    * pipeline still hash-matches a DuckDB CTE oracle.
    *
    * Plan shape at 100 TB: the coarse centroids are a `coarseK`-row
    * broadcast; cell assignment is one narrow argmin pass (partial
    * agg, one corpus-row shuffle); the probe's cell list is an
    * `nProbe`-row broadcast semi-joined against the assignment, so
    * the ADC stage scans ~nProbe/coarseK of the corpus. PQ codebooks
    * are trained on the RAW vectors (the simple IVF-PQ variant;
    * residual-trained codebooks are a quality refinement, not a plan
    * change). In a persisted deployment the codes live bucketed by
    * cell, making the candidate restriction a partition prune instead
    * of this semi-join. */
  def ivfAdcTopK(emb: DataFrame, coarseK: Int, nProbe: Int, m: Int,
    k: Int, iters: Int, queryVecId: Long, topN: Int): DataFrame =
    // ONE persisted quantized pass shared by coarse fit, cell
    // assignment, query vector, and the ADC stage's subspace fits
    ivfAdcTopKQuantized(quantizedFull(emb), coarseK, nProbe, m, k,
      iters, queryVecId, topN)

  /** [[ivfAdcTopK]] over an already-[[quantized]] frame. */
  def ivfAdcTopKQuantized(v6: DataFrame, coarseK: Int, nProbe: Int,
    m: Int, k: Int, iters: Int, queryVecId: Long, topN: Int)
    : DataFrame = {
    require(coarseK >= 1 && nProbe >= 1,
      s"coarseK/nProbe must be >= 1: $coarseK/$nProbe")
    graft.expressions.GraftFunctions.register(v6.sparkSession)
    val coarse = KMeans.fitE6Local(v6, coarseK, iters)
    if (coarse.isEmpty) // empty corpus: nothing to probe or rank
      return v6.select(col("vec_id"),
        lit(null).cast("long").as("adc_dist2")).filter(lit(false))
    // cell assignment: the same narrow argmin map as the fit — the
    // old crossJoin(broadcast)+groupBy(vec_id) corpus shuffle is gone
    val cells = v6.select(col("vec_id"),
      KMeans.argminStruct(col("v"), coarse).getField("c").as("cell"))
    val qv = v6.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"))
    val probed = KMeans.centroidsDf(v6.sparkSession, coarse)
      .select(col("c").as("cell"), col("cv"))
      .crossJoin(broadcast(qv))
      .withColumn("qd", expr("graft_l2sq(qv, cv)"))
      .orderBy(col("qd"), col("cell"))
      .limit(nProbe)
      .select("cell")
    val cands = cells.join(broadcast(probed), Seq("cell"), "left_semi")
      .select("vec_id")
    adcCore(v6, m, k, iters, queryVecId, topN, candidates = Some(cands))
  }

  /** Shared ADC engine: optionally restricted to `candidates`
    * (vec_id) — the IVF-probed subset — via a left-semi join applied
    * to the codes BEFORE the LUT join, so pruned vectors never cost
    * a lookup. */
  private def adcCore(v6full: DataFrame, m: Int, k: Int, iters: Int,
    queryVecId: Long, topN: Int,
    candidates: Option[DataFrame]): DataFrame = {
    require(m >= 1 && topN >= 1, s"m/topN must be >= 1: $m/$topN")
    graft.expressions.GraftFunctions.register(v6full.sparkSession)
    val parts = (0 until m).map { i =>
      val (v6, cent, codes) = subspace(v6full, m, k, iters, i)
      val kept = candidates.fold(codes)(c =>
        codes.join(c, Seq("vec_id"), "left_semi"))
      val qv = v6.filter(col("vec_id") === queryVecId)
        .select(col("v").as("qv"))
      val lut = KMeans.centroidsDf(v6full.sparkSession, cent)
        .select(col("c"), col("cv"))
        .crossJoin(broadcast(qv))
        .select(col("c"), expr("graft_l2sq(qv, cv)").as("qd"))
      kept.join(broadcast(lut), kept("code") === lut("c"))
        .select(kept("vec_id"), col("qd"))
    }
    parts.reduce(_ unionByName _)
      .groupBy("vec_id")
      .agg(sum("qd").as("adc_dist2"))
      .orderBy(col("adc_dist2"), col("vec_id"))
      .limit(topN)
  }
}
