package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor / similarity operators over the
  * `embeddings` table (Array[Float] vectors).
  *
  * Float discipline: all vector math is promoted element-wise to DOUBLE
  * and folded left-to-right, in exactly the order the DuckDB oracle
  * folds, so cosine values are bit-identical across engines; only the
  * half-up-scaled integer `cos_e6` reaches the output schema.
  *
  * Scale notes (100 TB):
  *  - v1 brute-force broadcasts the (small) probe set against the full
  *    corpus — the exact baseline; linear in corpus size, no shuffle of
  *    the big side.
  *  - v2 is the scale path: random-hyperplane LSH signatures (computed
  *    in one narrow pass), candidate generation via band-bucket
  *    equi-joins (shuffle keyed by band value, never pairs²), exact
  *    re-rank only on candidates.
  *  - v3 exact all-pairs is quadratic by construction — kept as the
  *    verification baseline; production near-dup goes through v2/d4.
  */
object SimilarityQueries {
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Per-vector L2 norm via the codegen'd graft_dot kernel
    * (graft.expressions.DotProductDouble): same promote-to-double,
    * index-order fold as the HOF spelling and the DuckDB oracle, but
    * a tight generated loop instead of interpreted lambdas. */
  private val normSql = "sqrt(graft_dot(embedding, embedding))"

  /** Pairwise dot of `l`/`r` embedding cols (double, list order). */
  private def dotSql(l: String, r: String) = s"graft_dot($l, $r)"

  private def withGraftFns(s: SparkSession): Unit =
    graft.expressions.GraftFunctions.register(s)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", expr(normSql))

  /** Deterministic "random" hyperplanes: 8 planes × 64 dims, entries in
    * [-1000, 1000] derived from md5(pid_i) — reproducible in any engine
    * with an md5. Data-independent, so at scale this is a broadcast of
    * 8 tiny arrays, and the signature pass is a narrow map. */
  private def planes(s: SparkSession): DataFrame =
    s.range(0, 8).select(col("id").cast("int").as("pid"), expr(
      """transform(sequence(0, 63),
        | i -> cast(conv(substr(md5(concat(cast(id as string), '_',
        |        cast(i as string))), 1, 8), 16, 10) as bigint)
        |      % 2001 - 1000)""".stripMargin).as("plane"))

  /** LSH signature per vector: two 4-bit bands from the sign pattern of
    * 8 hyperplane projections. */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesDf(s, emb(s, dir))

  private[graft] def signaturesDf(s: SparkSession,
    embDf: DataFrame): DataFrame =
    embDf
      .crossJoin(broadcast(planes(s)))
      .withColumn("dotp", expr(dotSql("embedding", "plane")))
      .groupBy(col("vec_id"))
      .agg(
        sum(expr("""CASE WHEN pid < 4 AND dotp > 0
              | THEN shiftleft(cast(1 as bigint), 3 - pid) ELSE 0L END"""
          .stripMargin)).as("band0"),
        sum(expr("""CASE WHEN pid >= 4 AND dotp > 0
              | THEN shiftleft(cast(1 as bigint), 7 - pid) ELSE 0L END"""
          .stripMargin)).as("band1"))

  /** Exact cos_e6 for a (probe_id, nbr_id) pair frame carrying pe/ne
    * embeddings and pn/nn norms. */
  private def scorePairs(df: DataFrame): DataFrame =
    df.withColumn("dot", expr(dotSql("pe", "ne")))
      .withColumn("cos_e6", expr(
        "cast(floor(dot / (pn * nn) * 1000000 + 0.5) as bigint)"))

  private def topK(df: DataFrame, k: Int): DataFrame = {
    // grouped top-k through the custom heap operator instead of a
    // row_number window: per-probe candidate lists are corpus-sized,
    // and the window spelling SORTS each in full — the heap keeps k.
    // (cos desc, nbr asc) rides a STRUCT order key (field-wise
    // compare, unique so ties cannot straddle the k boundary) rather
    // than int64 bit-packing: the packing assumed nbr_id < 2^32 and a
    // corpus-scale id would have borrowed into the cos_e6 high bits,
    // silently corrupting the ranking. -nbr_id under DESC = nbr asc.
    val ranked = graft.plans.GroupedTopK.rankedTopK(
      df.withColumn("rank_v",
        struct(col("cos_e6"), (-col("nbr_id")).as("nbr_neg"))),
      Seq("probe_id"), "rank_v", k)
    ranked.select("probe_id", "rnk", "nbr_id", "cos_e6")
      .orderBy("probe_id", "rnk")
  }

  /** Exact integer-L2 top-`n` ids for `queryVecId` over e6 vectors —
    * the shared ground-truth block of v12/v14. `v6` comes from
    * `Pq.quantized` (r21): ONE quantization definition for both the
    * index and the ground truth, so a quantization tweak cannot
    * silently split the evals onto different scales — and the evals
    * share the index's persisted pass instead of re-deriving it. */
  private def exactTopIds(v6: DataFrame, queryVecId: Long,
    n: Int): DataFrame = {
    val q = v6.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"))
    v6.crossJoin(broadcast(q))
      .withColumn("d", expr("graft_l2sq(v, qv)"))
      .orderBy(col("d"), col("vec_id")).limit(n)
      .select("vec_id")
  }

  private def knnBrute(s: SparkSession, dir: String): DataFrame =
    knnBruteDf(s, emb(s, dir), probeMax = 10, k = 3)

  /** Exact cosine top-`k` per probe (vec_id < probeMax) — the ground
    * truth every recall eval ranks against. DataFrame-parameterized so
    * the clustered-fixture evals (ClusteredRecallSpec) reuse the exact
    * machinery the oracle queries run. */
  private[graft] def knnBruteDf(s: SparkSession, embDf: DataFrame,
    probeMax: Long, k: Int): DataFrame = {
    withGraftFns(s)
    val e = withNorm(embDf)
    val p = e.select(col("vec_id").as("probe_id"),
      col("embedding").as("pe"), col("nrm").as("pn"))
      .filter(col("probe_id") < probeMax)
    val c = e.select(col("vec_id").as("nbr_id"),
      col("embedding").as("ne"), col("nrm").as("nn"))
    topK(scorePairs(broadcast(p).join(c, col("probe_id") =!= col("nbr_id"))), k)
  }

  private def knnLsh(s: SparkSession, dir: String): DataFrame =
    knnLshDf(s, emb(s, dir), probeMax = 10, k = 3)

  private[graft] def knnLshDf(s: SparkSession, embDf: DataFrame,
    probeMax: Long, k: Int): DataFrame = {
    withGraftFns(s)
    val sig = signaturesDf(s, embDf)
    val probes = sig.filter(col("vec_id") < probeMax)
      .select(col("vec_id").as("probe_id"), col("band0").as("pb0"),
        col("band1").as("pb1"))
    val cands = sig.select(col("vec_id").as("nbr_id"), col("band0"),
      col("band1"))
    val c0 = broadcast(probes).join(cands, col("pb0") === col("band0"))
      .select("probe_id", "nbr_id")
    val c1 = broadcast(probes).join(cands, col("pb1") === col("band1"))
      .select("probe_id", "nbr_id")
    val pairs = c0.union(c1).filter(col("probe_id") =!= col("nbr_id"))
      .distinct()
    val e = withNorm(embDf)
    val scored = scorePairs(pairs
      .join(e.select(col("vec_id").as("probe_id"),
        col("embedding").as("pe"), col("nrm").as("pn")), Seq("probe_id"))
      .join(e.select(col("vec_id").as("nbr_id"),
        col("embedding").as("ne"), col("nrm").as("nn")), Seq("nbr_id")))
    topK(scored, k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact top-3 cosine for probe set vec_id < 10: broadcast
    // nested-loop of the tiny probe side against the full corpus.
    "v1_knn_brute" -> ((s, dir) => knnBrute(s, dir)),

    // LSH-bucketed ANN: candidates share ≥1 signature band with the
    // probe; exact cosine re-rank on candidates only.
    "v2_knn_lsh" -> ((s, dir) => knnLsh(s, dir)),

    // ANN EVALUATION: recall@3 of the LSH index against the brute
    // ground truth, per probe — the eval harness every ANN rollout
    // needs, as a first-class oracle-checked query (both pipelines
    // recompute here; production persists the ground-truth set).
    "v9_ann_recall" -> ((s, dir) => {
      val b = knnBrute(s, dir).select(col("probe_id"), col("nbr_id"))
      val l = knnLsh(s, dir).select(col("probe_id").as("lp"),
        col("nbr_id").as("lnbr"))
      val hits = b.join(l, col("probe_id") === col("lp") &&
          col("nbr_id") === col("lnbr"))
        .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
      b.select("probe_id").distinct()
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          floor(coalesce(col("n_hits"), lit(0L)) * 10000.0 / 3 + 0.5)
            .cast("long").as("recall_e4"))
        .orderBy("probe_id")
    }),

    // IVF index end-to-end with exhaustive probing (nProbe = k): the
    // coarse quantizer, cluster assignment, and probe machinery all
    // execute, and the result must equal brute-force exactly — so the
    // ORACLE IS THE BRUTE-FORCE SQL. (Recall at nProbe < k is pinned
    // by IvfIndexSpec; production tunes nProbe for the recall/cost
    // trade.)
    "v4_knn_ivf" -> ((s, dir) => {
      withGraftFns(s)
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val centroids = IvfIndex.buildCentroids(e, k = 8, iters = 2)
      val index = IvfIndex.build(e, centroids)
      IvfIndex.search(index, centroids,
        e.filter(col("vec_id") < 10), nProbe = 8, topK = 3)
    }),

    // Exact all-pairs near-dup at cosine ≥ 0.4 — quadratic verification
    // baseline for the LSH path (production dedup uses v2/d4 banding).
    "v3_cos_neardup" -> ((s, dir) =>
      cosNearDupPairs(s, emb(s, dir), blocks = 8)),

    // Semantic dedup (the SemDeDup shape): embedding near-dup pairs
    // from hyperplane-LSH band buckets, exact-cosine verified, then
    // the keep-lowest drop rule — output is each dropped vector with
    // its triggering-pair count. Bucket-group + in-bucket pair
    // generation (the d4 pattern), never an all-pairs join; with 8
    // planes the band space is 16 values (toy density for the sf
    // corpus) — production raises the plane count so bucket sizes
    // stay bounded as the corpus grows, same knob as d4's bands.
    "v7_semantic_dedup" -> ((s, dir) => {
      withGraftFns(s)
      val banded = signatures(s, dir).select(col("vec_id"), expr(
        """explode(array(struct(0 as bi, band0 as bv),
          |               struct(1 as bi, band1 as bv)))""".stripMargin)
        .as("b"))
        .select(col("vec_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val pairs = banded.groupBy(col("bi"), col("bv"))
        .agg(sort_array(collect_list(col("vec_id"))).as("xs"))
        .filter(size(col("xs")) >= 2)
        .select(explode(expr(MinHashLsh.bucketPairs("xs"))).as("p"))
        .select(col("p.a").as("va"), col("p.b").as("vb"))
        .distinct()
      val e = withNorm(emb(s, dir))
      pairs
        .join(e.select(col("vec_id").as("va"), col("embedding").as("pe"),
          col("nrm").as("pn")), Seq("va"))
        .join(e.select(col("vec_id").as("vb"), col("embedding").as("ne"),
          col("nrm").as("nn")), Seq("vb"))
        .withColumn("cos_e6", expr(
          "cast(floor(graft_dot(pe, ne) / (pn * nn) * 1000000 + 0.5) as bigint)"))
        .filter(col("cos_e6") >= 400000L)
        .groupBy(col("vb"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("vb").as("vec_id"), col("n_pairs"))
        .orderBy("vec_id")
    }),

    // Per-label embedding centroids (class prototypes for a training
    // mix). Elements are integer-scaled BEFORE summing, so the
    // cross-row float sum is order-free and exact in both engines;
    // the mean divides once in double (IEEE-identical).
    "v5_label_centroids" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        // driver schema compare is exact-width: posexplode emits int,
        // the oracle's range() arithmetic emits BIGINT — cast to long
        .select(col("label"), col("pos").cast("long").as("pos"),
          floor(col("v").cast("double") * lit(1000000d) + lit(0.5d))
            .cast("long").as("v_e6"))
        .groupBy(col("label"), col("pos"))
        .agg(sum("v_e6").as("sum_e6"), count(lit(1)).as("cnt"))
        .withColumn("mean_e6",
          floor(col("sum_e6").cast("double") / col("cnt") + lit(0.5d))
            .cast("long"))
        .orderBy("label", "pos")),

    // Distributed k-means (2 Lloyd iterations, k=4, deterministic
    // lowest-id seeds) — topic balancing / diversity sampling over
    // corpus embeddings. Integer-exact end-to-end (see KMeans docs),
    // which is what lets an ITERATIVE algorithm hash-match a DuckDB
    // oracle. Output: per-cluster centroid rows + member count.
    "v8_kmeans" -> ((s, dir) =>
      KMeans.centroidRows(emb(s, dir), k = 4, iters = 2)),

    // Product quantization (v10): 2 subspaces × k=4 codebooks over
    // the 64-dim embeddings, 1 Lloyd round each, then deterministic
    // code assignment — the ANN compression stage above v6's scalar
    // int8. Integer-exact throughout (Pq doc), so the learned codes
    // hash-match the oracle's per-subspace unrolled k-means CTE.
    "v10_pq_codes" -> ((s, dir) =>
      Pq.codes(emb(s, dir), m = 2, k = 4, iters = 1)
        .orderBy("vec_id", "m")),

    // ADC search over the PQ index (v11): query vec 0's top-10 by
    // asymmetric distance — per subspace a k-row exact LUT, then m
    // lookups + an integer sum per vector; TakeOrdered top-10.
    "v11_pq_adc" -> ((s, dir) =>
      Pq.adcTopK(emb(s, dir), m = 2, k = 4, iters = 1,
        queryVecId = 0L, topN = 10)),

    // PQ compression-quality eval (v12): recall@10 of the ADC search
    // against exact integer-L2 ground truth for the same query — the
    // v9-for-PQ counterpart, closing the compression family the way
    // v9 closes the LSH index. Both rankings include the query
    // itself (rank 1 on both sides by construction) and break ties
    // by vec_id, so the intersection is engine-exact. The measured
    // 0.4 recall is the DATA's ceiling, not the implementation's: a
    // k/m sweep (4–32 codewords × 2–8 subspaces, via the oracle CTE)
    // saturates at 3–4/10 because the synthetic embeddings are
    // near-random — PQ cells can't rank fine-grained neighbors when
    // there is no cluster structure to exploit (v10/v11's
    // hash-exactness is the implementation's correctness proof).
    "v12_pq_recall" -> ((s, dir) => {
      withGraftFns(s)
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      // ONE quantized pass (Pq.quantized, persisted) shared by the
      // exact ground-truth side and the ADC index — the exact side's
      // own e6Vectors derivation was the identical transform (r21)
      val v6 = Pq.quantized(e)
      val exact = exactTopIds(v6, queryVecId = 0L, n = 10)
      val adc = Pq.adcTopKQuantized(v6, m = 2, k = 16, iters = 1,
        queryVecId = 0L, topN = 10).select("vec_id")
      adc.join(exact, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(col("n_hits"),
          floor(col("n_hits") * 10000.0 / 10 + 0.5).cast("long")
            .as("recall_e4"))
    }),

    // IVF-PQ end-to-end (v13): coarse 8-cell k-means probe (nProbe=2)
    // → ADC re-rank within the probed cells only — the production ANN
    // search shape composing IvfIndex-style coarse quantization with
    // the v10/v11 PQ machinery. Integer-exact throughout, so the
    // whole composition (two k-means fits + cell assignment + probe
    // + restricted ADC) hash-matches one DuckDB CTE chain.
    "v13_ivfpq_search" -> ((s, dir) =>
      Pq.ivfAdcTopK(emb(s, dir), coarseK = 8, nProbe = 2, m = 2,
        k = 16, iters = 1, queryVecId = 0L, topN = 10)),

    // IVF-PQ quality eval (v14): recall@10 of the v13 composition
    // against exact integer-L2 ground truth — completes the eval
    // family (v9 for LSH, v12 for PQ, v14 for IVF-PQ). On these
    // near-random synthetic embeddings the ceiling is low (see v12);
    // the CLUSTERED fixture recall is pinned in ClusteredRecallSpec,
    // where structure exists for the index to exploit.
    "v14_ivfpq_recall" -> ((s, dir) => {
      withGraftFns(s)
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      // shared quantized pass — same rationale as v12 (r21)
      val v6 = Pq.quantized(e)
      val exact = exactTopIds(v6, queryVecId = 0L, n = 10)
      val ivfpq = Pq.ivfAdcTopKQuantized(v6, coarseK = 8, nProbe = 2,
        m = 2, k = 16, iters = 1, queryVecId = 0L, topN = 10)
        .select("vec_id")
      ivfpq.join(exact, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(col("n_hits"),
          floor(col("n_hits") * 10000.0 / 10 + 0.5).cast("long")
            .as("recall_e4"))
    }),

    // Two-stage IVF-PQ search (v15): ADC shortlists top-20 by
    // compressed distance, then the SHORTLIST ONLY is re-ranked by
    // exact integer L2 — the standard production refinement (ADC's
    // codebook error decides the shortlist, exact distances decide
    // the final order). At scale the exact pass touches 20 vectors
    // per query, never the corpus; here that claim is visible in the
    // plan as a 20-row semi-join before the full-vector read.
    "v15_ivfpq_rerank" -> ((s, dir) => {
      withGraftFns(s)
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      // shared quantized pass — same rationale as v12 (r21)
      val v6 = Pq.quantized(e)
      val shortlist = Pq.ivfAdcTopKQuantized(v6, coarseK = 8,
        nProbe = 2, m = 2, k = 16, iters = 1, queryVecId = 0L,
        topN = 20)
        .select("vec_id")
      val q = v6.filter(col("vec_id") === 0L).select(col("v").as("qv"))
      v6.join(broadcast(shortlist), Seq("vec_id"), "left_semi")
        .crossJoin(broadcast(q))
        .withColumn("dist2", expr("graft_l2sq(v, qv)"))
        .orderBy(col("dist2"), col("vec_id")).limit(10)
        .select(col("vec_id"), col("dist2"))
    }),

    // Symmetric int8 quantization (max-abs per vector → [-127, 127]):
    // the standard 4× memory cut for ANN indexes at scale. maxabs is
    // a left fold from 0.0 (same order as the oracle's list_reduce);
    // q = round(v/maxabs·127) is one double chain, IEEE-identical.
    "v6_int8_quantize" -> ((s, dir) =>
      emb(s, dir)
        .filter(col("vec_id") < 20)
        .withColumn("maxabs", expr(
          """aggregate(embedding, cast(0.0 as double),
            |  (a, x) -> greatest(a, abs(cast(x as double))))"""
            .stripMargin))
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")),
          col("maxabs"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          when(col("maxabs") === 0d, lit(0L))
            .otherwise(floor(col("v").cast("double") / col("maxabs")
              * lit(127d) + lit(0.5d)).cast("long")).as("q"))
        .orderBy("vec_id", "pos"))
  )

  /** v3 as a reusable operator: exact all-pairs cosine near-dup over
    * `emb` (vec_id, embedding), quadratic BY INTENT (verification
    * baseline — production near-dup routes through v2/d4 banding).
    *
    * DISTRIBUTED block-pair plan (nothing ever reaches the driver):
    * vectors are hashed into `blocks` blocks; a vector in block b
    * serves as the A-side of block pairs (b, j≥b) and the B-side of
    * (i≤b, b), so every unordered block pair — and therefore every
    * vector pair — meets in exactly one equi-join bucket keyed by the
    * pair id. Shuffle volume is (blocks+1)·n rows; per-bucket compare
    * work is (n/blocks)², so `blocks` is the executor-memory knob:
    * raise it until a bucket's two block slices fit in one task's
    * memory (parallelism scales as blocks·(blocks+1)/2 buckets).
    * Scoring runs through the codegen'd graft_dot kernel (same
    * ordered double fold as the oracle — bit-identical results). */
  def cosNearDupPairs(s: SparkSession, embDf: DataFrame, blocks: Int,
    thresholdE6: Long = 400000L): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    withGraftFns(s)
    val B = blocks
    val e = withNorm(embDf)
      .withColumn("blk", pmod(col("vec_id"), lit(B)).cast("int"))
    val sideA = e
      .withColumn("pid", explode(expr(
        s"transform(sequence(blk, ${B - 1}), j -> blk * $B + j)")))
      .select(col("pid"), col("vec_id").as("ida"), col("blk").as("ba"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val sideB = e
      .withColumn("pid", explode(expr(
        s"transform(sequence(0, blk), i -> i * $B + blk)")))
      .select(col("pid"), col("vec_id").as("idb"), col("blk").as("bb"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    sideA.join(sideB, Seq("pid"))
      // same-block pairs appear in both orders — keep one; cross-block
      // pairs appear once with block-determined roles — keep all and
      // canonicalize ids below (cosine is symmetric).
      .filter(col("ba") =!= col("bb") || col("ida") < col("idb"))
      .withColumn("cos_e6", expr(
        "cast(floor(graft_dot(ea, eb) / (na * nb) * 1000000 + 0.5) as bigint)"))
      .filter(col("cos_e6") >= thresholdE6)
      .select(least(col("ida"), col("idb")).as("vec_a"),
        greatest(col("ida"), col("idb")).as("vec_b"), col("cos_e6"))
      .orderBy("vec_a", "vec_b")
  }

  /** Oracle fragments mirroring the Spark fold order exactly. */
  private val oNorm =
    """sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      | (a, b) -> a + b))""".stripMargin
  private def oDot(l: String, r: String) =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |  list_transform(range(1, len($l) + 1),
       |   i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE))),
       | (a, b) -> a + b)""".stripMargin
  private val oNormCte =
    s"""WITH nv AS (SELECT vec_id, embedding, $oNorm AS nrm
       |FROM embeddings)""".stripMargin
  private val oPlanes =
    """pl AS (SELECT pid,
      |  list_transform(range(64),
      |   i -> ('0x' || substr(md5(pid || '_' || i), 1, 8))::BIGINT
      |        % 2001 - 1000) AS plane
      | FROM (SELECT unnest(range(8)) AS pid))""".stripMargin
  private val oSig =
    s"""sig AS (SELECT vec_id,
       |  sum(CASE WHEN pid < 4 AND dotp > 0
       |       THEN (1::BIGINT << (3 - pid)::INT) ELSE 0 END)::BIGINT AS band0,
       |  sum(CASE WHEN pid >= 4 AND dotp > 0
       |       THEN (1::BIGINT << (7 - pid)::INT) ELSE 0 END)::BIGINT AS band1
       | FROM (SELECT e.vec_id, p.pid,
       |   ${oDot("e.embedding", "p.plane")} AS dotp
       |  FROM embeddings e CROSS JOIN pl p)
       | GROUP BY 1)""".stripMargin

  /** Shared CTE prefix for the PQ oracles: e6 vectors, subspace
    * split, per-subspace 1-round k-means (`k` codewords), codes, and
    * the query-0 asymmetric LUT. */
  private def oPqCtes(k: Int): String = s"""
      |WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x ->
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fv
      |  FROM embeddings),
      |sub AS (
      |  SELECT vec_id, 0 AS m, fv[1:32] AS v FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS m, fv[33:64] AS v FROM e),
      |init AS (
      |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id)
      |    - 1 AS c, v
      |  FROM sub
      |  QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= $k),
      |d1 AS (
      |  SELECT s.vec_id, s.m, i.c, s.v,
      |    list_sum(list_transform(range(1, len(s.v) + 1), k ->
      |      (s.v[k] - i.v[k]) * (s.v[k] - i.v[k]))) AS dist2
      |  FROM sub s JOIN init i ON s.m = i.m),
      |a1 AS (
      |  SELECT vec_id, m, c, v FROM d1
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
      |    ORDER BY dist2, c) = 1),
      |u1 AS (
      |  SELECT m, c, pos1 - 1 AS pos,
      |    CAST(floor(sum(vk)::DOUBLE / count(*) + 0.5) AS BIGINT) AS ce6
      |  FROM (SELECT m, c, unnest(v) AS vk,
      |          unnest(range(1, len(v) + 1)) AS pos1 FROM a1)
      |  GROUP BY 1, 2, 3),
      |cent1 AS (SELECT m, c, list(ce6 ORDER BY pos) AS v
      |          FROM u1 GROUP BY 1, 2),
      |d2 AS (
      |  SELECT s.vec_id, s.m, i.c,
      |    list_sum(list_transform(range(1, len(s.v) + 1), k ->
      |      (s.v[k] - i.v[k]) * (s.v[k] - i.v[k]))) AS dist2
      |  FROM sub s JOIN cent1 i ON s.m = i.m),
      |codes AS (
      |  SELECT vec_id, m, c AS code FROM d2
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
      |    ORDER BY dist2, c) = 1),
      |q AS (SELECT m, v AS qv FROM sub WHERE vec_id = 0),
      |lut AS (
      |  SELECT c.m, c.c,
      |    list_sum(list_transform(range(1, len(q.qv) + 1), k ->
      |      (q.qv[k] - c.v[k]) * (q.qv[k] - c.v[k]))) AS qd
      |  FROM cent1 c JOIN q ON q.m = c.m)""".stripMargin

  /** Coarse-quantizer CTE suffix for the IVF-PQ oracles (appended
    * after [[oPqCtes]], reusing its `e`): full-vector 1-round k-means
    * (`kc` cells, first-kc-by-id seeds — KMeans.fitE6's contract),
    * cell assignment, the query's `nProbe` nearest cells, and the
    * candidate vec_id set. */
  private def oIvfCtes(kc: Int, nProbe: Int): String = s""",
      |cinit AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, fv AS v
      |  FROM e ORDER BY vec_id LIMIT $kc),
      |cd1 AS (
      |  SELECT e.vec_id, i.c, e.fv AS v,
      |    list_sum(list_transform(range(1, len(e.fv) + 1), k ->
      |      (e.fv[k] - i.v[k]) * (e.fv[k] - i.v[k]))) AS dist2
      |  FROM e CROSS JOIN cinit i),
      |ca1 AS (
      |  SELECT vec_id, c, v FROM cd1
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |    ORDER BY dist2, c) = 1),
      |cu1 AS (
      |  SELECT c, pos1 - 1 AS pos,
      |    CAST(floor(sum(vk)::DOUBLE / count(*) + 0.5) AS BIGINT) AS ce6
      |  FROM (SELECT c, unnest(v) AS vk,
      |          unnest(range(1, len(v) + 1)) AS pos1 FROM ca1)
      |  GROUP BY 1, 2),
      |ccent AS (SELECT c AS cell, list(ce6 ORDER BY pos) AS v
      |          FROM cu1 GROUP BY 1),
      |cells AS (
      |  SELECT e.vec_id, i.cell,
      |    list_sum(list_transform(range(1, len(e.fv) + 1), k ->
      |      (e.fv[k] - i.v[k]) * (e.fv[k] - i.v[k]))) AS dist2
      |  FROM e CROSS JOIN ccent i
      |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      |    ORDER BY dist2, cell) = 1),
      |qfull AS (SELECT fv AS qv FROM e WHERE vec_id = 0),
      |probed AS (
      |  SELECT cell FROM ccent CROSS JOIN qfull
      |  ORDER BY list_sum(list_transform(range(1, len(qv) + 1), k ->
      |    (qv[k] - v[k]) * (qv[k] - v[k]))), cell
      |  LIMIT $nProbe),
      |cand AS (
      |  SELECT vec_id FROM cells
      |  WHERE cell IN (SELECT cell FROM probed))""".stripMargin

  val oracle: Map[String, String] = Map(
    "v1_knn_brute" -> (oNormCte + s""",
      |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS nbr_id,
      |  CAST(floor(${oDot("p.embedding", "c.embedding")}
      |   / (p.nrm * c.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM nv p JOIN nv c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id
      |  ORDER BY cos_e6 DESC, nbr_id) AS rnk FROM sc)
      |SELECT probe_id, rnk, nbr_id, cos_e6 FROM rk WHERE rnk <= 3
      |ORDER BY probe_id, rnk""".stripMargin),
    "v2_knn_lsh" -> (s"""WITH $oPlanes,
      |$oSig,
      |nv AS (SELECT vec_id, embedding, $oNorm AS nrm FROM embeddings),
      |cand AS (
      | SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS nbr_id
      | FROM sig p JOIN sig c
      |  ON (p.band0 = c.band0 OR p.band1 = c.band1)
      | WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id),
      |sc AS (SELECT cand.probe_id, cand.nbr_id,
      |  CAST(floor(${oDot("p.embedding", "c.embedding")}
      |   / (p.nrm * c.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM cand JOIN nv p ON cand.probe_id = p.vec_id
      |  JOIN nv c ON cand.nbr_id = c.vec_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id
      |  ORDER BY cos_e6 DESC, nbr_id) AS rnk FROM sc)
      |SELECT probe_id, rnk, nbr_id, cos_e6 FROM rk WHERE rnk <= 3
      |ORDER BY probe_id, rnk""".stripMargin),
    // both pipelines replayed in one WITH; recall joins their top-3s
    "v9_ann_recall" -> (s"""WITH $oPlanes,
      |$oSig,
      |nv AS (SELECT vec_id, embedding, $oNorm AS nrm FROM embeddings),
      |bsc AS (SELECT p.vec_id AS probe_id, c.vec_id AS nbr_id,
      |  CAST(floor(${oDot("p.embedding", "c.embedding")}
      |   / (p.nrm * c.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM nv p JOIN nv c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
      |btk AS (SELECT probe_id, nbr_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY probe_id
      |   ORDER BY cos_e6 DESC, nbr_id) AS rnk FROM bsc)
      | WHERE rnk <= 3),
      |cand AS (
      | SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS nbr_id
      | FROM sig p JOIN sig c
      |  ON (p.band0 = c.band0 OR p.band1 = c.band1)
      | WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id),
      |lsc AS (SELECT cand.probe_id, cand.nbr_id,
      |  CAST(floor(${oDot("p.embedding", "c.embedding")}
      |   / (p.nrm * c.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM cand JOIN nv p ON cand.probe_id = p.vec_id
      |  JOIN nv c ON cand.nbr_id = c.vec_id),
      |ltk AS (SELECT probe_id, nbr_id FROM (
      |  SELECT *, row_number() OVER (PARTITION BY probe_id
      |   ORDER BY cos_e6 DESC, nbr_id) AS rnk FROM lsc)
      | WHERE rnk <= 3),
      |j AS (SELECT b.probe_id, count(*) AS n_hits
      | FROM btk b JOIN ltk l ON b.probe_id = l.probe_id
      |  AND b.nbr_id = l.nbr_id GROUP BY 1)
      |SELECT p.probe_id, coalesce(n_hits, 0)::BIGINT AS n_hits,
      | CAST(floor(coalesce(n_hits, 0) * 10000.0 / 3 + 0.5) AS BIGINT)
      |  AS recall_e4
      |FROM (SELECT DISTINCT probe_id FROM btk) p
      |LEFT JOIN j ON p.probe_id = j.probe_id
      |ORDER BY 1""".stripMargin),
    "v4_knn_ivf" -> (oNormCte + s""",
      |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS nbr_id,
      |  CAST(floor(${oDot("p.embedding", "c.embedding")}
      |   / (p.nrm * c.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM nv p JOIN nv c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY probe_id
      |  ORDER BY cos_e6 DESC, nbr_id) AS rnk FROM sc)
      |SELECT probe_id, rnk, nbr_id, cos_e6 FROM rk WHERE rnk <= 3
      |ORDER BY probe_id, rnk""".stripMargin),
    "v3_cos_neardup" -> (oNormCte + s"""
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      | CAST(floor(${oDot("a.embedding", "b.embedding")}
      |  / (a.nrm * b.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      |FROM nv a JOIN nv b ON a.vec_id < b.vec_id
      |WHERE CAST(floor(${oDot("a.embedding", "b.embedding")}
      |  / (a.nrm * b.nrm) * 1000000 + 0.5) AS BIGINT) >= 400000
      |ORDER BY vec_a, vec_b""".stripMargin),
    "v7_semantic_dedup" -> (s"""WITH $oPlanes,
      |$oSig,
      |nv AS (SELECT vec_id, embedding, $oNorm AS nrm FROM embeddings),
      |cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      | FROM sig a JOIN sig b
      |  ON (a.band0 = b.band0 OR a.band1 = b.band1)
      |  AND a.vec_id < b.vec_id),
      |sc AS (SELECT va, vb,
      |  CAST(floor(${oDot("a.embedding", "b.embedding")}
      |   / (a.nrm * b.nrm) * 1000000 + 0.5) AS BIGINT) AS cos_e6
      | FROM cand JOIN nv a ON va = a.vec_id JOIN nv b ON vb = b.vec_id)
      |SELECT vb AS vec_id, count(*) AS n_pairs FROM sc
      |WHERE cos_e6 >= 400000 GROUP BY 1 ORDER BY 1""".stripMargin),
    "v5_label_centroids" -> """
      |WITH e AS (
      |  SELECT label, unnest(embedding) AS v,
      |    unnest(range(1, len(embedding) + 1)) AS pos1
      |  FROM embeddings),
      |g AS (SELECT label, pos1 - 1 AS pos,
      |  CAST(floor(v::DOUBLE * 1000000 + 0.5) AS BIGINT) AS v_e6
      | FROM e)
      |SELECT label, pos, sum(v_e6)::BIGINT AS sum_e6, count(*) AS cnt,
      | CAST(floor(sum(v_e6)::DOUBLE / count(*) + 0.5) AS BIGINT)
      |  AS mean_e6
      |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "v8_kmeans" -> """
      |WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x ->
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
      |  FROM embeddings),
      |init AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
      |  FROM e ORDER BY vec_id LIMIT 4),
      |d1 AS (
      |  SELECT e.vec_id, i.c, e.v,
      |    list_sum(list_transform(range(1, len(e.v) + 1), k ->
      |      (e.v[k] - i.v[k]) * (e.v[k] - i.v[k]))) AS dist2
      |  FROM e CROSS JOIN init i),
      |a1 AS (
      |  SELECT vec_id, c, v FROM d1
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |    ORDER BY dist2, c) = 1),
      |u1 AS (
      |  SELECT c, pos1 - 1 AS pos,
      |    CAST(floor(sum(vk)::DOUBLE / count(*) + 0.5) AS BIGINT) AS ce6
      |  FROM (SELECT c, unnest(v) AS vk,
      |          unnest(range(1, len(v) + 1)) AS pos1 FROM a1)
      |  GROUP BY 1, 2),
      |cent1 AS (SELECT c, list(ce6 ORDER BY pos) AS v FROM u1 GROUP BY c),
      |d2 AS (
      |  SELECT e.vec_id, i.c, e.v,
      |    list_sum(list_transform(range(1, len(e.v) + 1), k ->
      |      (e.v[k] - i.v[k]) * (e.v[k] - i.v[k]))) AS dist2
      |  FROM e CROSS JOIN cent1 i),
      |a2 AS (
      |  SELECT vec_id, c, v FROM d2
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |    ORDER BY dist2, c) = 1)
      |SELECT c, pos1 - 1 AS pos,
      |  CAST(floor(sum(vk)::DOUBLE / count(*) + 0.5) AS BIGINT) AS mean_e6,
      |  count(*) AS cnt
      |FROM (SELECT c, unnest(v) AS vk,
      |        unnest(range(1, len(v) + 1)) AS pos1 FROM a2)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "v10_pq_codes" -> """
      |WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x ->
      |    CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS fv
      |  FROM embeddings),
      |sub AS (
      |  SELECT vec_id, 0 AS m, fv[1:32] AS v FROM e
      |  UNION ALL
      |  SELECT vec_id, 1 AS m, fv[33:64] AS v FROM e),
      |init AS (
      |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY vec_id)
      |    - 1 AS c, v
      |  FROM sub
      |  QUALIFY row_number() OVER (PARTITION BY m ORDER BY vec_id) <= 4),
      |d1 AS (
      |  SELECT s.vec_id, s.m, i.c, s.v,
      |    list_sum(list_transform(range(1, len(s.v) + 1), k ->
      |      (s.v[k] - i.v[k]) * (s.v[k] - i.v[k]))) AS dist2
      |  FROM sub s JOIN init i ON s.m = i.m),
      |a1 AS (
      |  SELECT vec_id, m, c, v FROM d1
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
      |    ORDER BY dist2, c) = 1),
      |u1 AS (
      |  SELECT m, c, pos1 - 1 AS pos,
      |    CAST(floor(sum(vk)::DOUBLE / count(*) + 0.5) AS BIGINT) AS ce6
      |  FROM (SELECT m, c, unnest(v) AS vk,
      |          unnest(range(1, len(v) + 1)) AS pos1 FROM a1)
      |  GROUP BY 1, 2, 3),
      |cent1 AS (SELECT m, c, list(ce6 ORDER BY pos) AS v
      |          FROM u1 GROUP BY 1, 2),
      |d2 AS (
      |  SELECT s.vec_id, s.m, i.c,
      |    list_sum(list_transform(range(1, len(s.v) + 1), k ->
      |      (s.v[k] - i.v[k]) * (s.v[k] - i.v[k]))) AS dist2
      |  FROM sub s JOIN cent1 i ON s.m = i.m)
      |SELECT vec_id, m::BIGINT AS m, c::BIGINT AS code,
      |  dist2::BIGINT AS dist2
      |FROM d2
      |QUALIFY row_number() OVER (PARTITION BY vec_id, m
      |  ORDER BY dist2, c) = 1
      |ORDER BY vec_id, m""".stripMargin,
    "v11_pq_adc" -> (oPqCtes(4) + """
      |SELECT codes.vec_id, sum(lut.qd)::BIGINT AS adc_dist2
      |FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.c
      |GROUP BY 1 ORDER BY adc_dist2, vec_id LIMIT 10""".stripMargin),
    "v12_pq_recall" -> (oPqCtes(16) + """,
      |adc AS (
      |  SELECT codes.vec_id, sum(lut.qd)::BIGINT AS adc_dist2
      |  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.c
      |  GROUP BY 1 ORDER BY adc_dist2, vec_id LIMIT 10),
      |exact AS (
      |  SELECT e2.vec_id FROM e e2
      |  CROSS JOIN (SELECT fv AS qv FROM e WHERE vec_id = 0) q
      |  ORDER BY list_sum(list_transform(range(1, len(e2.fv) + 1),
      |    k -> (e2.fv[k] - q.qv[k]) * (e2.fv[k] - q.qv[k]))), e2.vec_id
      |  LIMIT 10)
      |SELECT count(*)::BIGINT AS n_hits,
      |  CAST(floor(count(*) * 10000.0 / 10 + 0.5) AS BIGINT) AS recall_e4
      |FROM adc JOIN exact USING (vec_id)""".stripMargin),
    "v13_ivfpq_search" -> (oPqCtes(16) + oIvfCtes(8, 2) + """
      |SELECT codes.vec_id, sum(lut.qd)::BIGINT AS adc_dist2
      |FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.c
      |WHERE codes.vec_id IN (SELECT vec_id FROM cand)
      |GROUP BY 1 ORDER BY adc_dist2, vec_id LIMIT 10""".stripMargin),
    "v14_ivfpq_recall" -> (oPqCtes(16) + oIvfCtes(8, 2) + """,
      |adc AS (
      |  SELECT codes.vec_id, sum(lut.qd)::BIGINT AS adc_dist2
      |  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.c
      |  WHERE codes.vec_id IN (SELECT vec_id FROM cand)
      |  GROUP BY 1 ORDER BY adc_dist2, vec_id LIMIT 10),
      |exact AS (
      |  SELECT e2.vec_id FROM e e2
      |  CROSS JOIN (SELECT fv AS qv FROM e WHERE vec_id = 0) q
      |  ORDER BY list_sum(list_transform(range(1, len(e2.fv) + 1),
      |    k -> (e2.fv[k] - q.qv[k]) * (e2.fv[k] - q.qv[k]))), e2.vec_id
      |  LIMIT 10)
      |SELECT count(*)::BIGINT AS n_hits,
      |  CAST(floor(count(*) * 10000.0 / 10 + 0.5) AS BIGINT) AS recall_e4
      |FROM adc JOIN exact USING (vec_id)""".stripMargin),

    // the v13 chain with the shortlist widened to 20, then an exact
    // integer-L2 re-rank of the shortlist rows only
    "v15_ivfpq_rerank" -> (oPqCtes(16) + oIvfCtes(8, 2) + """,
      |adc AS (
      |  SELECT codes.vec_id, sum(lut.qd)::BIGINT AS adc_dist2
      |  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.c
      |  WHERE codes.vec_id IN (SELECT vec_id FROM cand)
      |  GROUP BY 1 ORDER BY adc_dist2, vec_id LIMIT 20)
      |SELECT e2.vec_id,
      |  list_sum(list_transform(range(1, len(e2.fv) + 1),
      |    k -> (e2.fv[k] - q.qv[k]) * (e2.fv[k] - q.qv[k])))::BIGINT
      |    AS dist2
      |FROM e e2 JOIN adc USING (vec_id)
      |CROSS JOIN (SELECT fv AS qv FROM e WHERE vec_id = 0) q
      |ORDER BY dist2, vec_id LIMIT 10""".stripMargin),

    "v6_int8_quantize" -> """
      |WITH m AS (
      |  SELECT vec_id, embedding,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
      |     (a, b) -> greatest(a, b)) AS maxabs
      |  FROM embeddings WHERE vec_id < 20),
      |e AS (
      |  SELECT vec_id, maxabs, unnest(embedding) AS v,
      |    unnest(range(1, len(embedding) + 1)) AS pos1
      |  FROM m)
      |SELECT vec_id, pos1 - 1 AS pos,
      | CASE WHEN maxabs = 0 THEN 0
      |  ELSE CAST(floor(v::DOUBLE / maxabs * 127 + 0.5) AS BIGINT)
      |  END AS q
      |FROM e ORDER BY 1, 2""".stripMargin
  )
}
