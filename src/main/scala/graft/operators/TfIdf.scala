package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a text column — the classic relevance /
  * keyword-extraction signal a corpus pipeline computes for search,
  * quality filtering and near-dup triage.
  *
  * Numeric contract: idf = ln((N+1)/(df+1)) + 1 (smoothed, so terms in
  * every document still score > 0) is quantized HALF-UP to an integer
  * `idf_e6` the moment it is computed; `score_e6 = tf * idf_e6` is then
  * pure int64 arithmetic. The single transcendental evaluates once per
  * DISTINCT df value, and ln agrees bit-for-bit across libm/JVM/DuckDB
  * on these rational inputs (verified empirically), so the e6 floor is
  * a belt-and-suspenders guard, not a load-bearing assumption.
  *
  * Plan shape at 100 TB:
  *  - tf: tokenize → explode → groupBy(doc, term) — ONE corpus shuffle
  *    with map-side combine (the explode never materializes off-heap);
  *  - df: groupBy(term) over the tf frame — a VOCABULARY-sized frame
  *    (sublinear in corpus rows), joined back size-gated
  *    (`Broadcasting.maybeBroadcast`): broadcast when it fits, shuffle
  *    join when a giant vocabulary says otherwise;
  *  - N: a 1-row aggregate cross-joined in (Catalyst broadcasts it).
  * Nothing quadratic, nothing driver-side.
  */
object TfIdf {

  /** Per-(doc, term) weights: (idCol, term, tf, df, score_e6), one row
    * per distinct term of each document with ≥ 1 token. */
  def scores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val clash = df.columns.toSet
      .intersect(Set("term", "tf", "df", "score_e6", "n_docs", "idf_e6"))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with tf-idf " +
        "output columns — rename before scoring")
    val tokensExpr = MinHashLsh.tokensSql(textCol) // THE shared tokenizer
    val tf = df
      .select(col(idCol), explode(expr(tokensExpr)).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = Broadcasting.maybeBroadcast(
      tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
    // n_docs = docs with ≥ 1 token, exactly the docs holding a tf
    // row — computed MAP-ONLY from the source instead of a third
    // aggregation over tf. tf then has two consumers (join left +
    // df); column pruning makes their subtrees canonically different
    // so exchange reuse can't kick in, and the r9-r10 persist()
    // spelling paid a columnar cache encode+decode of the whole tf
    // frame that the bench sampler measured as the query's hottest
    // path — pricier than re-running the tokenize map + one extra
    // map-side-combined shuffle, at bench scale and at 100 TB (where
    // a corpus-sized cache also competes with execution memory).
    val n = df.agg(
      count(when(size(expr(tokensExpr)) > 0, 1)).as("n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(n)
      .withColumn("idf_e6",
        floor((log((col("n_docs") + 1) / (col("df") + 1)) + 1)
          * 1000000 + 0.5).cast("long"))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * col("idf_e6")).as("score_e6"))
  }

  /** Conf gate for [[topTerms]]' plan: the document id is an
    * EXTREME-cardinality group key at corpus scale, exactly the
    * regime where the r11 A/B measures the interpreted heap 2.2×
    * slower than Spark's codegen'd WindowGroupLimit (≳10⁵ live
    * groups per task), while at ≤10⁴ docs per task the heap is the
    * measured 9× win (x10 6.59 s → 0.71 s, r11). Three values:
    * "true" forces the heap, "false" forces the window, and the
    * default "auto" routes on statistics — the SAME gate
    * [[graft.plans.TopKRewrite]]'s auto mode enforces: when the
    * input carries a distinct-count stat for the id column (CBO /
    * ANALYZE … FOR COLUMNS), take the heap only while the estimated
    * doc count stays ≤ `spark.graft.topk.rewriteMaxGroups` (the
    * measured crossover, shared constant). Stats absent → heap, the
    * bench-default: only speed is at stake on a wrong guess, because
    * the heap's live-group cap keeps memory bounded regardless. */
  val HeapTopTermsKey = "spark.graft.tfidf.heapTopK"

  /** Estimated distinct docs from the optimized plan's column stats:
    * the id column's distinctCount capped by rowCount (TopKRewrite's
    * estimate, applied at the API layer where the logical plan is in
    * hand). None when no stats reached the plan. */
  private def estimatedDocs(df: DataFrame, idCol: String)
    : Option[BigInt] = {
    val plan = df.queryExecution.optimizedPlan
    val stats = plan.stats
    plan.output.find(a => df.sparkSession.sessionState.analyzer
        .resolver(a.name, idCol))
      .flatMap(a => stats.attributeStats.get(a))
      .flatMap(_.distinctCount)
      .map(ndv => stats.rowCount.fold(ndv)(_.min(ndv)))
  }

  /** Top-`k` terms per document by score, ties broken by term asc —
    * integer comparisons end to end, so the ranking is deterministic
    * on any engine.
    *
    * Routed (by default — see [[HeapTopTermsKey]]) through the custom
    * grouped-top-k heap operator ([[graft.plans.GroupedTopK]]) rather
    * than the row_number window spelling: the window sorts every
    * (doc, term) row of the corpus; the heap keeps k rows per doc
    * with no full sort, and the rank window afterwards runs over ≤
    * docs × k SURVIVORS (its exchange is elided — the heap final
    * phase already clustered by doc). The heap's order value is
    * `struct(-score_e6, term)` ascending, the exact (score desc,
    * term asc) total order — (doc, term) is unique, so the
    * k-boundary is never an arbitrary tie. Both routes produce
    * identical rows. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int)
    : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e6").desc, col("term").asc)
    val scored = scores(df, idCol, textCol)
    val useHeap = df.sparkSession.conf
      .get(HeapTopTermsKey, "auto") match {
      case "true" => true
      case "false" => false
      case "auto" =>
        val maxGroups = BigInt(df.sparkSession.conf.get(
          graft.plans.TopKRewrite.RewriteMaxGroupsKey, "32768").toLong)
        estimatedDocs(df, idCol).forall(_ <= maxGroups)
      case other => throw new IllegalArgumentException(
        s"$HeapTopTermsKey must be true|false|auto, got '$other'")
    }
    if (useHeap) {
      val withOrd = scored.withColumn("_ord",
        struct((-col("score_e6")).as("ns"), col("term").as("t")))
      graft.plans.GroupedTopK
        .topK(withOrd, Seq(idCol), "_ord", k, descending = false)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .drop("_ord")
    } else {
      // window spelling: Spark 4's InsertWindowGroupLimit prunes to k
      // per (group, partition) inside the sort — the scale path when
      // docs-per-task cardinality is past the heap's crossover
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= k)
    }
  }
}
