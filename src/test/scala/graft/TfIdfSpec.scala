package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")

  test("scores match the hand-computed smoothed tf-idf") {
    // N=2; df: a=1, b=2, c=1
    // idf_e6(a)=idf_e6(c)=floor((ln(3/2)+1)*1e6+0.5)=1405465
    // idf_e6(b)=floor((ln(3/3)+1)*1e6+0.5)=1000000
    val out = TfIdf.scores(corpus, "doc_id", "text")
      .select("doc_id", "term", "tf", "df", "score_e6")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out == Map(
      (1L, "a") -> ((2L, 1L, 2810930L)),
      (1L, "b") -> ((1L, 2L, 1000000L)),
      (2L, "b") -> ((1L, 2L, 1000000L)),
      (2L, "c") -> ((1L, 1L, 1405465L))))
  }

  test("topTerms ranks by score desc then term asc, k bounds rows") {
    val top1 = TfIdf.topTerms(corpus, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(top1 == Map(1L -> "a", 2L -> "c"))
    // doc 2 tie-break at k=2: only b remains after c
    val top2 = TfIdf.topTerms(corpus, "doc_id", "text", 2)
      .filter(col("doc_id") === 2L)
      .orderBy("rnk").select("term").as[String].collect().toSeq
    assert(top2 == Seq("c", "b"))
  }

  test("heap-routed topTerms equals the window spelling on documents") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e6").desc, col("term").asc)
    val ref = TfIdf.scores(docs, "doc_id", "text")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "score_e6", "rnk")
      .collect().map(_.toSeq).toSet
    graft.operators.Broadcasting.releaseAll()
    val got = TfIdf.topTerms(docs, "doc_id", "text", 3)
      .select("doc_id", "term", "tf", "df", "score_e6", "rnk")
      .collect().map(_.toSeq).toSet
    graft.operators.Broadcasting.releaseAll()
    assert(got == ref)
  }

  test("heapTopK=false routes topTerms through the window, same rows") {
    // the scale escape hatch (r11 advisor): per-document grouping at
    // extreme docs-per-task cardinality belongs to the codegen'd
    // window — conf off must produce an identical result with NO
    // GroupedTopKExec in the plan
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(): (String, Set[Seq[Any]]) = {
      val df = TfIdf.topTerms(docs, "doc_id", "text", 3)
        .select("doc_id", "term", "tf", "df", "score_e6", "rnk")
      try (df.queryExecution.executedPlan.toString,
        df.collect().map(_.toSeq).toSet)
      finally graft.operators.Broadcasting.releaseAll()
    }
    val (heapPlan, heapRows) = run()
    assert(heapPlan.contains("GroupedTopK"), heapPlan)
    spark.conf.set(TfIdf.HeapTopTermsKey, "false")
    try {
      val (winPlan, winRows) = run()
      assert(!winPlan.contains("GroupedTopK"), winPlan)
      assert(winRows == heapRows)
    } finally spark.conf.unset(TfIdf.HeapTopTermsKey)
  }

  test("default auto gate: stats route heap for low-ndv docs, " +
    "window past the crossover") {
    // r12 advisor follow-through: the boolean conf became the same
    // ndv-stats gate TopKRewrite's auto mode enforces. Under the
    // DEFAULT conf (auto), an analyzed table whose doc_id ndv clears
    // spark.graft.topk.rewriteMaxGroups plans the heap; one past the
    // crossover falls back to the codegen'd window — no conf flips.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // crossover lowered so the "high" side stays spec-sized
    spark.conf.set(graft.plans.TopKRewrite.RewriteMaxGroupsKey, "50")
    def mk(name: String, nDocs: Int): Unit = {
      spark.range(0, nDocs.toLong * 3)
        .select((col("id") % nDocs).cast("string").as("doc_id"),
          concat(lit("alpha beta w"), (col("id") % 11).cast("string"))
            .as("text"))
        .write.mode("overwrite").saveAsTable(name)
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS doc_id")
    }
    def plan(name: String): String = {
      val df = TfIdf.topTerms(spark.table(name), "doc_id", "text", 2)
      try df.queryExecution.executedPlan.toString
      finally graft.operators.Broadcasting.releaseAll()
    }
    try {
      mk("tfidf_ndv_low", 7)
      mk("tfidf_ndv_high", 400)
      val low = plan("tfidf_ndv_low")
      assert(low.contains("GroupedTopK"),
        s"auto should heap the ndv=7 analyzed corpus:\n$low")
      val high = plan("tfidf_ndv_high")
      assert(!high.contains("GroupedTopK"),
        s"auto should window the ndv=400 analyzed corpus:\n$high")
      // and the escape hatches still override in both directions
      spark.conf.set(TfIdf.HeapTopTermsKey, "true")
      assert(plan("tfidf_ndv_high").contains("GroupedTopK"))
      spark.conf.set(TfIdf.HeapTopTermsKey, "false")
      assert(!plan("tfidf_ndv_low").contains("GroupedTopK"))
      spark.conf.set(TfIdf.HeapTopTermsKey, "bogus")
      intercept[IllegalArgumentException](plan("tfidf_ndv_low"))
    } finally {
      spark.conf.unset(TfIdf.HeapTopTermsKey)
      spark.conf.unset(graft.plans.TopKRewrite.RewriteMaxGroupsKey)
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS tfidf_ndv_low")
      spark.sql("DROP TABLE IF EXISTS tfidf_ndv_high")
    }
  }

  test("empty tokens vanish; output column collisions are rejected") {
    val blanky = Seq((1L, "  x   y  ")).toDF("doc_id", "text")
    val terms = TfIdf.scores(blanky, "doc_id", "text")
      .select("term").as[String].collect().toSet
    assert(terms == Set("x", "y"))
    intercept[IllegalArgumentException](
      TfIdf.scores(corpus.withColumn("tf", lit(1)), "doc_id", "text"))
  }
}
