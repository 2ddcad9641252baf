package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("selection is a pure function of content — repartition-invariant") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Sampling.byHash(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.byHash(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample changed under repartitioning")
  }

  test("samples are subset-monotone in the rate and near the target size") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count().toDouble
    val s5 = Sampling.byHash(docs, "doc_id", 0.05)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.byHash(docs, "doc_id", 0.50)
      .select("doc_id").as[Long].collect().toSet
    assert(s5.subsetOf(s50), "1-in-20 sample not inside 1-in-2 sample")
    assert(math.abs(s50.size / n - 0.5) < 0.15,
      s"50% sample badly sized: ${s50.size} of $n")
    // a different salt draws a different (but still deterministic) set
    val salted = Sampling.byHash(docs, "doc_id", 0.50, salt = "v2")
      .select("doc_id").as[Long].collect().toSet
    assert(salted != s50)
  }

  test("rate edges: 0 keeps nothing, 1 keeps everything") {
    val docs = Tables.load(spark, sf, "documents")
    assert(Sampling.byHash(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.byHash(docs, "doc_id", 1.0).count() == docs.count())
    intercept[IllegalArgumentException](
      Sampling.byHash(docs, "doc_id", 1.5))
  }

  test("stratified: per-stratum rates apply, unlisted strata drop") {
    val df = Seq.tabulate(400)(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val out = Sampling.stratifiedByHash(df, "id", "s",
      Map("a" -> 1.0, "b" -> 0.0))
    val kept = out.select("s").distinct().as[String].collect().toSeq
    assert(kept == Seq("a"))
    assert(out.count() == 200)
    val none = Sampling.stratifiedByHash(df, "id", "s", Map("c" -> 1.0))
    assert(none.count() == 0, "unlisted strata must be dropped")
  }

  test("plan shape: a narrow filter, no shuffle, no UDF") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = Sampling.byHash(docs, "doc_id", 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQL UDF"),
      plan)
  }

  test("null sampling keys fail loudly instead of silently dropping") {
    // even at rate 1.0 a null key would vanish from the sample — the
    // operator raises instead, so the caller decides what null means
    val df = Seq(Some("a"), None, Some("b")).toDF("k")
    def rootMessages(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    val e = intercept[Exception] {
      Sampling.byHash(df, "k", 1.0).collect()
    }
    assert(rootMessages(e).contains("null key"), rootMessages(e))
    val e2 = intercept[Exception] {
      Sampling.stratifiedByHash(
        df.withColumn("s", lit("x")), "k", "s", Map("x" -> 1.0)).collect()
    }
    assert(rootMessages(e2).contains("null key"), rootMessages(e2))
    // non-null rows keep sampling exactly as before
    assert(Sampling.byHash(df.filter($"k".isNotNull), "k", 1.0)
      .count() == 2L)
  }

  test("temperature mix: thresholds follow sqrt(n_min/n), smallest keeps all") {
    val df = (Seq.fill(400)("a") ++ Seq.fill(100)("b"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val thr = Sampling.temperatureThresholds(df, "s")
      .orderBy("s").as[(String, Long, Long)].collect().toSeq
    // sqrt(100/400) = 0.5 exactly; the smallest source keeps 100%
    assert(thr == Seq(("a", 400L, 500000L), ("b", 100L, 1000000L)))
    val kept = Sampling.temperatureMix(df, "id", "s")
    val bySrc = kept.groupBy("s").count().orderBy("s")
      .as[(String, Long)].collect().toMap
    assert(bySrc("b") == 100L, "smallest source must be kept whole")
    // expected kept for a = sqrt(400*100) = 200; content-hash draw is
    // binomial around it
    assert(math.abs(bySrc("a") - 200L) < 60, s"a kept ${bySrc("a")}")
    // deterministic: repartitioning draws the identical set
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(df.repartition(13), "id", "s")
      .select("id").as[Long].collect().toSet
    assert(a == b, "temperature mix changed under repartitioning")
  }

  test("composes with Structured Streaming: stream sample == batch sample") {
    // a stateless deterministic filter needs no watermark or state —
    // the same operator call works on a streaming frame unchanged
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val sampled = Sampling.byHash(in.toDF().withColumnRenamed("value", "id"),
      "id", 0.3)
    val q = sampled.writeStream.format("memory")
      .queryName("sampled_stream").outputMode("append").start()
    try {
      in.addData(1L to 500L)
      q.processAllAvailable()
      val streamed = spark.table("sampled_stream")
        .select("id").as[Long].collect().toSet
      val batch = Sampling.byHash(
        (1L to 500L).toDF("id"), "id", 0.3)
        .select("id").as[Long].collect().toSet
      assert(streamed == batch, "stream and batch samples diverged")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("weightedPriority: deterministic, partitioning-invariant top-k") {
    val df = (1L to 2000L).map(i => (i, 1L + i % 50)).toDF("id", "w")
    val a = Sampling.weightedPriority(df, "id", "w", 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedPriority(df.repartition(17), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 50)
  }

  test("weightedPriority favors heavy rows (A-Res inclusion scales with w)") {
    // two strata: weight 100 vs weight 1, equal counts — the heavy
    // stratum must dominate the sample
    val df = ((1L to 1000L).map(i => (i, 100L)) ++
      (1001L to 2000L).map(i => (i, 1L))).toDF("id", "w")
    val kept = Sampling.weightedPriority(df, "id", "w", 200)
      .select("id").as[Long].collect()
    val heavy = kept.count(_ <= 1000)
    assert(heavy > 180, s"only $heavy/200 from the heavy stratum")
  }

  test("weightedPriority rejects non-positive and null weights") {
    val df = Seq((1L, 0L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Sampling.weightedPriority(df, "id", "w", 1).collect()
    }
    assert(ex.getMessage.contains("positive") ||
      Option(ex.getCause).exists(_.getMessage.contains("positive")))
  }

  test("temperatureMix throws on NULL groups instead of silently " +
    "dropping them in the threshold join") {
    val df = Seq((1L, "s0"), (2L, null.asInstanceOf[String]), (3L, "s0"))
      .toDF("id", "s")
    val ex = intercept[Exception] {
      Sampling.temperatureMix(df, "id", "s").collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(ex).contains("null group"), ex)
  }

}
