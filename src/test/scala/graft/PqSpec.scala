package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001",
    "embeddings")

  test("one code per (vector, subspace), codes within [0, k)") {
    val n = emb.count()
    val out = Pq.codes(emb, m = 4, k = 8, iters = 2).cache()
    try {
      assert(out.count() == n * 4)
      assert(out.groupBy("vec_id").count()
        .filter(col("count") =!= 4).count() == 0)
      assert(out.filter(col("code") < 0 || col("code") >= 8)
        .count() == 0)
      assert(out.filter(col("dist2") < 0).count() == 0)
    } finally out.unpersist()
  }

  test("assignment is argmin: no other codeword is closer") {
    // recompute distances to EVERY codeword of subspace 0 and check
    // the emitted code's dist2 is the minimum (ties to lowest c)
    graft.expressions.GraftFunctions.register(spark)
    val sub = emb.select(col("vec_id"),
      expr("slice(embedding, 1, cast(size(embedding)/2 as int))")
        .as("embedding"))
    val cent = graft.operators.KMeans.fitE6(sub, k = 4, iters = 1)
    val v6 = sub.select(col("vec_id"), expr(
      """transform(embedding, x ->
        |  cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"""
        .stripMargin).as("v"))
    val best = v6.crossJoin(broadcast(cent.select("c", "cv")))
      .withColumn("d", expr("graft_l2sq(v, cv)"))
      .groupBy("vec_id").agg(min(struct(col("d"), col("c"))).as("b"))
      .select(col("vec_id"), col("b.c").as("c_ref"),
        col("b.d").as("d_ref"))
    val got = Pq.codes(emb, m = 2, k = 4, iters = 1)
      .filter(col("m") === 0)
      .select(col("vec_id"), col("code"), col("dist2"))
    val joined = got.join(best, "vec_id")
    assert(joined.filter(col("code") =!= col("c_ref") ||
      col("dist2") =!= col("d_ref")).count() == 0)
  }

  test("the query's own ADC distance equals its summed code residuals") {
    // ADC(query) looks the query's own codes up in its own LUT —
    // by construction exactly the per-subspace quantization
    // residuals the codes frame already carries
    val codeResidual = Pq.codes(emb, m = 2, k = 4, iters = 1)
      .filter(col("vec_id") === 0L)
      .agg(sum("dist2")).as[Long].head()
    val adc = Pq.adcTopK(emb, m = 2, k = 4, iters = 1,
        queryVecId = 0L, topN = 1000)
      .filter(col("vec_id") === 0L)
      .select("adc_dist2").as[Long].head()
    assert(adc == codeResidual, s"$adc != $codeResidual")
  }

  test("an absent query id yields an empty result (documented contract)") {
    assert(Pq.adcTopK(emb, m = 2, k = 4, iters = 1,
      queryVecId = -12345L, topN = 5).count() == 0)
  }

  test("indivisible dimensions fail loudly") {
    val e = intercept[Exception] {
      Pq.codes(emb, m = 7, k = 2, iters = 1).count()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("divisible") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("divisible")),
      s"got: ${e.getMessage}")
  }
}
