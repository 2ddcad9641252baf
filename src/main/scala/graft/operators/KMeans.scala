package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * clustering pass a curation pipeline runs for topic balancing /
  * diversity sampling over corpus embeddings.
  *
  * ENGINE-EXACT by construction (the v5/v6 discipline): every float is
  * half-up quantized to an int64 `e6` the moment it is read, distances
  * are pure integer arithmetic (Σ(a−b)², order-free), assignment
  * tie-breaks on the lowest centroid id, and the centroid update
  * divides an exact integer sum once in double. Any engine that can
  * add integers reproduces the exact same clustering — which is what
  * makes the DuckDB oracle possible for an iterative algorithm.
  * Seeding is deterministic: the k lowest vec_ids are the initial
  * centroids (a production run would swap in k-means‖ sampling;
  * determinism is the contract here).
  *
  * Plan shape at 100 TB, per iteration:
  *  - assignment: corpus × k via a BROADCAST of the k centroid arrays
  *    (k·dim longs — KBs), distance inside a zip_with/aggregate fold
  *    (no explode blow-up), then one groupBy(vec_id) min-struct with
  *    map-side combine. One corpus shuffle.
  *  - update: posexplode the winner rows, groupBy(c, pos) integer
  *    sums — output is k·dim rows, sublinear. One (small) shuffle.
  * Nothing quadratic, nothing driver-side except the k-row broadcast.
  * For many iterations, persist the quantized frame `e` up front —
  * with iters=2 the extra scan is cheaper than a 100 TB cache build.
  */
object KMeans {

  /** Fit and return per-cluster rows (c, cv: Array[Long] e6-centroid,
    * cnt members). Clusters that lose all members simply drop out
    * (same as the oracle's GROUP BY). */
  def fitE6(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 1, s"iters must be >= 1: $iters")
    graft.expressions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), expr(
      """transform(embedding,
        |  x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"""
        .stripMargin).as("v"))
    // deterministic seeds: k lowest vec_ids. The global window runs
    // over k rows post-limit — not a scale hazard.
    var cent: DataFrame = e.orderBy("vec_id").limit(k)
      .withColumn("c", row_number()
        .over(Window.partitionBy(lit(1)).orderBy("vec_id"))
        .cast("long") - 1)
      .select(col("c"), col("v").as("cv"), lit(0L).as("cnt"))
    for (_ <- 1 to iters) {
      // graft_l2sq: codegen'd int64 Σ(a−b)² — the HOF spelling
      // (aggregate ∘ zip_with) evaluates its lambdas interpreted per
      // element, and this is the corpus × k hot loop
      val assigned = e.crossJoin(broadcast(cent.select("c", "cv")))
        .withColumn("dist2", expr("graft_l2sq(v, cv)"))
        // min over (dist2, c) is the deterministic assignment; v rides
        // along (never compared — (dist2, c) is unique per candidate)
        .groupBy("vec_id")
        .agg(min(struct(col("dist2"), col("c"), col("v"))).as("m"))
        .select(col("m.c").as("c"), col("m.v").as("v"))
      cent = assigned
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "vk")))
        .groupBy(col("c"), col("pos"))
        .agg(sum("vk").as("s"), count(lit(1)).as("cnt"))
        .withColumn("ce6",
          floor(col("s").cast("double") / col("cnt") + lit(0.5d))
            .cast("long"))
        .groupBy("c")
        .agg(expr(
          "transform(array_sort(collect_list(struct(pos, ce6))), x -> x.ce6)")
          .as("cv"), first("cnt").as("cnt"))
    }
    cent
  }

  /** Final centroids unrolled to (c, pos, mean_e6, cnt) rows — the
    * flat, hash-comparable spelling. */
  def centroidRows(emb: DataFrame, k: Int, iters: Int): DataFrame =
    fitE6(emb, k, iters)
      .select(col("c"), posexplode(col("cv")).as(Seq("pos", "mean_e6")),
        col("cnt"))
      .select(col("c"), col("pos").cast("long").as("pos"),
        col("mean_e6"), col("cnt"))
      .orderBy("c", "pos")
}
