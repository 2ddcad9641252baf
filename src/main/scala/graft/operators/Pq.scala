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

  /** Codes for every vector: (vec_id, m, code, dist2) — one row per
    * (vector, subspace), `dist2` the e6² integer residual to the
    * assigned codeword. `embedding` must have length divisible by
    * `m` (checked per row). */
  def codes(emb: DataFrame, m: Int, k: Int, iters: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1: $m")
    graft.expressions.GraftFunctions.register(emb.sparkSession)
    val guarded = emb.withColumn("_dim",
      when(size(col("embedding")) % m =!= 0, raise_error(lit(
        s"Pq: embedding length must be divisible by m=$m")))
        .otherwise(size(col("embedding")) / m))
    val subs = (0 until m).map { i =>
      val sub = guarded.select(col("vec_id"),
        expr(s"slice(embedding, _dim * $i + 1, _dim)").as("embedding"))
      val cent = KMeans.fitE6(sub, k, iters)
      sub.select(col("vec_id"), expr(
          """transform(embedding, x ->
            |  cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"""
            .stripMargin).as("v"))
        .crossJoin(broadcast(cent.select(col("c"), col("cv"))))
        .withColumn("dist2", expr("graft_l2sq(v, cv)"))
        .groupBy("vec_id")
        // min over (dist2, c): deterministic code, same tie rule as
        // the fit's own assignment
        .agg(min(struct(col("dist2"), col("c"))).as("best"))
        .select(col("vec_id"), lit(i.toLong).as("m"),
          col("best.c").as("code"), col("best.dist2").as("dist2"))
    }
    subs.reduce(_ unionByName _)
  }
}
