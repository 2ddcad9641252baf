package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpora for index-quality
  * evaluation. The driver testdata's embeddings are near-random, which
  * caps every recall eval at the data's ceiling (~0.4 recall@10 for PQ
  * at sf0.01) — correctness stays provable by hash-exactness, but a
  * QUALITY regression in an index is invisible. This generator makes a
  * corpus with genuine cluster structure, where a healthy coarse index
  * reaches recall ≈ 1 and any drop is a real defect.
  *
  * `clustered`: `centers` well-separated block centers — center c
  * carries `sep` in its own dims/centers-wide dim block, 0 elsewhere —
  * plus bounded per-(vec, dim) noise in [-0.5, 0.5] derived from
  * xxhash64, so the corpus is reproducible on any executor layout,
  * retry, or engine (no RNG state). `label = vec_id % centers`, so the
  * first `centers` vec_ids seed one per cluster under the
  * first-k-by-id k-means rule — coarse indexes start from a perfect
  * seeding and recall failures indict the machinery, not the init.
  *
  * Scale shape: one narrow `spark.range` map — no shuffle, no data
  * files; a 10⁹-row fixture costs the same plan.
  */
object SyntheticEmbeddings {

  def clustered(s: SparkSession, n: Long, dims: Int, centers: Int,
    sep: Double): DataFrame = {
    require(n >= 1 && dims >= 1 && centers >= 1,
      s"n/dims/centers must be >= 1: $n/$dims/$centers")
    require(dims % centers == 0,
      s"dims ($dims) must be divisible by centers ($centers) " +
        "for the block-center layout")
    val blk = dims / centers
    s.range(0, n).select(
      col("id").as("vec_id"),
      (col("id") % centers).as("label"),
      expr(
        s"""transform(sequence(0, ${dims - 1}), d -> cast(
           |  (case when d >= (id % $centers) * $blk
           |         and d < (id % $centers + 1) * $blk
           |        then cast($sep as double) else 0.0d end)
           |  + (cast(pmod(xxhash64(id, d), 1001) as double) - 500.0d)
           |    / 1000.0d
           | as float))""".stripMargin).as("embedding"))
  }
}
