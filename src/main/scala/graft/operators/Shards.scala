package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle into training shards: the last step
  * of a data pipeline — "write the final mix as N shards, globally
  * shuffled, the same way every time".
  *
  * `orderBy(rand())` re-rolls per run and per retry; this assigns
  * every row a (shard, pos) pair from content hashes
  * (StableHash.md5Mod — no seed, no partition dependence): shard =
  * h("shard:key") mod N, pos = h("pos:key") mod 10^15 with the key as
  * tie-break. Reproducible across runs/partitionings/retries,
  * engine-replayable (the x9 oracle recomputes it in DuckDB), and
  * statistically a uniform permutation for hash-distributed keys.
  *
  * At 100 TB: `assign` is a narrow codegen'd projection; `write` is
  * ONE hash shuffle on the shard id (every shard lands wholly in one
  * task → exactly one file per shard directory) + an in-task sort.
  * nShards should scale with data size (shards of ~1-10 GB), so the
  * per-task sort is bounded and spillable.
  */
object Shards {

  /** Position space: 10^15 keeps hash-order ties astronomically rare
    * (and the key column breaks them deterministically anyway). */
  val PosSpace: Long = 1000000000000000L

  /** Add deterministic `shard` and `pos` columns. `keyCol` must be
    * unique per row (a doc id, a content hash); null keys fail
    * loudly via the same contract as Sampling. */
  def assign(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "columns shard/pos collide with the shard assignment")
    val key = when(col(keyCol).isNull, raise_error(lit(
      "Shards: null key — shard assignment requires non-null keys")))
      .otherwise(col(keyCol))
    df.withColumn("shard", StableHash.md5Mod("shard", key, nShards))
      .withColumn("pos", StableHash.md5Mod("pos", key, PosSpace))
  }

  /** Write `df` as `path/shard=<i>/` parquet, one file per shard,
    * rows inside a shard in (pos, key) order — a training loader
    * streams shards sequentially and sees the same order every run. */
  def write(df: DataFrame, keyCol: String, nShards: Int,
    path: String): Unit =
    assign(df, keyCol, nShards)
      // RANGE partition, not hash: murmur(shard) % n collides for
      // small n (balls-in-bins), packing 2-3 shards into one task
      // while others sit idle; range placement over the 0..n-1 id is
      // near-identity, and equal shard ids still land in ONE task →
      // still exactly one file per shard directory
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
