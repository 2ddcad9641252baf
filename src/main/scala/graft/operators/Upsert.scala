package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-wins upsert (merge): apply a batch of updates/inserts to a
  * base table without a transactional table format — the keyed
  * reconciliation step every snapshot-plus-changelog pipeline runs.
  *
  * Semantics: rows are grouped by `keyCols`; within a group the row
  * with the highest `versionCol` wins; a version TIE between base and
  * updates resolves to the UPDATES side (the batch being applied is
  * newer by definition); a tie within one side falls back to the
  * remaining payload columns — deterministic, engine-independent.
  * Keys present only in `updates` are inserts; keys present only in
  * `base` pass through.
  *
  * Plan shape at 100 TB: tag + unionByName + one hash-partitioned
  * aggregation of `max(struct(version, side, payload…))` — the same
  * argmax-without-a-Window pattern as a1/IVF (map-side partial max,
  * shuffle carries one row per (key, partition), never a per-group
  * sort of the whole corpus). Nothing driver-side, no join at all.
  *
  * Null versions fail loudly (a silent lowest-sort would let stale
  * rows win merges), matching the contract in Packing/Sampling.
  */
object Upsert {

  def latestWins(base: DataFrame, updates: DataFrame,
    keyCols: Seq[String], versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "latestWins needs at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq ||
      base.columns.sorted.toSeq == updates.columns.sorted.toSeq,
      s"base and updates must share a schema — base has " +
        s"[${base.columns.mkString(", ")}], updates has " +
        s"[${updates.columns.mkString(", ")}]")
    (keyCols :+ versionCol).foreach { c =>
      val bt = base.schema(c).dataType
      val ut = updates.schema(c).dataType
      require(bt == ut,
        s"column $c differs in type between base ($bt) and updates " +
          s"($ut) — align types before merging")
    }
    require(!base.columns.contains("_graft_side"),
      "column _graft_side collides with the merge's side tag")
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(versionCol),
      s"version column $versionCol must be a non-key column")
    val guardedVersion = when(col(versionCol).isNull,
      raise_error(lit(s"Upsert: null $versionCol — latest-wins needs " +
        "a total order; fill versions before merging")))
      .otherwise(col(versionCol))
    val tagged = base.withColumn("_graft_side", lit(0))
      .unionByName(updates.withColumn("_graft_side", lit(1)))
    val winner = struct(
      guardedVersion.as(versionCol) +: col("_graft_side") +:
        payload.filterNot(_ == versionCol).map(col): _*)
    tagged.groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("_w"))
      .select(keyCols.map(col) ++ Seq(
        col(s"_w.$versionCol")) ++
        payload.filterNot(_ == versionCol).map(p => col(s"_w.$p")): _*)
      .select(base.columns.map(col): _*)
  }
}
