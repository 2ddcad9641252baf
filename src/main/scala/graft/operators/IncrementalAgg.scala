package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (IVM): keep a grouped
  * count/sum summary current under a changelog WITHOUT rescanning
  * the corpus — the refresh step for any always-on dashboard or
  * feature table over an append-mostly 100 TB corpus, where the
  * daily delta is GBs but the base is not re-readable every run.
  *
  * Model: the changelog is a signed-row frame — every deleted or
  * pre-update row contributes `_op = -1`, every inserted or
  * post-update row `_op = +1` (an update is a -1/+1 pair; a group
  * move is a -1 in the old group and a +1 in the new one). count and
  * sum are distributive, so the delta aggregate
  * `sum(_op), sum(_op * m)` per group composes with the stored
  * summary by plain addition; groups whose maintained count reaches
  * zero vanish (and a NEGATIVE maintained count fails loudly — it
  * means the changelog deleted rows the base never had).
  *
  * Plan at 100 TB: one hash aggregation over the DELTA only, then a
  * full-outer merge against the stored summary — both sides are
  * group-cardinality-sized, never corpus-sized. The base corpus is
  * not in the plan at all (spec-asserted: the maintained plan scans
  * the summary file + the delta, nothing else).
  *
  * min/max are NOT delta-maintainable under deletes (removing the
  * current max says nothing about the runner-up); for those use
  * [[rescanGroups]], which recomputes ONLY the groups the changelog
  * touched from the new corpus (semi-join pruned scan) and reuses
  * the stored rows for every untouched group — the standard
  * partial-recompute fallback.
  */
object IncrementalAgg {

  /** Canonical summary shape this module maintains:
    * groupCols ++ (cnt, sum_<m> per measure). Measures must be
    * integral (long) — integer sums make maintenance EXACT; float
    * accumulators drift under add/subtract replay. */
  def aggregate(corpus: DataFrame, groupCols: Seq[String],
    sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "aggregate needs group columns")
    sumCols.foreach { c =>
      val dt = corpus.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType,
        s"measure $c is $dt — cast to long (e.g. integer cents) so " +
          "maintenance stays exact under signed replay")
    }
    corpus.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(c).as(s"sum_$c")): _*)
  }

  /** Tag delete/insert frames into one signed changelog. Schemas
    * must match; `_op` must not collide. */
  def signedDelta(deletes: DataFrame, inserts: DataFrame): DataFrame = {
    require(deletes.columns.sorted.toSeq == inserts.columns.sorted.toSeq,
      s"changelog sides differ — deletes [${deletes.columns.mkString(", ")}]" +
        s" vs inserts [${inserts.columns.mkString(", ")}]")
    require(!deletes.columns.contains("_op"),
      "column _op collides with the changelog's sign tag")
    deletes.withColumn("_op", lit(-1L))
      .unionByName(inserts.withColumn("_op", lit(1L)))
  }

  /** Apply a signed changelog to a stored summary. `summary` has the
    * [[aggregate]] shape; `delta` has groupCols ++ sumCols ++ `_op`.
    * Returns the maintained summary (same shape, same exact values
    * as re-aggregating the post-change corpus — spec-asserted). */
  def maintain(summary: DataFrame, delta: DataFrame,
    groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "maintain needs group columns")
    require(delta.columns.contains("_op"),
      "delta is not a signed changelog — build it with signedDelta")
    val expect = (groupCols ++ Seq("cnt") ++ sumCols.map("sum_" + _)).sorted
    require(summary.columns.sorted.toSeq == expect,
      s"summary columns [${summary.columns.mkString(", ")}] don't match " +
        s"the aggregate() shape [${expect.mkString(", ")}]")
    val d = delta.groupBy(groupCols.map(col): _*)
      .agg(sum("_op").as("_d_cnt"),
        sumCols.map(c => sum(col(c) * col("_op")).as(s"_d_$c")): _*)
    // null-SAFE group join, as in Diff.snapshot: a NULL group key is
    // still one group, and new groups / vanished groups appear on one
    // side only.
    val sAl = summary.as("_gs")
    val dAl = d.as("_gd")
    val cond = groupCols.map(k =>
      col(s"_gs.$k") <=> col(s"_gd.$k")).reduce(_ && _)
    val cnt = coalesce(col("_gs.cnt"), lit(0L)) +
      coalesce(col("_d_cnt"), lit(0L))
    val guardedCnt = when(cnt < 0, raise_error(concat(
      lit("IncrementalAgg: maintained count went negative for group ("),
      concat_ws(", ", groupCols.map(k =>
        coalesce(col(s"_gd.$k").cast("string"), lit("null"))): _*),
      lit(") — the changelog deleted rows the base never had"))))
      .otherwise(cnt)
    sAl.join(dAl, cond, "full_outer")
      .select(groupCols.map(k =>
        coalesce(col(s"_gs.$k"), col(s"_gd.$k")).as(k)) ++
        Seq(guardedCnt.as("cnt")) ++
        sumCols.map(c => (coalesce(col(s"_gs.sum_$c"), lit(0L)) +
          coalesce(col(s"_d_$c"), lit(0L))).as(s"sum_$c")): _*)
      .filter(col("cnt") > 0)
  }

  /** Partial-recompute fallback for NON-distributive aggregates
    * (min/max/distinct): recompute the full summary only for groups
    * the changelog touched — a semi-join-pruned scan of the new
    * corpus — and keep the stored row for every untouched group
    * (anti-join). `fullAgg` re-aggregates a (pruned) corpus frame,
    * so ANY aggregate works; the corpus cost is proportional to the
    * touched groups' share, not the table. */
  def rescanGroups(summary: DataFrame, newCorpus: DataFrame,
    touched: DataFrame, groupCols: Seq[String],
    fullAgg: DataFrame => DataFrame): DataFrame = {
    require(groupCols.nonEmpty, "rescanGroups needs group columns")
    val keys = touched.select(groupCols.map(col): _*).distinct()
    val cond = (l: DataFrame, r: DataFrame) => groupCols.map(k =>
      l(k) <=> r(k)).reduce(_ && _)
    val recomputed = fullAgg(
      newCorpus.join(keys, cond(newCorpus, keys), "left_semi"))
    val untouchedRows = summary.join(keys,
      cond(summary, keys), "left_anti")
    untouchedRows.unionByName(recomputed)
  }
}
