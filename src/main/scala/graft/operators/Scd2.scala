package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 history build: collapse a stack of versioned snapshots
  * into per-key validity intervals — the warehouse-side sibling of
  * `Diff` (which compares two versions) and `Upsert` (which keeps only
  * the latest). Input: one row per (key, version); output: one row per
  * run of consecutive versions with identical payload, carrying
  * `from_version`, `to_version` (null = still current) and the
  * payload struct.
  *
  * Plan at 100 TB: ONE hash shuffle on the key columns serves the
  * whole chain — the change-flag window (payload <=> lag), the
  * running-sum segment id, the per-(key, segment) aggregate (hash
  * partitioning on key satisfies the (key, segment) clustering), and
  * the lead() that closes each interval all reuse the same
  * partitioning. Within a partition, cost is one sort per key group;
  * a key's version count is bounded by snapshot count, not corpus
  * size, so no group ever skews.
  */
object Scd2 {

  def intervals(df: DataFrame, keyCols: Seq[String],
    versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(df.columns.contains(versionCol),
      s"version column $versionCol not in schema")
    keyCols.foreach(k => require(df.columns.contains(k),
      s"key column $k not in schema"))
    val payload = df.columns
      .filterNot(c => keyCols.contains(c) || c == versionCol).toSeq
    require(payload.nonEmpty, "all columns are keys — nothing to track")
    Seq("_p", "_chg", "_seg", "from_version", "to_version").foreach(c =>
      require(!df.columns.contains(c),
        s"column $c collides with scd2 output columns"))

    val byKey = Window.partitionBy(keyCols.map(col): _*)
    val w = byKey.orderBy(col(versionCol))
    val marked = df
      .withColumn("_p", struct(payload.map(col): _*))
      // null-safe payload compare: a (null -> null) field change is no
      // change; the first version of a key always opens a segment
      .withColumn("_chg",
        when(lag(col("_p"), 1).over(w).isNull ||
          !(col("_p") <=> lag(col("_p"), 1).over(w)), 1L)
          .otherwise(0L))
      .withColumn("_seg", sum(col("_chg")).over(w))
    val segs = marked
      .groupBy((keyCols.map(col) :+ col("_seg")): _*)
      // payload is constant within a segment by construction, so
      // first() is deterministic here
      .agg(min(col(versionCol)).as("from_version"),
        first(col("_p")).as("payload"))
    segs
      .withColumn("to_version",
        lead(col("from_version"), 1)
          .over(byKey.orderBy(col("from_version"))) - 1)
      .select(keyCols.map(col) :+ col("from_version") :+
        col("to_version") :+ col("payload"): _*)
  }
}
