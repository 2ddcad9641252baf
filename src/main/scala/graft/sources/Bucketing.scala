package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the engine's answer to the reference's
  * hand-built Mongo secondary indexes (X8, mongo-etl/build_indexes.sh
  * :18-36). At 100 TB, the marks ⋈ analyses and fact ⋈ fact joins
  * shuffle both sides on every run unless the tables are written
  * bucketed on the join key — then SortMergeJoin reads co-located
  * buckets with ZERO Exchange (verified by BucketingSpec on the
  * physical plan).
  *
  * Buckets also bound file sizes for the K3-style sinks: numBuckets ×
  * maxRecordsPerFile caps any single writer task.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner elides
    * both shuffles when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
