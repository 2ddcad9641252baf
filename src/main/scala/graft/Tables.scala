package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata
  * (/root/testdata/sf*). One parquet file per table; Catalyst handles
  * column pruning + predicate pushdown into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` physical type has drifted across testdata
    * generations — TIMESTAMP(NANOS) (read as long), TIMESTAMP_MICROS with
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ), or a plain UTC
    * timestamp — so branch on the schema Spark actually reads instead of
    * assuming one encoding:
    *  - LongType: nanos-as-long; rebuild micros with integer division
    *    (double division would round-trip int64 nanos ~1.7e18 > 2^53
    *    through an imprecise double).
    *  - TIMESTAMP_NTZ: cast to session-TZ timestamp. Sessions pin
    *    spark.sql.session.timeZone=UTC, so the cast preserves the raw
    *    micros and unix_micros/date_format semantics stay identical to
    *    the nanos path.
    *  - TimestampType: use as-is.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // the legacy nanos flag is consumed at scan EXECUTION too, so it
    // cannot be set-and-restored around the read — once a nanos file
    // is in play the session needs it until the query runs. Instead
    // it is set ONLY when the footer actually requires it (the read
    // throws on TIMESTAMP(NANOS) without it), so non-nanos testdata
    // generations leave session state untouched and unrelated parquet
    // reads keep Spark's default loud behavior.
    def read() = spark.read.parquet(s"$dir/events.parquet")
    val raw =
      try read()
      catch {
        case e: Exception
          if Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(5)
            .exists(t => Option(t.getMessage)
              .exists(_.contains("TIMESTAMP(NANOS"))) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          read()
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.parquet ts: unsupported type $other — extend Tables.loadEvents")
    }
  }
}
