package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** S7: generic keyed enrichment against an external service — the
  * reusable shape behind the reference's Drupal image-hash fetch
  * (mongo-etl/sha256_pipeline.py:30-49) and its memoized hash cache
  * (mongodb_to_rdf.py:205-235): look up each DISTINCT key once,
  * remember misses and failures (negative cache), and join the result
  * back onto the fact frame.
  *
  * Scale shape: the fetch fan-out is proportional to the number of
  * distinct keys (slides/images), never to fact rows (marks); fetches
  * run inside `mapPartitions`, so one connection/session per TASK
  * serves that task's whole key slice (X6); the join back is a plain
  * equi-join that AQE broadcasts while the lookup is small and
  * shuffle-joins when it is not (never a forced hint). Persist the
  * `lookupTable` frame to reuse one fetch round across several
  * downstream joins — that is the memo cache, made explicit.
  */
object Enrich {

  /** One row per distinct non-null key of `df(keyCol)`: (key, value,
    * fetch_ok). `value` is null on a miss OR a fetch failure —
    * both are recorded (negative cache) so a reused/persisted table
    * never re-fetches them; `fetch_ok=false` marks failures so
    * callers can retry those keys selectively.
    *
    * `init` runs once per task and returns the fetch function — put
    * connection/session setup there (per-worker connection, X6). */
  def lookupTableWith(df: DataFrame, keyCol: String)
    (init: () => String => Option[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .distinct()
      .as[String]
      .mapPartitions { keys =>
        val fetch = init()
        keys.map { k =>
          try {
            (k, fetch(k).orNull, true)
          } catch { case NonFatal(_) => (k, null: String, false) }
        }
      }
      .toDF("key", "value", "fetch_ok")
  }

  /** `lookupTableWith` with a connectionless fetch function. */
  def lookupTable(df: DataFrame, keyCol: String)
    (fetch: String => Option[String]): DataFrame =
    lookupTableWith(df, keyCol)(() => fetch)

  /** Enrich `df` with `resultCol` = fetched value for `df(keyCol)`
    * (null when the key was missing from the service or the fetch
    * failed — apply a `coalesce` fallback downstream, the J4
    * pattern). Left join: fact rows are never dropped. */
  def enrich(df: DataFrame, keyCol: String, resultCol: String)
    (fetch: String => Option[String]): DataFrame =
    enrichWith(df, keyCol, resultCol)(() => fetch)

  /** `enrich` with per-task connection setup (see lookupTableWith). */
  def enrichWith(df: DataFrame, keyCol: String, resultCol: String)
    (init: () => String => Option[String]): DataFrame = {
    // join through a name no user frame can carry, so the drop below
    // can never swallow a fact column (drop(name) removes EVERY
    // attribute with that name, including df's own)
    val k = "__graft_enrich_key"
    val lut = lookupTableWith(df, keyCol)(init)
      .select(col("key").as(k), col("value").as(resultCol))
    df.join(lut, df(keyCol).cast("string") === lut(k), "left")
      .drop(k)
  }
}
