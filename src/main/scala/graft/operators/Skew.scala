package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY §7.4: "Turtle aggregation per
  * (exec, image) group must avoid single-task skew — salt").
  *
  * Two-phase salted aggregation: phase 1 groups on (key, salt) so a
  * hot key's rows spread over `saltBuckets` reducers; phase 2 merges
  * the per-salt partials. Equivalent to the direct groupBy for any
  * associative aggregate — asserted by SkewSpec. AQE's skew handling
  * covers sort-merge JOINS automatically; aggregation skew still
  * needs this pattern (or partial-agg push-down, which caps but does
  * not eliminate hot reducers when distinct-per-key is high).
  */
object Skew {

  /** Salted count+sum per key. `valueCol` must be numeric. */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
    saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(keyCol), monotonically_increasing_id()),
        lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_c").as("cnt"), sum("_s").as("total"))
  }

  /** Salted broadcast-side explosion for skewed joins: replicate the
    * SMALL side `saltBuckets`× with an explicit salt column, salt the
    * big side randomly, and join on (key, salt) — every bucket of a
    * hot key lands on a different reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
    saltBuckets: Int): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()),
        lit(saltBuckets)))
    val smallExploded = small
      .withColumn("_salt", explode(expr(
        s"sequence(0, ${saltBuckets - 1})")))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }
}
