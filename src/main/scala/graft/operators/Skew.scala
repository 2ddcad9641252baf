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
  *
  * The salt is a pure function of row CONTENT (`pmod(hash(cols),
  * buckets)`), never of `monotonically_increasing_id()` or `rand()`:
  * a nondeterministic salt used as a shuffle key silently duplicates
  * or drops rows when a stage retry recomputes a map task whose
  * earlier output was already partially consumed (SPARK-23207 class)
  * — exactly the failure mode of the long-running 100 TB jobs this
  * helper targets. The trade: rows with identical salt-column values
  * land in the same bucket, so callers should pass `saltCols` that
  * are near-unique per row (default: every column of the frame).
  */
object Skew {

  /** Deterministic per-row salt in [0, saltBuckets). `cols` must be
    * stable row content — near-unique combinations spread best. */
  private def salt(cols: Seq[Column], saltBuckets: Int): Column =
    pmod(hash(cols: _*), lit(saltBuckets))

  /** Spark's hash() rejects MapType (map iteration order is
    * undefined), so the all-columns default must skip any column
    * whose type contains a map at any nesting depth. */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case ArrayType(et, _) => hashable(et)
      case StructType(fields) => fields.forall(f => hashable(f.dataType))
      case _ => true
    }
  }

  /** Fails loudly when the only hashable content is the key itself:
    * `hash(key) % buckets` is CONSTANT per key, so every row of a hot
    * key would land in one bucket and the salting would silently do
    * nothing — the caller believes skew is handled when it is not. */
  private def defaultSaltCols(df: DataFrame, keyCol: String): Seq[String] = {
    val ok = df.schema.fields
      .filter(f => hashable(f.dataType)).map(_.name).toSeq
    if (ok.exists(_ != keyCol)) ok
    else throw new IllegalArgumentException(
      s"every non-key column of the frame (schema: ${df.schema.simpleString}) " +
        "is map-typed (unhashable), so the default salt would be " +
        s"hash($keyCol) alone — constant per key, spreading nothing. " +
        "Pass saltCols naming stable, near-unique row content explicitly.")
  }

  /** Salted count+sum per key. `valueCol` must be numeric. `saltCols`
    * picks the content the salt hashes (default: all columns). */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
    saltBuckets: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(saltBuckets >= 1,
      s"saltBuckets must be >= 1, got $saltBuckets")
    val src = if (saltCols.nonEmpty) saltCols
      else defaultSaltCols(df, keyCol)
    val salted = df.withColumn("_salt", salt(src.map(col), saltBuckets))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum("_c").as("cnt"), sum("_s").as("total"))
  }

  /** Salted broadcast-side explosion for skewed joins: replicate the
    * SMALL side `saltBuckets`× with an explicit salt column, salt the
    * big side deterministically from its row content, and join on
    * (key, salt) — every bucket of a hot key lands on a different
    * reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
    saltBuckets: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // 0 would be SILENTLY wrong, not slow: pmod(h, 0) is null (big
    // side) and sequence(0, -1) is [0, -1] (small side), so the
    // (key, _salt) join matches nothing and returns an empty frame
    require(saltBuckets >= 1,
      s"saltBuckets must be >= 1, got $saltBuckets")
    val src = if (saltCols.nonEmpty) saltCols
      else defaultSaltCols(big, key)
    val bigSalted = big.withColumn("_salt", salt(src.map(col), saltBuckets))
    val smallExploded = small
      .withColumn("_salt", explode(expr(
        s"sequence(0, ${saltBuckets - 1})")))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }
}
