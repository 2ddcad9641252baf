package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog register sketch (Flajolet et al. 2007) — THE
  * cardinality pattern at 100 TB: each value updates one of m = 2^p
  * registers with the rank of its hash's first set bit, and
  * `max(rho)` per register is map-side combinable, so the whole
  * sketch costs one narrow pass + an m-row shuffle regardless of
  * corpus size; two sketches union by element-wise max (mergeable
  * across days/shards — the reason warehouses store registers, not
  * estimates).
  *
  * Engine-exact discipline (the CMS/KMV family contract): the hash is
  * the shared md5 arithmetic — ('hll:'||value) md5'd, first 15 hex
  * chars as a 60-bit int — and rho is integer bit-length arithmetic,
  * so the REGISTER CONTENTS are bit-identical in any engine and the
  * oracle checks them directly. The floating-point estimator is a
  * trivial driver-side formula over ≤ m rows (`estimate`), spec'd
  * against true cardinalities rather than oracle-hashed. */
object Hll {

  /** Raw 60-bit salted md5 hash (DuckDB spelling:
    * ('0x'||substr(md5('hll:'||c),1,15))::BIGINT). */
  private def h60(c: String): String =
    s"cast(conv(substr(md5(concat('hll:', $c)), 1, 15), 16, 10) as bigint)"

  /** (register, max_rho) rows for `valueCol` (string-typed), p ∈
    * [4, 16]. Registers never touched by any value are simply absent
    * (the estimator treats them as 0). */
  def registers(df: DataFrame, valueCol: String, p: Int = 8)
    : DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1L << p
    val wBits = 60 - p
    // NULL values are NOT COUNTED (CmsSketch family contract): a null
    // would hash to a (null, null) register row that crashes
    // estimate()'s getLong and silently corrupts merged sketches
    df.filter(col(valueCol).isNotNull)
      .select(expr(h60(valueCol)).as("h"))
      .select((col("h") % m).as("register"),
        expr(s"h div $m").as("w"))
      // rho = leading zeros of the (60-p)-bit suffix + 1; bit length
      // via base-2 string conv — integer-exact in every engine
      .select(col("register"),
        expr(s"""case when w = 0 then ${wBits + 1}L
                |  else ${wBits + 1}L - length(conv(w, 10, 2)) end"""
          .stripMargin).as("rho"))
      .groupBy(col("register"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Standard HLL estimate from a registers frame: bias-corrected
    * harmonic mean with the linear-counting small-range correction.
    * The collect is bounded by m ≤ 65536 rows. */
  def estimate(registers: DataFrame, p: Int = 8): Double = {
    val m = 1 << p
    val regs = registers.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val s = (0 until m)
      .map(i => math.pow(2.0, -regs.getOrElse(i.toLong, 0L).toDouble))
      .sum
    val raw = alpha * m * m / s
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** Union of two sketches = element-wise register max — the
    * mergeability that makes HLL the warehouse cardinality sketch. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("register"))
      .agg(max(col("max_rho")).as("max_rho"))
}
