package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate between
  * pipeline stages: each rule is a row-level predicate that should
  * hold; the report counts violations per rule in ONE corpus pass
  * (every rule folds into the same aggregate, map-side combined — a
  * rules-long column list, never N scans), and the enforcing face
  * fails the job loudly when a rule breaches its tolerance instead
  * of letting bad rows flow downstream.
  *
  * NULL semantics are explicit: a predicate evaluating to NULL
  * counts as a VIOLATION (unknown is not a pass) — the usual trap
  * where `col > 0` silently passes null rows is closed. Rules that
  * want to allow nulls say so (`c.isNull || c > 0`).
  */
object Expectations {

  final case class Rule(name: String, holds: Column)

  /** One row per rule: (rule, n_rows, n_violations, pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    require(rules.forall(!_.name.contains("`")),
      "rule names must not contain backticks")
    // backtick-quote the derived column references: a rule name with
    // a dot ("price.positive") would otherwise parse as a
    // nested-field path and fail resolution
    def vcol(r: Rule) = col(s"`_v_${r.name}`")
    val counts = df.agg(
      count(lit(1)).as("_n"),
      rules.map(r => sum(when(coalesce(r.holds, lit(false)), 0L)
        .otherwise(1L)).as(s"_v_${r.name}")): _*)
    counts.select(explode(array(rules.map(r => struct(
        lit(r.name).as("rule"),
        col("_n").as("n_rows"),
        coalesce(vcol(r), lit(0L)).as("n_violations"),
        (coalesce(vcol(r), lit(0L)) === 0L).as("pass"))): _*))
      .as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.n_violations").as("n_violations"), col("r.pass").as("pass"))
  }

  /** Gate: returns `df` untouched when every rule's violation count
    * is within `tolerance` (absolute rows, default 0), else raises
    * with the offending rules — evaluation happens when the caller
    * first acts on the returned frame's lineage... which would be
    * lazy and skippable, so this face is EAGER by design: the check
    * aggregate runs now, the corpus frame is returned for reuse. */
  def enforce(df: DataFrame, rules: Seq[Rule],
    tolerance: Long = 0L): DataFrame = {
    val bad = check(df, rules)
      .filter(col("n_violations") > tolerance)
      .select(col("rule"), col("n_violations"))
      .collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r =>
        s"${r.getString(0)} (${r.getLong(1)} violations)").mkString(", ")
      throw new IllegalStateException(
        s"Expectations breached beyond tolerance $tolerance: $detail")
    }
    df
  }
}
