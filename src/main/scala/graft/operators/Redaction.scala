package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: scrub structured
  * identifiers (emails, SSN-shaped ids, phone-shaped numbers) from a
  * text column and count what was removed — the pre-training scrub
  * pass every corpus pipeline runs before packing.
  *
  * Rules apply IN ORDER (more specific first: an SSN-shaped id must
  * be consumed before a phone rule could eat its tail), each as one
  * codegen'd `regexp_replace` — a narrow map over the scan, no
  * shuffle, no UDF. Patterns are deliberately restricted to the
  * regex subset Java and RE2 agree on (character classes, bounded
  * repetition, no lookaround), so the same rule set replays in any
  * RE2-based engine and in the DuckDB oracle.
  */
object Redaction {

  /** One redaction rule: `name` labels the count column
    * (`n_<name>`), `pattern` matches, `replacement` substitutes. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Lower-case email addresses. */
  val Email: Rule = Rule("email",
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]")

  /** US-SSN-shaped ids (ddd-dd-dddd). */
  val Ssn: Rule = Rule("ssn",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}", "[ID]")

  /** Phone-shaped numbers (ddd-dddd); after `Ssn` in the default
    * order so it never bites an SSN's tail. */
  val Phone: Rule = Rule("phone",
    "[0-9]{3}-[0-9]{4}", "[PHONE]")

  val DefaultRules: Seq[Rule] = Seq(Email, Ssn, Phone)

  /** Adds `<textCol>_redacted` plus one `n_<rule>` count column per
    * rule. Counts are measured BEFORE that rule's replacement on the
    * progressively-redacted text, mirroring the sequential semantics
    * exactly (a later rule never counts text an earlier rule already
    * consumed). */
  def redact(df: DataFrame, textCol: String,
    rules: Seq[Rule] = DefaultRules): DataFrame = {
    require(rules.nonEmpty, "redact needs at least one rule")
    val names = rules.map(r => s"n_${r.name}") :+ s"${textCol}_redacted"
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with redaction " +
        "output columns — rename before redacting")
    val (out, counts) = rules.foldLeft((col(textCol), Seq.empty[Column])) {
      case ((text, acc), r) =>
        val n = regexp_count(text, lit(r.pattern)).cast("long")
          .as(s"n_${r.name}")
        (regexp_replace(text, r.pattern, r.replacement), acc :+ n)
    }
    df.select(col("*") +: counts :+
      out.as(s"${textCol}_redacted"): _*)
  }
}
