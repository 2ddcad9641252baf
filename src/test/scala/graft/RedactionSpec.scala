package graft

import graft.operators.Redaction

class RedactionSpec extends SparkTestBase {
  import spark.implicits._

  test("default rules scrub email, ssn and phone with counts") {
    val df = Seq((1L,
      "mail bob.smith@example.org id 123-45-6789 call 555-0199 end"))
      .toDF("id", "t")
    val r = Redaction.redact(df, "t").collect().head
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_ssn") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L)
    assert(r.getAs[String]("t_redacted") ==
      "mail [EMAIL] id [ID] call [PHONE] end")
  }

  test("rule order is sequential: phone never bites an ssn's tail") {
    val df = Seq((1L, "only 987-65-4321 here")).toDF("id", "t")
    val r = Redaction.redact(df, "t").collect().head
    assert(r.getAs[Long]("n_ssn") == 1L)
    assert(r.getAs[Long]("n_phone") == 0L)
    assert(r.getAs[String]("t_redacted") == "only [ID] here")
  }

  test("counts measure the progressively-redacted text") {
    // after the email is consumed, its digits cannot feed later rules
    val df = Seq((1L, "x 123-4567@mail.com y")).toDF("id", "t")
    val r = Redaction.redact(df, "t").collect().head
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 0L)
  }

  test("multiple occurrences are all counted and replaced") {
    val df = Seq((1L, "a@b.co c@d.org and 111-2222 222-3333"))
      .toDF("id", "t")
    val r = Redaction.redact(df, "t").collect().head
    assert(r.getAs[Long]("n_email") == 2L)
    assert(r.getAs[Long]("n_phone") == 2L)
    assert(r.getAs[String]("t_redacted") ==
      "[EMAIL] [EMAIL] and [PHONE] [PHONE]")
  }

  test("custom rules apply in caller order") {
    val rules = Seq(
      Redaction.Rule("digits", "[0-9]+", "#"),
      Redaction.Rule("hash", "#", "@"))
    val r = Redaction.redact(Seq((1L, "a 42 b")).toDF("id", "t"),
      "t", rules).collect().head
    assert(r.getAs[Long]("n_digits") == 1L)
    assert(r.getAs[Long]("n_hash") == 1L) // counts the '#' rule 1 left
    assert(r.getAs[String]("t_redacted") == "a @ b")
  }

  test("output column collisions and empty rule sets are rejected") {
    val df = Seq((1L, "x")).toDF("n_email", "t")
    intercept[IllegalArgumentException](Redaction.redact(df, "t"))
    intercept[IllegalArgumentException](
      Redaction.redact(Seq((1L, "x")).toDF("id", "t"), "t", Seq.empty))
  }
}
