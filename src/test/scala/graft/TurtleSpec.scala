package graft

import graft.ttl.Turtle
import graft.ttl.Turtle.Triple
import org.apache.spark.sql.functions._

class TurtleSpec extends SparkTestBase {
  import spark.implicits._

  test("serialize groups by subject with sorted predicates") {
    val ds = Seq(
      Triple("<urn:a>", "hal:z", "\"1\""),
      Triple("<urn:a>", "hal:b", "\"2\""),
      Triple("<urn:b>", "hal:x", "\"3\"")).toDS()
    val out = Turtle.serialize(ds).orderBy("s").collect()
      .map(_.getAs[String]("ttl"))
    assert(out(0) ==
      "<urn:a>\n    hal:b \"2\" ;\n    hal:z \"1\" .\n")
    assert(out(1) == "<urn:b>\n    hal:x \"3\" .\n")
  }

  test("serialization is deterministic under repartitioning") {
    val t = (1 to 50).map(i => Triple(s"<urn:${i % 5}>", s"p$i", s"\"$i\""))
    val a = Turtle.serialize(t.toDS().repartition(7)).orderBy("s")
      .collect().map(_.getString(1)).mkString
    val b = Turtle.serialize(t.toDS().repartition(2)).orderBy("s")
      .collect().map(_.getString(1)).mkString
    assert(a == b)
  }

  test("escapeLiteral handles quotes, backslashes, newlines") {
    val r = Seq("""he said "hi"\ there""" + "\nnext").toDF("s")
      .select(Turtle.strLit(col("s"))).collect().head.getString(0)
    assert(r == "\"he said \\\"hi\\\"\\\\ there\\nnext\"")
  }

  test("merge is union+distinct (graph merge semantics)") {
    val a = Seq(Triple("s", "p", "o"), Triple("s", "p2", "o")).toDS()
    val b = Seq(Triple("s", "p", "o"), Triple("s2", "p", "o")).toDS()
    assert(Turtle.merge(a, b).count() == 3)
  }

  test("serialize → write → read round-trips the triple set") {
    val triples = Seq(
      Triple("<urn:a>", "hal:z", "\"1\""),
      Triple("<urn:a>", "hal:b", "\"2\""),
      Triple("<urn:b>", "hal:x", "\"3\""),
      Triple("<urn:c>", "hal:y", "<urn:a>"))
    val dir = java.nio.file.Files.createTempDirectory("ttl_rt").toString
    Turtle.serialize(triples.toDS()).select("ttl")
      .coalesce(1).write.mode("overwrite").text(dir)
    val back = Turtle.read(spark, dir + "/*.txt").collect().toSet
    assert(back == triples.toSet)
  }

  test("N-Triples round-trip is splittable (line-based reader)") {
    val triples = (1 to 100)
      .map(i => Triple(s"<urn:$i>", "<urn:v>", s"\"$i\""))
    val dir = java.nio.file.Files.createTempDirectory("nt_rt").toString
    Turtle.serializeNTriples(triples.toDS()).toDF("value")
      .repartition(4).write.mode("overwrite").text(dir)
    val back = Turtle.readNTriples(spark, dir + "/*.txt").collect().toSet
    assert(back == triples.toSet)
  }

  test("serializeNTriples expands bare canonical tokens to TYPED " +
    "literals (mutation survivor T4: dropping the datatype turned " +
    "xsd:integer 1 into the plain string literal \"1\")") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val line = Turtle.serializeNTriples(
      Seq(Triple("<urn:s>", "<urn:p>", "1")).toDS()).collect().head
    assert(line == s"""<urn:s> <urn:p> "1"^^<${xsd}integer> .""", line)
    // and the typed spelling canonicalizes back to the bare token
    assert(Turtle.parseLine(line) ==
      Some(Triple("<urn:s>", "<urn:p>", "1")))
    val dline = Turtle.serializeNTriples(
      Seq(Triple("<urn:s>", "<urn:p>", "1.5E0")).toDS()).collect().head
    assert(dline == s"""<urn:s> <urn:p> "1.5E0"^^<${xsd}double> .""",
      dline)
    assert(Turtle.parseLine(dline) ==
      Some(Triple("<urn:s>", "<urn:p>", "1.5E0")))
  }

  test("serializeNTriples throws LOUD on an unterminated literal " +
    "term instead of emitting a line the reader cannot parse") {
    val e = intercept[org.apache.spark.SparkException](
      Turtle.serializeNTriples(
        Seq(Triple("<urn:s>", "<urn:p>", "\"abc")).toDS()).collect())
    assert(e.getMessage != null)
  }

  test("parseLine round-trips simple triples") {
    assert(Turtle.parseLine("<urn:a> <urn:b> \"2\" .") ==
      Some(Triple("<urn:a>", "<urn:b>", "\"2\"")))
    // malformed non-comment lines THROW (silent None would be data
    // loss the caller cannot see); blank/comment lines stay None
    intercept[IllegalArgumentException](Turtle.parseLine("garbage"))
    // prefixed names are Turtle syntax, not N-Triples — loud error
    intercept[IllegalArgumentException](
      Turtle.parseLine("<urn:a> hal:b \"2\" ."))
    assert(Turtle.parseLine("   ") == None)
    assert(Turtle.parseLine("# a comment") == None)
  }

  test("parseLine: whitespace RUNS and tabs are separators, not term " +
    "boundaries that corrupt") {
    // doubled space: must NOT produce an empty predicate
    assert(Turtle.parseLine("<urn:a>  <urn:p> <urn:o> .") ==
      Some(Triple("<urn:a>", "<urn:p>", "<urn:o>")))
    // tab-separated N-Triples are legal and must not be dropped
    assert(Turtle.parseLine("<urn:a>\t<urn:p>\t<urn:o> .") ==
      Some(Triple("<urn:a>", "<urn:p>", "<urn:o>")))
    // mixed run + tab before the statement dot
    assert(Turtle.parseLine("<urn:a> \t <urn:p>  \"v w\"\t.") ==
      Some(Triple("<urn:a>", "<urn:p>", "\"v w\"")))
    // quoted whitespace stays inside the literal (tabs included)
    assert(Turtle.parseLine("<urn:a> <urn:p> \"a\tb  c\" .") ==
      Some(Triple("<urn:a>", "<urn:p>", "\"a\tb  c\"")))
    // two terms only → loud, not a silent drop
    intercept[IllegalArgumentException](
      Turtle.parseLine("<urn:a> <urn:p> ."))
  }

  test("parseLine re-reads escapeLiteral's own output (quoted spaces, dots, quotes)") {
    import graft.ttl.TurtleParser
    val nasty = Seq(
      "plain words with spaces",
      """quoted "inner" words""",
      "trailing dot.",
      "semi ; colon",
      "back\\slash and \"quote\"",
      "newline\nand\rreturn",
      "ends with space ")
    for (v <- nasty) {
      // escape exactly as the engine serializes literals
      val line = Seq(v).toDF("s")
        .select(concat(lit("<urn:s> <urn:p> "), Turtle.strLit(col("s")),
          lit(" ."))).collect().head.getString(0)
      val t = Turtle.parseLine(line)
        .getOrElse(fail(s"parseLine failed on: $line"))
      assert(t.s == "<urn:s>" && t.p == "<urn:p>")
      // the object term must be the full quoted literal…
      assert(t.o.startsWith("\"") && t.o.endsWith("\""), t.o)
      // …and unescape to the original value
      assert(TurtleParser.unescape(t.o.substring(1, t.o.length - 1)) == v)
    }
  }
}
