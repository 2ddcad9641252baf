package graft

import graft.ttl.Turtle.Triple
import graft.ttl.TurtleParser
import java.nio.file.{Files, Paths}

class TurtleParserSpec extends SparkTestBase {

  private def golden(name: String): String =
    Files.readString(Paths.get(s"src/test/resources/golden/$name"))

  test("parses a hand-built document with every supported construct") {
    val doc =
      """@prefix ex: <http://example.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |# a comment
        |ex:s a ex:Thing ;                  # inline comment
        |  ex:name "with \"quotes\" and spaces" ;
        |  ex:multi "line1\nline2" ;
        |  ex:num 42 ;
        |  ex:dec 12.5 ;
        |  ex:flag true ;
        |  ex:tagged "bonjour"@fr ;
        |  ex:typed "7"^^xsd:int ;
        |  ex:both <http://a.example/x> , ex:y .
        |<> ex:nested [ a ex:Inner ; ex:v "deep" ; ex:more [ ex:v2 "deeper" ] ] .
        |""".stripMargin
    val ts = TurtleParser.parse(doc)
    val ex = "http://example.org/"
    assert(ts.contains(Triple(s"<${ex}s>", TurtleParser.RdfType,
      s"<${ex}Thing>")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}name>",
      "\"with \\\"quotes\\\" and spaces\"")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}multi>",
      "\"line1\\nline2\"")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}num>", "42")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}dec>", "12.5")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}flag>", "true")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}tagged>",
      "\"bonjour\"@fr")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}typed>",
      "\"7\"^^<http://www.w3.org/2001/XMLSchema#int>")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}both>",
      "<http://a.example/x>")))
    assert(ts.contains(Triple(s"<${ex}s>", s"<${ex}both>", s"<${ex}y>")))
    // nested blank nodes: <> → _:b0 → _:b1, labels consistent
    val outer = ts.find(t => t.s == "<>" && t.p == s"<${ex}nested>").get.o
    assert(ts.contains(Triple(outer, TurtleParser.RdfType, s"<${ex}Inner>")))
    assert(ts.contains(Triple(outer, s"<${ex}v>", "\"deep\"")))
    val inner = ts.find(t => t.s == outer && t.p == s"<${ex}more>").get.o
    assert(ts.contains(Triple(inner, s"<${ex}v2>", "\"deeper\"")))
  }

  test("round-trips the engine's golden TTL outputs (all five files)") {
    for (f <- Seq("geojson_expected.ttl", "seg_expected.ttl",
      "seg_expected_fallback.ttl", "mongo_batch_000001.ttl",
      "mongo_batch_000002.ttl")) {
      val ts = TurtleParser.parse(golden(f))
      assert(ts.size > 10, s"$f: only ${ts.size} triples")
      // every subject/object blank label introduced is used consistently
      val labels = ts.map(_.s).filter(_.startsWith("_:")).toSet
      assert(labels.forall(l => ts.exists(t => t.o == l)),
        s"$f: orphan blank node")
    }
  }

  test("golden geojson: known triples and cross-references survive parsing") {
    val ts = TurtleParser.parse(golden("geojson_expected.ttl"))
    val img = ts.find(t =>
      t.p == "<http://purl.org/dc/terms/identifier>" &&
        t.o == "\"TCGA-AA-1111-01Z-00-DX1\"").get.s
    assert(img.startsWith("<urn:sha256:"))
    // the prov:Activity blank node points back at the image subject
    val act = ts.find(t =>
      t.p == "<http://www.w3.org/ns/prov#used>" && t.o == img).get.s
    assert(act.startsWith("_:"))
    assert(ts.contains(Triple(act, TurtleParser.RdfType,
      "<http://www.w3.org/ns/prov#Activity>")))
    // WKT literals with inner commas/parens stay intact
    assert(ts.exists(t => t.o.startsWith("\"POLYGON ((") &&
      t.o.endsWith(
        "\"^^<http://www.opengis.net/ont/geosparql#wktLiteral>")))
  }

  test("golden mongo batch: nested feature collection structure") {
    val ts = TurtleParser.parse(golden("mongo_batch_000001.ttl"))
    val hal = "https://halcyon.is/ns/"
    // image → feature collection → features, three levels of bnodes
    val fc = ts.filter(t => t.p == s"<${hal}hasFeatureCollection>")
    assert(fc.size == 1)
    val members = ts.filter(t => t.s == fc.head.o &&
      t.p == "<http://www.opengis.net/ont/geosparql#hasMember>")
    assert(members.size == 2)
    assert(ts.contains(Triple(members.head.o, s"<${hal}markId>",
      "\"m-001\"")))
    // bare numerics parse as bare tokens
    assert(ts.exists(t => t.p == s"<${hal}footprint>" && t.o == "12.5"))
  }

  test("readTurtle loads golden files distributed (one task per file)") {
    val ds = TurtleParser.readTurtle(spark,
      "src/test/resources/golden/*.ttl")
    assert(ds.count() > 100)
  }

  test("unescape inverts escape (incl. tab/unicode escapes)") {
    val vals = Seq("a\"b", "a\\b", "line\nbreak\r", "plain",
      "tab\there")
    for (v <- vals)
      assert(TurtleParser.unescape(TurtleParser.escape(v)) == v)
    assert(TurtleParser.unescape("\\u0041\\U00000042c") == "ABc")
    assert(TurtleParser.unescape("\\t\\b\\f\\'") == "\t\b\f'")
  }

  test("malformed input fails loudly with position info") {
    val e = intercept[IllegalArgumentException] {
      TurtleParser.parse("ex:s ex:p \"unclosed .")
    }
    assert(e.getMessage.contains("offset"))
    // truncated @prefix must throw, not loop forever
    intercept[IllegalArgumentException] {
      TurtleParser.parse("@prefix ex")
    }
    // truncated/malformed \u escapes throw the documented exception
    intercept[IllegalArgumentException] { TurtleParser.unescape("a\\u12") }
    intercept[IllegalArgumentException] { TurtleParser.unescape("\\uZZZZ") }
  }

  test("explicit _:bN labels never collide with generated [ ] labels") {
    val doc =
      """@prefix ex: <http://example.org/> .
        |_:b0 ex:p "explicit" .
        |ex:s ex:q [ ex:r "anon" ] .
        |_:b0 ex:p2 "same node" .
        |""".stripMargin
    val ts = TurtleParser.parse(doc)
    val explicitNode = ts.find(_.o == "\"explicit\"").get.s
    val anonNode = ts.find(_.o == "\"anon\"").get.s
    assert(explicitNode != anonNode,
      s"distinct blank nodes merged into $anonNode")
    // and the explicit label stays one node across statements
    assert(ts.find(_.o == "\"same node\"").get.s == explicitNode)
  }

  test("grammar edges: label abutting '.', standalone [ ] statement") {
    val ts = TurtleParser.parse(
      """@prefix ex: <http://example.org/> .
        |ex:s ex:p _:b1.
        |_:b1 ex:q "v" .
        |[ ex:a "standalone" ] .
        |""".stripMargin)
    val label = ts.find(t => t.p == "<http://example.org/p>").get.o
    assert(ts.exists(t => t.s == label && t.o == "\"v\""))
    assert(ts.exists(_.o == "\"standalone\""))
  }

  test("long and single-quoted literal forms parse to canonical terms") {
    // rdflib's turtle serializer emits """…""" for literals containing
    // newlines — raw newlines and 1–2 unescaped quotes are legal inside
    val q3 = "\"\"\""
    val doc =
      "@prefix ex: <http://example.org/> .\n" +
        "ex:s ex:long " + q3 + "line1\nline2 with \"quotes\" and " +
        "\"\"two\"\" inside" + q3 + " ;\n" +
        "  ex:short 'single form' ;\n" +
        "  ex:longsingle '''also\nmulti''' ;\n" +
        "  ex:typedlong " + q3 + "42" + q3 +
        "^^<http://www.w3.org/2001/XMLSchema#integer> ;\n" +
        "  ex:tagged '''salut'''@fr ;\n" +
        "  ex:empty \"\" ;\n" +
        "  ex:emptyl '' .\n"
    val ts = TurtleParser.parse(doc)
    val ex = "http://example.org/"
    def obj(p: String) = ts.find(_.p == s"<$ex$p>").get.o
    assert(obj("long") ==
      "\"line1\\nline2 with \\\"quotes\\\" and \\\"\\\"two\\\"\\\" inside\"")
    assert(obj("short") == "\"single form\"")
    assert(obj("longsingle") == "\"also\\nmulti\"")
    assert(obj("typedlong") == "42") // canonTyped → bare integer
    assert(obj("tagged") == "\"salut\"@fr")
    assert(obj("empty") == "\"\"")
    assert(obj("emptyl") == "\"\"")
  }

  test("long literals close longest-match: content may end in quotes") {
    // per the Turtle grammar the closing delimiter is the LAST three
    // quotes of a run — """a"""" is the string a" (and '''b''''' is
    // b''), not a close-plus-stray-quote
    val one = TurtleParser.parse("<urn:s> <urn:p> \"\"\"a\"\"\"\" .")
    assert(one == TurtleParser.parse("<urn:s> <urn:p> \"a\\\"\" ."))
    val two = TurtleParser.parse("<urn:s> <urn:p> '''b''''' .")
    assert(two == TurtleParser.parse("<urn:s> <urn:p> \"b''\" ."))
    // the next token after the close is still read correctly
    val typed = TurtleParser.parse(
      "<urn:s> <urn:p> \"\"\"7\"\"\"\"^^<http://www.w3.org/2001/XMLSchema#string> .")
    assert(typed.head.o ==
      "\"7\\\"\"^^<http://www.w3.org/2001/XMLSchema#string>")
  }

  test("long literals re-read the engine's own escaped output") {
    // serialize a newline literal, embed it in a long form by hand,
    // and make sure short-escaped and long-raw spellings parse equal
    val viaShort = TurtleParser.parse(
      "<urn:s> <urn:p> \"a\\nb\" .")
    val viaLong = TurtleParser.parse(
      "<urn:s> <urn:p> \"\"\"a\nb\"\"\" .")
    assert(viaShort == viaLong)
  }
}
