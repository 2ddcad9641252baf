package graft

import graft.ttl.{JsonLd, Rdf, RdfXml, TurtleParser}
import graft.ttl.Turtle.Triple

class RdfFormatsSpec extends SparkTestBase {

  private val bnodeFree = Seq(
    Triple("<urn:a>", "<http://ex.org/p>", "\"plain words\""),
    Triple("<urn:a>", "<http://ex.org/q>",
      "\"7\"^^<http://www.w3.org/2001/XMLSchema#int>"),
    Triple("<urn:a>", "<http://ex.org/r>", "\"bonjour\"@fr"),
    Triple("<urn:a>", "<http://ex.org/s>", "<urn:b>"),
    Triple("<urn:b>", "<http://ex.org/t>", "\"with \\\"quotes\\\" & <xml>\""),
    Triple("<urn:b>", TurtleParser.RdfType, "<http://ex.org/Thing>"))

  test("RDF/XML write → parse round-trips canonical triples exactly") {
    val xml = RdfXml.write(bnodeFree)
    assert(RdfXml.parse(xml).toSet == bnodeFree.toSet)
  }

  test("JSON-LD write → parse round-trips canonical triples exactly") {
    val json = JsonLd.write(bnodeFree)
    assert(JsonLd.parse(json).toSet == bnodeFree.toSet)
  }

  test("N-Triples and Turtle serializations of one graph parse equal") {
    val nt = Rdf.serialize(bnodeFree, "nt")
    val ttl = Rdf.serialize(bnodeFree, "turtle")
    val fromNt = nt.linesIterator.flatMap(graft.ttl.Turtle.parseLine)
      .toSet
    val fromTtl = TurtleParser.parse(ttl).toSet
    assert(fromNt == bnodeFree.toSet)
    assert(fromTtl == bnodeFree.toSet)
  }

  test("blank-node graphs keep their shape across XML and JSON-LD") {
    val g = Seq(
      Triple("<urn:doc>", "<http://ex.org/author>", "_:b0"),
      Triple("_:b0", "<http://ex.org/name>", "\"Ada\""),
      Triple("_:b0", "<http://ex.org/org>", "_:b1"),
      Triple("_:b1", "<http://ex.org/label>", "\"Lab\""))
    for (fmt <- Seq("xml", "json-ld")) {
      val back = fmt match {
        case "xml" => RdfXml.parse(Rdf.serialize(g, fmt))
        case _ => JsonLd.parse(Rdf.serialize(g, fmt))
      }
      assert(back.size == g.size, s"$fmt: ${back.size} triples")
      val author = back.find(_.p == "<http://ex.org/author>").get.o
      assert(author.startsWith("_:"), s"$fmt: $author")
      assert(back.contains(Triple(author, "<http://ex.org/name>",
        "\"Ada\"")), s"$fmt")
      val org = back.find(t => t.s == author &&
        t.p == "<http://ex.org/org>").get.o
      assert(back.contains(Triple(org, "<http://ex.org/label>",
        "\"Lab\"")), s"$fmt")
    }
  }

  test("parses hand-written RDF/XML (typed nodes, nesting, datatypes)") {
    val xml =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <ex:Image rdf:about="urn:img1">
        |    <ex:width rdf:datatype="http://www.w3.org/2001/XMLSchema#int">40000</ex:width>
        |    <ex:creator>
        |      <ex:Person><ex:name xml:lang="en">Grace</ex:name></ex:Person>
        |    </ex:creator>
        |    <ex:seeAlso rdf:resource="urn:img2"/>
        |  </ex:Image>
        |</rdf:RDF>""".stripMargin
    val ts = RdfXml.parse(xml)
    assert(ts.contains(Triple("<urn:img1>", TurtleParser.RdfType,
      "<http://ex.org/Image>")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/width>",
      "\"40000\"^^<http://www.w3.org/2001/XMLSchema#int>")))
    val person = ts.find(_.p == "<http://ex.org/creator>").get.o
    assert(person.startsWith("_:"))
    assert(ts.contains(Triple(person, "<http://ex.org/name>",
      "\"Grace\"@en")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/seeAlso>",
      "<urn:img2>")))
  }

  test("parses hand-written JSON-LD (@context, @graph, typed values)") {
    val json =
      """{
        |  "@context": {"ex": "http://ex.org/", "name": "http://ex.org/name"},
        |  "@graph": [
        |    {"@id": "urn:img1", "@type": "ex:Image",
        |     "ex:width": {"@value": "40000",
        |       "@type": "http://www.w3.org/2001/XMLSchema#int"},
        |     "name": "slide one",
        |     "ex:count": 42,
        |     "ex:seeAlso": {"@id": "urn:img2"}},
        |    {"@id": "urn:img2", "name": {"@value": "deux", "@language": "fr"}}
        |  ]
        |}""".stripMargin
    val ts = JsonLd.parse(json)
    assert(ts.contains(Triple("<urn:img1>", TurtleParser.RdfType,
      "<http://ex.org/Image>")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/width>",
      "\"40000\"^^<http://www.w3.org/2001/XMLSchema#int>")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/name>",
      "\"slide one\"")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/count>", "42")))
    assert(ts.contains(Triple("<urn:img1>", "<http://ex.org/seeAlso>",
      "<urn:img2>")))
    assert(ts.contains(Triple("<urn:img2>", "<http://ex.org/name>",
      "\"deux\"@fr")))
  }

  test("Rdf.load dispatches by format over files (distributed)") {
    val dir = java.nio.file.Files.createTempDirectory("rdf_fmt")
    java.nio.file.Files.writeString(dir.resolve("g.xml"),
      RdfXml.write(bnodeFree))
    java.nio.file.Files.writeString(dir.resolve("g.jsonld"),
      JsonLd.write(bnodeFree))
    assert(Rdf.load(spark, dir.toString + "/g.xml", "xml")
      .collect().toSet == bnodeFree.toSet)
    assert(Rdf.load(spark, dir.toString + "/g.jsonld", "json-ld")
      .collect().toSet == bnodeFree.toSet)
    intercept[IllegalArgumentException] {
      Rdf.load(spark, dir.toString, "trig")
    }
  }

  test("unsupported JSON-LD keywords fail loudly (no silent mis-reads)") {
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@id": "urn:x", "@reverse": {"p": {"@id": "urn:y"}}}""")
    }
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": "http://remote.ctx/", "@id": "urn:x"}""")
    }
  }
}
