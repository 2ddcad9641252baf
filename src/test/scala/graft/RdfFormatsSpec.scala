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
    Triple("<urn:b>", TurtleParser.RdfType, "<http://ex.org/Thing>"),
    // bare tokens — one canonical spelling per RDF term in EVERY format
    Triple("<urn:b>", "<http://ex.org/n>", "42"),
    Triple("<urn:b>", "<http://ex.org/d>", "12.5"),
    Triple("<urn:b>", "<http://ex.org/f>", "true"))

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

  test("foreign JSON-LD: remapped @context with expanded term definitions") {
    // the shape a third-party dataset ships: vocab default, base for
    // relative ids, array-form context, coercions, per-term language
    val json =
      """{
        |  "@context": [
        |    {"@vocab": "http://schema.org/",
        |     "@base": "http://data.example/items/",
        |     "@language": "en",
        |     "dc": "http://purl.org/dc/terms/"},
        |    {"creator": {"@id": "dc:creator", "@type": "@id"},
        |     "issued": {"@id": "dc:issued",
        |       "@type": "http://www.w3.org/2001/XMLSchema#date"},
        |     "notes": {"@id": "dc:description", "@language": null},
        |     "titre": {"@id": "dc:title", "@language": "fr"}}
        |  ],
        |  "@graph": [
        |    {"@id": "item1", "@type": "Book",
        |     "name": "The Name",
        |     "titre": "Le Nom",
        |     "notes": "no language here",
        |     "creator": "people/42",
        |     "issued": "2020-01-02"}
        |  ]
        |}""".stripMargin
    val ts = JsonLd.parse(json).toSet
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      TurtleParser.RdfType, "<http://schema.org/Book>")))
    // @vocab term + context default @language
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      "<http://schema.org/name>", "\"The Name\"@en")))
    // per-term @language override
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      "<http://purl.org/dc/terms/title>", "\"Le Nom\"@fr")))
    // per-term @language: null clears the default
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      "<http://purl.org/dc/terms/description>", "\"no language here\"")))
    // @type: "@id" coercion resolves the string against @base
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      "<http://purl.org/dc/terms/creator>",
      "<http://data.example/items/people/42>")))
    // datatype coercion
    assert(ts.contains(Triple("<http://data.example/items/item1>",
      "<http://purl.org/dc/terms/issued>",
      "\"2020-01-02\"^^<http://www.w3.org/2001/XMLSchema#date>")))
  }

  test("JSON-LD context null entries and @set containers") {
    val json =
      """{
        |  "@context": {"@vocab": "http://v.example/",
        |    "gone": null,
        |    "tags": {"@id": "http://v.example/tag", "@container": "@set"}},
        |  "@id": "urn:x",
        |  "tags": ["a", "b"],
        |  "gone:suffix": "uses-vocab-not-term"
        |}""".stripMargin
    val ts = JsonLd.parse(json).toSet
    assert(ts.contains(Triple("<urn:x>", "<http://v.example/tag>", "\"a\"")))
    assert(ts.contains(Triple("<urn:x>", "<http://v.example/tag>", "\"b\"")))
    // unknown container maps stay rejected
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": {"t": {"@id": "http://v/x",
        "@container": "@graph"}}, "@id": "urn:y", "t": {"i": "a"}}""")
    }
  }

  test("JSON-LD @language and @index container maps") {
    // language map → language-tagged literals; @none = untagged
    val ts = JsonLd.parse(
      """{"@context": {"label": {"@id": "http://ex.org/label",
        |  "@container": "@language"}},
        |"@id": "urn:s",
        |"label": {"en": "cat", "de": ["Katze", "Kater"],
        |  "@none": "plain"}}""".stripMargin).toSet
    assert(ts == Set(
      Triple("<urn:s>", "<http://ex.org/label>", "\"cat\"@en"),
      Triple("<urn:s>", "<http://ex.org/label>", "\"Katze\"@de"),
      Triple("<urn:s>", "<http://ex.org/label>", "\"Kater\"@de"),
      Triple("<urn:s>", "<http://ex.org/label>", "\"plain\"")))
    // a non-string language-map value throws
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": {"l": {"@id": "http://v/l",
        "@container": "@language"}}, "@id": "urn:x", "l": {"en": 3}}""")
    }
    // index map: keys dropped, values (incl. coerced) processed
    val ti = JsonLd.parse(
      """{"@context": {"post": {"@id": "http://ex.org/post",
        |  "@container": "@index", "@type": "@id"}},
        |"@id": "urn:b",
        |"post": {"2024": "urn:p1", "2025": ["urn:p2", "urn:p3"]}}"""
        .stripMargin).toSet
    assert(ti == Set(
      Triple("<urn:b>", "<http://ex.org/post>", "<urn:p1>"),
      Triple("<urn:b>", "<http://ex.org/post>", "<urn:p2>"),
      Triple("<urn:b>", "<http://ex.org/post>", "<urn:p3>")))
    // @language container cannot combine with @type coercion
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": {"l": {"@id": "http://v/l",
        "@container": "@language", "@type": "@id"}}, "@id": "urn:x"}""")
    }
  }

  test("unsupported JSON-LD keywords fail loudly (no silent mis-reads)") {
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": "http://remote.ctx/", "@id": "urn:x"}""")
    }
    // a literal cannot occupy the subject position of a reversed triple
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@id": "urn:x", "@reverse": {"p": "just a string?"}}""")
    }
    // @reverse term + @list container is invalid JSON-LD
    intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": {"t": {"@reverse": "http://v/x",
        "@container": "@list"}}, "@id": "urn:y", "t": ["a"]}""")
    }
  }

  test("JSON-LD @reverse keyword and reverse terms emit flipped triples") {
    // node-object keyword form
    val ts = JsonLd.parse(
      """{"@id": "urn:x",
        |"@reverse": {"http://ex.org/parentOf": [{"@id": "urn:y"},
        |  {"@id": "urn:z", "http://ex.org/label": "zee"}]}}"""
        .stripMargin).toSet
    assert(ts == Set(
      Triple("<urn:y>", "<http://ex.org/parentOf>", "<urn:x>"),
      Triple("<urn:z>", "<http://ex.org/parentOf>", "<urn:x>"),
      Triple("<urn:z>", "<http://ex.org/label>", "\"zee\"")))
    // reverse TERM definition: values become subjects
    val ts2 = JsonLd.parse(
      """{"@context": {"children": {"@reverse": "http://ex.org/parentOf"}},
        |"@id": "urn:p", "children": ["urn:c1", {"@id": "urn:c2"}]}"""
        .stripMargin).toSet
    assert(ts2 == Set(
      Triple("<urn:c1>", "<http://ex.org/parentOf>", "<urn:p>"),
      Triple("<urn:c2>", "<http://ex.org/parentOf>", "<urn:p>")))
    // reverse term used INSIDE @reverse flips back to forward
    val ts3 = JsonLd.parse(
      """{"@context": {"children": {"@reverse": "http://ex.org/parentOf"}},
        |"@id": "urn:p", "@reverse": {"children": {"@id": "urn:q"}}}"""
        .stripMargin).toSet
    assert(ts3 == Set(
      Triple("<urn:p>", "<http://ex.org/parentOf>", "<urn:q>")))
  }

  test("JSON-LD @list container wraps term values in a collection") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val ts = JsonLd.parse(
      """{"@context": {"steps": {"@id": "http://ex.org/steps",
        |  "@container": "@list", "@type": "@id"}},
        |"@id": "urn:s", "steps": ["urn:a", "urn:b"]}""".stripMargin)
      .toSet
    val head = ts.find(_.p == "<http://ex.org/steps>").get.o
    // item coercion applies inside the list: IRIs, not strings
    assert(ts.contains(Triple(head, s"<${rdfNs}first>", "<urn:a>")))
    val c2 = ts.find(t => t.s == head && t.p == s"<${rdfNs}rest>").get.o
    assert(ts.contains(Triple(c2, s"<${rdfNs}first>", "<urn:b>")))
    assert(ts.contains(Triple(c2, s"<${rdfNs}rest>", s"<${rdfNs}nil>")))
    // a single (non-array) value is a one-element list
    val one = JsonLd.parse(
      """{"@context": {"t": {"@id": "http://ex.org/t",
        |  "@container": "@list"}},
        |"@id": "urn:u", "t": "only"}""".stripMargin).toSet
    val h1 = one.find(_.p == "<http://ex.org/t>").get.o
    assert(one.contains(Triple(h1, s"<${rdfNs}first>", "\"only\"")))
    assert(one.contains(Triple(h1, s"<${rdfNs}rest>", s"<${rdfNs}nil>")))
  }

  test("@list + @reverse round-trip through the serializer") {
    val ts = JsonLd.parse(
      """{"@context": {"children": {"@reverse": "http://ex.org/parentOf"},
        |  "steps": {"@id": "http://ex.org/steps", "@container": "@list"}},
        |"@id": "urn:p", "children": "urn:c",
        |"steps": ["one", "two"]}""".stripMargin)
    // triples survive Turtle and N-Triples serialization + reparse
    // (bnode labels are positional, so compare via the nt round trip)
    val nt = Rdf.serialize(ts, "nt")
    assert(TurtleParser.parse(nt).toSet == ts.toSet)
    val ttl = Rdf.serialize(ts, "turtle")
    assert(TurtleParser.parse(ttl).toSet == ts.toSet)
  }

  test("a JSON-LD reference object carrying properties keeps its triples") {
    val ts = JsonLd.parse(
      """{"@id": "urn:a",
        |"http://ex.org/seeAlso": {"@id": "urn:b",
        |  "http://ex.org/label": "two"}}""".stripMargin)
    assert(ts.toSet == Set(
      Triple("<urn:a>", "<http://ex.org/seeAlso>", "<urn:b>"),
      Triple("<urn:b>", "<http://ex.org/label>", "\"two\"")))
  }

  test("XXE: DOCTYPE with SYSTEM entity is rejected, not resolved") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:a"><ex:p>&x;</ex:p></rdf:Description>
        |</rdf:RDF>""".stripMargin
    intercept[Exception] { RdfXml.parse(evil) }
  }

  test("rdf:parseType=Resource and Collection parse; Literal fails loudly") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val doc =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:a">
        |    <ex:author rdf:parseType="Resource"><ex:name>Ada</ex:name></ex:author>
        |    <ex:tags rdf:parseType="Collection">
        |      <rdf:Description rdf:about="urn:t1"/>
        |      <rdf:Description rdf:about="urn:t2"/>
        |    </ex:tags>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val ts = RdfXml.parse(doc)
    val author = ts.find(_.p == "<http://ex.org/author>").get.o
    assert(author.startsWith("_:"))
    assert(ts.contains(Triple(author, "<http://ex.org/name>", "\"Ada\"")))
    // collection: urn:a -ex:tags-> cell1 -first-> t1, -rest-> cell2 …
    val head = ts.find(_.p == "<http://ex.org/tags>").get.o
    assert(ts.contains(Triple(head, s"<${rdfNs}first>", "<urn:t1>")))
    val cell2 = ts.find(t => t.s == head && t.p == s"<${rdfNs}rest>").get.o
    assert(ts.contains(Triple(cell2, s"<${rdfNs}first>", "<urn:t2>")))
    assert(ts.contains(Triple(cell2, s"<${rdfNs}rest>", s"<${rdfNs}nil>")))

    val lit =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:a">
        |    <ex:body rdf:parseType="Literal"><b>markup</b></ex:body>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val e = intercept[IllegalArgumentException] { RdfXml.parse(lit) }
    assert(e.getMessage.contains("Literal"))

    // Resource/Collection with TEXT bodies must throw, not drop the text
    val textBody =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:a">
        |    <ex:p rdf:parseType="Resource">loose text</ex:p>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val e2 = intercept[IllegalArgumentException] { RdfXml.parse(textBody) }
    assert(e2.getMessage.contains("loose text"))

    // rdf:li containers stay a loud error
    val li =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:a">
        |    <rdf:li rdf:resource="urn:m1"/>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val e3 = intercept[IllegalArgumentException] { RdfXml.parse(li) }
    assert(e3.getMessage.contains("rdf:li"))
  }

  test("collection chains get identical labels from all three formats") {
    // one-element list whose item is itself a blank node: label
    // allocation order (items before cells) must match across readers
    val fromTtl = TurtleParser.parse(
      """@prefix ex: <http://ex.org/> .
        |ex:s ex:tags ( [ ex:a "1" ] ) .""".stripMargin).toSet
    val fromXml = RdfXml.parse(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="http://ex.org/s">
        |    <ex:tags rdf:parseType="Collection">
        |      <rdf:Description><ex:a>1</ex:a></rdf:Description>
        |    </ex:tags>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin).toSet
    val fromJson = JsonLd.parse(
      """{"@id": "http://ex.org/s",
        |"http://ex.org/tags": {"@list": [{"http://ex.org/a": "1"}]}}"""
        .stripMargin).toSet
    assert(fromTtl == fromXml, s"ttl=$fromTtl\nxml=$fromXml")
    assert(fromTtl == fromJson, s"ttl=$fromTtl\njson=$fromJson")
  }

  test("JSON-LD @list becomes the same rdf:first/rest chain") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val ts = JsonLd.parse(
      """{"@id": "urn:s",
        |"http://ex.org/tags": {"@list": [{"@id": "urn:t1"}, "two"]},
        |"http://ex.org/none": {"@list": []}}""".stripMargin)
    assert(ts.contains(Triple("<urn:s>", "<http://ex.org/none>",
      s"<${rdfNs}nil>")))
    val head = ts.find(_.p == "<http://ex.org/tags>").get.o
    assert(ts.contains(Triple(head, s"<${rdfNs}first>", "<urn:t1>")))
    val c2 = ts.find(t => t.s == head && t.p == s"<${rdfNs}rest>").get.o
    assert(ts.contains(Triple(c2, s"<${rdfNs}first>", "\"two\"")))
    assert(ts.contains(Triple(c2, s"<${rdfNs}rest>", s"<${rdfNs}nil>")))
  }

  test("Turtle collections become rdf:first/rest chains") {
    import graft.ttl.Turtle.{Triple => T}
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val ts = TurtleParser.parse(
      """@prefix ex: <http://ex.org/> .
        |ex:s ex:list ( 1 2 3 ) ; ex:empty () .
        |""".stripMargin)
    assert(ts.contains(T("<http://ex.org/s>", "<http://ex.org/empty>",
      s"<${rdfNs}nil>")))
    val head = ts.find(_.p == "<http://ex.org/list>").get.o
    // walk the chain: 1 → 2 → 3 → nil
    def first(cell: String) =
      ts.find(t => t.s == cell && t.p == s"<${rdfNs}first>").get.o
    def rest(cell: String) =
      ts.find(t => t.s == cell && t.p == s"<${rdfNs}rest>").get.o
    assert(first(head) == "1")
    val c2 = rest(head)
    assert(first(c2) == "2")
    val c3 = rest(c2)
    assert(first(c3) == "3" && rest(c3) == s"<${rdfNs}nil>")
  }

  test("predicates with no XML-safe local name are rejected by the writer") {
    val e = intercept[IllegalArgumentException] {
      RdfXml.write(Seq(Triple("<urn:a>", "<http://ex.org/123>", "\"x\"")))
    }
    assert(e.getMessage.contains("local name"))
    // but a digit-containing (not digit-leading) local part is fine
    val ok = RdfXml.write(Seq(
      Triple("<urn:a>", "<http://ex.org/v2>", "\"x\"")))
    assert(RdfXml.parse(ok).head.p == "<http://ex.org/v2>")
  }

  test("typed xsd:integer literals and bare tokens canonicalize identically") {
    // "42"^^xsd:integer IS the bare token 42 — one spelling everywhere
    val ts = TurtleParser.parse(
      """@prefix ex: <http://example.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ex:s ex:a 42 ; ex:b "42"^^xsd:integer ;
        |  ex:c "007"^^xsd:integer ; ex:d "x"^^xsd:integer .""".stripMargin)
    assert(ts.find(_.p == "<http://example.org/a>").get.o == "42")
    assert(ts.find(_.p == "<http://example.org/b>").get.o == "42")
    // leading zeros are still a valid Turtle INTEGER lexical → bare
    assert(ts.find(_.p == "<http://example.org/c>").get.o == "007")
    // a lexical OUTSIDE the bare grammar keeps the quoted typed form
    assert(ts.find(_.p == "<http://example.org/d>").get.o ==
      "\"x\"^^<http://www.w3.org/2001/XMLSchema#integer>")
  }

  test("blank nodes from different files never conflate in Rdf.load") {
    val dir = java.nio.file.Files.createTempDirectory("rdf_multi")
    val doc =
      """@prefix ex: <http://ex.org/> .
        |ex:doc ex:author [ ex:name "%s" ] .""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("a.ttl"), doc.format("Ada"))
    java.nio.file.Files.writeString(dir.resolve("b.ttl"), doc.format("Bob"))
    val ts = Rdf.load(spark, dir.toString + "/*.ttl", "turtle").collect()
    val authors = ts.filter(_.p == "<http://ex.org/author>").map(_.o)
    assert(authors.length == 2 && authors.distinct.length == 2,
      s"blank nodes conflated: ${authors.toSeq}")
    val names = ts.filter(_.p == "<http://ex.org/name>").map(_.s)
    assert(names.toSet == authors.toSet)
    // the per-file disambiguation tag must be far wider than 32 bits:
    // at ~4M files a 32-bit tag has thousands of expected birthday
    // collisions, silently conflating _:b0 across distinct documents
    authors.foreach(a => assert(a.matches("_:[0-9a-f]{32}_b\\d+"),
      s"expected 128-bit file tag in label, got $a"))
  }

  test("RDF/XML rejects namespace-less elements and attributes") {
    val rdfNs = RdfXml.RdfNs
    val badElem =
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:rdf="$rdfNs">
         |  <Thing rdf:about="urn:x"/>
         |</rdf:RDF>""".stripMargin
    val e1 = intercept[IllegalArgumentException](RdfXml.parse(badElem))
    assert(e1.getMessage.contains("namespace"))
    val badAttr =
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:rdf="$rdfNs">
         |  <rdf:Description rdf:about="urn:x" name="y"/>
         |</rdf:RDF>""".stripMargin
    val e2 = intercept[IllegalArgumentException](RdfXml.parse(badAttr))
    assert(e2.getMessage.contains("namespace"))
  }

  test("rdf:ID resolves against an explicit base, throws without one") {
    val rdfNs = RdfXml.RdfNs
    val xml =
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:rdf="$rdfNs" xmlns:ex="http://ex.org/">
         |  <rdf:Description rdf:ID="frag"><ex:p>v</ex:p></rdf:Description>
         |</rdf:RDF>""".stripMargin
    val err = intercept[IllegalArgumentException](RdfXml.parse(xml))
    assert(err.getMessage.contains("base"))
    val ts = RdfXml.parse(xml, Some("http://ex.org/doc"))
    assert(ts == Seq(
      Triple("<http://ex.org/doc#frag>", "<http://ex.org/p>", "\"v\"")))
  }

  test("JSON-LD remote @context resolves from a caller-supplied map") {
    // the served document wraps its context, as real vocab URLs do
    val served =
      """{"@context": {"name": "http://xmlns.com/foaf/0.1/name",
        |  "@language": "en"}}""".stripMargin
    val doc =
      """{"@context": "https://example.org/ctx.jsonld",
        |"@id": "http://ex.org/a", "name": "Ada"}""".stripMargin
    val ts = JsonLd.parse(doc,
      Map("https://example.org/ctx.jsonld" -> served))
    assert(ts == Seq(Triple("<http://ex.org/a>",
      "<http://xmlns.com/foaf/0.1/name>", "\"Ada\"@en")))
    // round-trips through the serializer
    val re = JsonLd.parse(JsonLd.write(ts))
    assert(re == ts)
  }

  test("remote @context: recursion works, missing URL and cycles throw") {
    val inner = """{"@context": {"p": "http://ex.org/p"}}"""
    // c0 is served as a BARE array context (no {"@context": …}
    // wrapper): remote URL chained with an inline overlay
    val outer =
      """["https://a.example/c1", {"q": "http://ex.org/q"}]"""
    val doc =
      """{"@context": "https://a.example/c0",
        |"@id": "http://ex.org/s", "p": "v", "q": "w"}""".stripMargin
    val ts = JsonLd.parse(doc, Map(
      "https://a.example/c0" -> outer,
      "https://a.example/c1" -> inner))
    assert(ts.toSet == Set(
      Triple("<http://ex.org/s>", "<http://ex.org/p>", "\"v\""),
      Triple("<http://ex.org/s>", "<http://ex.org/q>", "\"w\"")))
    val missing = intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": "https://nope.example/x"}""")
    }
    assert(missing.getMessage.contains("https://nope.example/x"))
    val cyc = intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": "https://a.example/self"}""",
        Map("https://a.example/self" ->
          """{"@context": "https://a.example/self"}"""))
    }
    assert(cyc.getMessage.contains("cyclic"))
  }

  test("N3 boundary: Turtle-subset parses, formula syntax is named") {
    val subset =
      """@prefix ex: <http://ex.org/> .
        |# a comment with { braces } and ?marks stays a comment
        |ex:a ex:p "a { literal } with ?chars" .""".stripMargin
    assert(Rdf.parseDocument("f.n3", subset, "n3") == Seq(
      Triple("<http://ex.org/a>", "<http://ex.org/p>",
        "\"a { literal } with ?chars\"")))
    val formula = intercept[IllegalArgumentException] {
      Rdf.parseDocument("f.n3",
        "{ <a> <b> <c> } => { <d> <e> <f> } .", "n3")
    }
    assert(formula.getMessage.contains("Turtle subset"), formula.getMessage)
    val forAll = intercept[IllegalArgumentException] {
      Rdf.parseDocument("f.n3",
        "@forAll <http://ex.org/x> .", "n3")
    }
    assert(forAll.getMessage.contains("@forAll"))
    val variable = intercept[IllegalArgumentException] {
      Rdf.parseDocument("f.n3", "?x <http://ex.org/p> 1 .", "n3")
    }
    assert(variable.getMessage.contains("variable"))
  }

  test("PN_LOCAL escapes: ex:foo\\?bar is valid Turtle, not N3 syntax") {
    // `\?` in a prefixed-name local part is a Turtle PN_LOCAL_ESC —
    // the N3-boundary scanner must not flag the escaped '?' as a
    // universal variable, and the parser must decode it into the IRI
    val doc =
      """@prefix ex: <http://ex.org/> .
        |ex:foo\?bar ex:p\=q ex:tail\.dot .""".stripMargin
    val viaN3 = Rdf.parseDocument("f.n3", doc, "n3")
    assert(viaN3 == Seq(Triple("<http://ex.org/foo?bar>",
      "<http://ex.org/p=q>", "<http://ex.org/tail.dot>")), viaN3)
    // same document through the plain Turtle path
    assert(TurtleParser.parse(doc) == viaN3)
    // an escaped trailing dot is part of the name; the UNESCAPED dot
    // after it still terminates the statement
    val trail = TurtleParser.parse(
      "@prefix ex: <http://e/> .\nex:a ex:b ex:c\\. .")
    assert(trail == Seq(Triple("<http://e/a>", "<http://e/b>",
      "<http://e/c.>")), trail)
  }

  test("JSON-LD @context term resolution is order-independent " +
    "(forward prefix references), @graph-wrapped or not") {
    val want = Set(Triple("<http://x>",
      "<http://www.w3.org/2000/01/rdf-schema#label>", "\"hi\""))
    // "label" uses prefix "rdfs" defined LATER in the same context
    val wrapped =
      """{"@context": {"label": "rdfs:label",
        |  "rdfs": "http://www.w3.org/2000/01/rdf-schema#"},
        | "@graph": [{"@id": "http://x", "label": "hi"}]}""".stripMargin
    assert(JsonLd.parse(wrapped).toSet == want, JsonLd.parse(wrapped))
    // the same context WITHOUT @graph must give the same triples
    val bare =
      """{"@context": {"label": "rdfs:label",
        |  "rdfs": "http://www.w3.org/2000/01/rdf-schema#"},
        | "@id": "http://x", "label": "hi"}""".stripMargin
    assert(JsonLd.parse(bare).toSet == want, JsonLd.parse(bare))
    // expanded term definitions resolve forward too (coercion IRI)
    val expanded =
      """{"@context": {
        |  "knows": {"@id": "foaf:knows", "@type": "@id"},
        |  "foaf": "http://xmlns.com/foaf/0.1/"},
        | "@id": "http://x", "knows": "http://y"}""".stripMargin
    assert(JsonLd.parse(expanded).toSet == Set(Triple("<http://x>",
      "<http://xmlns.com/foaf/0.1/knows>", "<http://y>")))
    // a genuine cycle with no parent definition stays LOUD
    val cyc = intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": {"a": {"@id": "b:x"},
        | "b": {"@id": "a:y"}},
        | "@id": "http://x", "a": "v"}""".stripMargin)
    }
    assert(cyc.getMessage.contains("cyclic"), cyc.getMessage)
  }

  test("Rdf.load('nt') scopes blank nodes per FILE, like every other " +
    "format and like the DSv2 connector") {
    val dir = java.nio.file.Files.createTempDirectory("ntscope").toString
    for (n <- Seq("a", "b"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$n.nt"),
        "_:b0 <http://x/p> \"v\" .\n".getBytes("UTF-8"))
    val got = Rdf.load(spark, dir + "/*.nt", "nt").collect()
    // the two `_:b0`s are DIFFERENT documents' nodes — conflating
    // them invents a join the data never stated
    assert(got.length == 2 && got.map(_.s).distinct.length == 2,
      got.toSeq)
    // and each matches what the shared parseDocument path emits
    val viaDoc = Rdf.parseDocument(
      java.nio.file.Paths.get(dir, "a.nt").toUri.toString,
      "_:b0 <http://x/p> \"v\" .", "nt")
    assert(got.map(_.s).toSet.contains(viaDoc.head.s) ||
      got.map(_.s).exists(_.endsWith("_b0")), got.toSeq)
  }

  test("JSON-LD write preserves numeric LEXICAL forms (007, 12.50, " +
    "beyond-Long integers, exponents)") {
    val fussy = Seq(
      Triple("<urn:n>", "<http://e/a>", "007"),
      Triple("<urn:n>", "<http://e/b>", "12.50"),
      Triple("<urn:n>", "<http://e/c>", "9223372036854775808"), // 2^63
      Triple("<urn:n>", "<http://e/d>", "1.2e3"),
      Triple("<urn:n>", "<http://e/e>", "42")) // canonical stays native
    val json = JsonLd.write(fussy)
    assert(JsonLd.parse(json).toSet == fussy.toSet, JsonLd.parse(json))
    // the canonical integer really is a native JSON number
    assert(json.contains(": 42") || json.contains("\"@value\" : 42"),
      json)
  }

  test("exponent bare tokens are xsd:double, not decimal, and " +
    "round-trip through RDF/XML") {
    assert(TurtleParser.bareTokenDatatype("1.2e3")
      .contains("XMLSchema#double"))
    assert(TurtleParser.bareTokenDatatype("-4E-2")
      .contains("XMLSchema#double"))
    assert(TurtleParser.bareTokenDatatype("12.5")
      .contains("XMLSchema#decimal"))
    val ts = Seq(Triple("<urn:n>", "<http://e/d>", "1.2e3"))
    val xml = RdfXml.write(ts)
    assert(xml.contains("XMLSchema#double"), xml)
    assert(RdfXml.parse(xml) == ts, RdfXml.parse(xml))
    // and a typed double literal folds to the bare token on read
    assert(TurtleParser.canonTyped("1.2e3",
      "<http://www.w3.org/2001/XMLSchema#double>") == "1.2e3")
  }

  test("empty-fraction doubles (1.E0) canonicalize BARE — the full " +
    "Turtle DOUBLE production — and round-trip through the parser") {
    val dt = "<http://www.w3.org/2001/XMLSchema#double>"
    // the tokenizer's exponent lookahead re-reads `1.E0`, so the
    // bare spelling is the one canonical form (matching every other
    // DOUBLE lexical); before the lookahead this had to stay quoted
    val term = TurtleParser.canonTyped("1.E0", dt)
    assert(term == "1.E0", term)
    val ts = Seq(Triple("<urn:s>", "<http://e/p>", term))
    assert(TurtleParser.parse(Rdf.serialize(ts, "turtle")) == ts)
    // and the quoted spelling parses to the SAME canonical term
    assert(TurtleParser.parse(
      s"""<urn:s> <http://e/p> "1.E0"^^$dt .""") == ts)
    assert(TurtleParser.bareTokenDatatype("12.e3") ==
      "<http://www.w3.org/2001/XMLSchema#double>")
  }

  test("JSON-LD native numbers overflowing to infinity become the " +
    "QUOTED-typed xsd:double term, not a corrupt bare 'INF' token") {
    // Jackson parses 1e999 as Double.POSITIVE_INFINITY; INF is not a
    // Turtle bare token, so the canonical spelling must stay quoted
    val got = JsonLd.parse(
      """{"@id":"urn:s","http://e/p":1e999}""")
    val dt = "<http://www.w3.org/2001/XMLSchema#double>"
    assert(got == Seq(Triple("<urn:s>", "<http://e/p>",
      "\"INF\"^^" + dt)), got)
    // and the term survives both driver-side writers
    assert(Rdf.serialize(got, "nt").contains("\"INF\"^^" + dt))
    assert(TurtleParser.parse(Rdf.serialize(got, "turtle")) == got)
  }

  test("RDF/XML property-ATTRIBUTE literals take the in-scope " +
    "xml:lang, like property elements") {
    val got = RdfXml.parse(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |  xmlns:dc="http://purl.org/dc/terms/" xml:lang="en">
        |  <rdf:Description rdf:about="http://x" dc:title="Hello"/>
        |</rdf:RDF>""".stripMargin)
    assert(got == Seq(Triple("<http://x>",
      "<http://purl.org/dc/terms/title>", "\"Hello\"@en")), got)
  }

  test("bnode tags agree between the Dataset loader (encoded " +
    "input_file_name) and parseDocument (decoded connector path) " +
    "even with a SPACE in the file name") {
    val dir = java.nio.file.Files.createTempDirectory("tag enc").toString
    val body = "_:b0 <http://x/p> \"v\" .\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a b.nt"), body.getBytes("UTF-8"))
    val viaLoad = Rdf.load(spark, dir + "/*.nt", "nt").collect()
      .map(_.s).toSeq
    val viaDoc = Rdf.parseDocument(
      java.nio.file.Paths.get(dir, "a b.nt").toUri.toString
        .replace("%20", " "), // the connector's DECODED spelling
      body, "nt").map(_.s)
    assert(viaLoad.length == 1 && viaDoc.length == 1)
    assert(viaLoad.head == viaDoc.head,
      s"tags diverge across APIs: ${viaLoad.head} vs ${viaDoc.head}")
  }

  test("Turtle.readNTriples document-scopes blank nodes like " +
    "Rdf.load — the two nt entry points agree") {
    val dir = java.nio.file.Files.createTempDirectory("ntpub").toString
    for (n <- Seq("a", "b"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"$n.nt"),
        "_:b0 <http://x/p> \"v\" .\n".getBytes("UTF-8"))
    val got = graft.ttl.Turtle.readNTriples(spark, dir + "/*.nt")
      .collect()
    assert(got.length == 2 && got.map(_.s).distinct.length == 2,
      got.toSeq)
  }

  test("RDF/XML rdf:type property attribute emits the type triple; " +
    "other rdf:* node attributes stay loud") {
    val got = RdfXml.parse(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |  <rdf:Description rdf:about="http://x"
        |    rdf:type="http://schema.org/Thing"/>
        |</rdf:RDF>""".stripMargin)
    assert(got == Seq(Triple("<http://x>", TurtleParser.RdfType,
      "<http://schema.org/Thing>")), got)
    val ex = intercept[IllegalArgumentException] {
      RdfXml.parse(
        """<?xml version="1.0"?>
          |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
          |  <rdf:Description rdf:about="http://x" rdf:_1="http://y"/>
          |</rdf:RDF>""".stripMargin)
    }
    assert(ex.getMessage.contains("rdf:_1"), ex.getMessage)
  }

  test("RDF/XML xml:lang inherits from ancestor elements; " +
    "xml:lang=\"\" cancels") {
    val got = RdfXml.parse(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |  xmlns:dc="http://purl.org/dc/terms/" xml:lang="en">
        |  <rdf:Description rdf:about="http://x">
        |    <dc:title>Hi</dc:title>
        |    <dc:alternative xml:lang="fr">Salut</dc:alternative>
        |    <dc:identifier xml:lang="">plain</dc:identifier>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin).toSet
    assert(got == Set(
      Triple("<http://x>", "<http://purl.org/dc/terms/title>",
        "\"Hi\"@en"),
      Triple("<http://x>", "<http://purl.org/dc/terms/alternative>",
        "\"Salut\"@fr"),
      Triple("<http://x>", "<http://purl.org/dc/terms/identifier>",
        "\"plain\"")), got)
  }

  test("written rdf:nodeID is always an NCName (digit-leading bnode " +
    "tags get a letter prefix) and round-trips") {
    // the shape Rdf.load's relabeling produces: hex tag, often
    // digit-leading — raw emission would be invalid RDF/XML
    val ts = Seq(
      Triple("_:3fa2_b0", "<http://e/p>", "\"v\""),
      Triple("<urn:s>", "<http://e/q>", "_:3fa2_b0"))
    val xml = RdfXml.write(ts)
    assert(!xml.contains("nodeID=\"3"), xml)
    assert(xml.contains("rdf:nodeID=\"b3fa2_b0\""), xml)
    val back = RdfXml.parse(xml)
    // labels re-canonicalize on read; the SHAPE must survive: one
    // bnode, used as a subject once and an object once
    val bn = back.collect { case t if t.s.startsWith("_:") => t.s }
    assert(bn.distinct.length == 1, back)
    assert(back.exists(t => t.o == bn.head), back)
  }

  test("@graph accepts a single node object; non-object array " +
    "elements fail with context, not ClassCastException") {
    val single = JsonLd.parse(
      """{"@graph": {"@id": "http://x",
        |  "@type": "http://schema.org/Thing"}}""".stripMargin)
    assert(single == Seq(Triple("<http://x>", TurtleParser.RdfType,
      "<http://schema.org/Thing>")), single)
    val bad = intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@graph": ["not-a-node-object"]}""")
    }
    assert(bad.getMessage.contains("node object"), bad.getMessage)
    val badRoot = intercept[IllegalArgumentException] {
      JsonLd.parse("""[42]""")
    }
    assert(badRoot.getMessage.contains("node object"), badRoot.getMessage)
  }

  test("dotted prefixes (PN_PREFIX interior dots) declare AND use") {
    val got = TurtleParser.parse(
      "@prefix ex.a: <http://e/> . ex.a:foo ex.a:bar 1 .")
    assert(got == Seq(Triple("<http://e/foo>", "<http://e/bar>", "1")),
      got)
    // a prefix cannot END with a dot — that dot belongs to the
    // statement, so the name fails loudly as before
    intercept[IllegalArgumentException](TurtleParser.parse(
      "@prefix ex: <http://e/> . ex.:foo ex:bar 1 ."))
  }
}
