package graft

import graft.ttl.{JsonLd, Rdf, RdfXml, Turtle, TurtleParser}
import graft.ttl.Turtle.Triple
import org.scalacheck.Gen

/** Property-based round-trips for the RDF stack: ANY canonical graph
  * must survive serialize→parse in every format. Literals draw from a
  * hostile alphabet (quotes, backslashes, newlines, XML/JSON
  * metacharacters, unicode); bnodes are excluded because readers
  * legitimately relabel them (structure is covered by example-based
  * specs). */
class RdfPropertiesSpec extends SparkTestBase {

  private def forAll[T](gen: Gen[T], n: Int = 25)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(1337L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  // XML 1.0 forbids most control chars — generate printable + \n\r\t,
  // heavy on syntax-significant characters.
  private val litChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', ' ', '<', '>', '&',
      '\'', '{', '}', '[', ']', ';', ',', '.', '@', '^', '#'),
    1 -> Gen.oneOf('é', 'ü', '本', '語', 'λ'))
  private val litValue: Gen[String] =
    Gen.listOf(litChar).map(_.mkString)

  private val iriTerm: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield s"<urn:${(head :: tail).mkString}>"

  // predicate IRIs keep an NCName-safe local part (XML constraint)
  private val predTerm: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield s"<http://ex.org/${(head :: tail).mkString}>"

  private val objTerm: Gen[String] = Gen.frequency(
    4 -> litValue.map(v => "\"" + TurtleParser.escape(v) + "\""),
    2 -> iriTerm,
    1 -> litValue.map(v => "\"" + TurtleParser.escape(v) +
      "\"^^<http://www.w3.org/2001/XMLSchema#token>"),
    1 -> litValue.map(v => "\"" + TurtleParser.escape(v) + "\"@en"),
    1 -> Gen.choose(-999999L, 999999L).map(_.toString),
    1 -> Gen.oneOf("true", "false"))

  private val tripleGen: Gen[Triple] = for {
    s <- iriTerm; p <- predTerm; o <- objTerm
  } yield Triple(s, p, o)

  private val graphGen: Gen[List[Triple]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tripleGen))

  test("any canonical graph survives serialize→parse in every format") {
    forAll(graphGen) { g =>
      val set = g.toSet
      // N-Triples (line-based)
      val nt = Rdf.serialize(g, "nt")
      assert(nt.linesIterator.flatMap(Turtle.parseLine).toSet == set,
        s"nt round-trip failed for:\n$nt")
      // Turtle (grouped blocks)
      val ttl = Rdf.serialize(g, "turtle")
      assert(TurtleParser.parse(ttl).toSet == set,
        s"turtle round-trip failed for:\n$ttl")
      // RDF/XML
      val xml = Rdf.serialize(g, "xml")
      assert(RdfXml.parse(xml).toSet == set,
        s"xml round-trip failed for:\n$xml")
      // JSON-LD
      val json = Rdf.serialize(g, "json-ld")
      assert(JsonLd.parse(json).toSet == set,
        s"json-ld round-trip failed for:\n$json")
    }
  }

  test("escape/unescape is a bijection on hostile strings") {
    forAll(litValue, n = 60) { v =>
      assert(TurtleParser.unescape(TurtleParser.escape(v)) == v)
    }
  }
}
