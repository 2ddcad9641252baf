package graft

import graft.ttl.{JsonLd, RdfXml, Turtle, TurtleParser}
import graft.ttl.Turtle.Triple
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Conformance gate for the hand-built RDF codecs, modeled on the
  * public W3C rdf-tests suites (see
  * src/test/resources/w3c/README.md for provenance and the
  * documented deviation list). Each manifest row becomes one test:
  *
  *  - pos:    action parses without error
  *  - neg:    action raises
  *  - eval:   action parses to a graph ISOMORPHIC (blank-node
  *            bijection) to the result N-Triples file
  *  - devpos/devneg: deviation pins — assert the engine's documented
  *            divergence from strict W3C behavior so it cannot drift
  *
  * Reference analog: rdflib's parse surface (U-RDF:285-300), which
  * passes these suites upstream.
  */
class W3cRdfConformanceSpec extends AnyFunSuite {

  private val root = Paths.get("src/test/resources/w3c")

  private case class Entry(name: String, typ: String, action: String,
    result: String, comment: String)

  private def manifest(dir: String): Seq[Entry] =
    Files.readAllLines(root.resolve(dir).resolve("manifest.tsv"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { l =>
        val c = l.split("\t", -1).padTo(5, "")
        Entry(c(0), c(1), c(2), c(3), c(4))
      }

  private def slurp(dir: String, fn: String): String =
    new String(Files.readAllBytes(root.resolve(dir).resolve(fn)), "UTF-8")

  private def parseNt(content: String): Seq[Triple] =
    content.linesIterator.flatMap(Turtle.parseLine).toSeq

  private def isBn(t: String) = t.startsWith("_:")

  /** Graph isomorphism under blank-node bijection (multiset-exact on
    * ground terms). Backtracking — conformance graphs are tiny. */
  private def iso(a: Seq[Triple], b: Seq[Triple]): Boolean = {
    if (a.length != b.length) return false
    type M = Map[String, String]
    def term(x: String, y: String, m: M, r: M): Option[(M, M)] =
      if (isBn(x) && isBn(y)) {
        if (m.get(x).exists(_ != y) || r.get(y).exists(_ != x)) None
        else Some((m + (x -> y), r + (y -> x)))
      } else if (!isBn(x) && !isBn(y) && x == y) Some((m, r))
      else None
    def rec(rest: List[Triple], used: Set[Int], m: M, r: M): Boolean =
      rest match {
        case Nil => true
        case t :: tail =>
          b.indices.exists { j =>
            !used(j) && {
              val u = b(j)
              (for {
                mr1 <- term(t.s, u.s, m, r)
                mr2 <- term(t.p, u.p, mr1._1, mr1._2)
                mr3 <- term(t.o, u.o, mr2._1, mr2._2)
              } yield mr3) match {
                case Some((m3, r3)) => rec(tail, used + j, m3, r3)
                case None => false
              }
            }
          }
      }
    rec(a.toList, Set.empty, Map.empty, Map.empty)
  }

  private def checkEval(got: Seq[Triple], dir: String, e: Entry): Unit = {
    val want = parseNt(slurp(dir, e.result))
    assert(iso(got, want),
      s"not isomorphic to ${e.result}\n got: ${got.mkString("\n      ")}" +
        s"\nwant: ${want.mkString("\n      ")}")
  }

  /** Writer round-trip against FOREIGN input (the engine's own
    * round-trip fuzz only ever feeds the writers engine-generated
    * graphs): every eval fixture's graph goes out through each of the
    * four serializers and back through its parser, and must come back
    * isomorphic. */
  private def checkWriters(got: Seq[Triple]): Unit =
    Seq[(String, String => Seq[Triple])](
      "turtle" -> (TurtleParser.parse(_)),
      "nt" -> parseNt,
      "xml" -> (RdfXml.parse(_)),
      "json-ld" -> (JsonLd.parse(_))
    ).foreach { case (fmt, reparse) =>
      val out = graft.ttl.Rdf.serialize(got, fmt)
      val back = reparse(out)
      assert(iso(back, got),
        s"$fmt writer round-trip not isomorphic\n out: $out\n" +
          s" got: ${got.mkString("\n      ")}\n" +
          s"back: ${back.mkString("\n      ")}")
    }

  private def register(dir: String,
    parse: Entry => Seq[Triple]): Unit =
    manifest(dir).foreach { e =>
      val label = s"$dir/${e.name}" +
        (if (e.typ.startsWith("dev")) " [deviation pin]" else "")
      test(label) {
        e.typ match {
          case "pos" | "devpos" => parse(e) // must not throw
          case "neg" | "devneg" =>
            assertThrows[Exception](parse(e))
          case "eval" =>
            val got = parse(e)
            checkEval(got, dir, e)
            checkWriters(got)
          case other => fail(s"unknown manifest type '$other'")
        }
      }
    }

  register("turtle", e => TurtleParser.parse(
    slurp("turtle", e.action),
    Some(s"http://www.w3.org/2013/TurtleTests/${e.action}")))

  register("ntriples", e => parseNt(slurp("ntriples", e.action)))

  register("rdfxml", e => RdfXml.parse(
    slurp("rdfxml", e.action),
    if (e.name.contains("noBase")) None
    else Some(s"http://www.w3.org/2013/RDFXMLTests/${e.action}")))

  register("jsonld", e => JsonLd.parse(slurp("jsonld", e.action)))
}
