package graft

import graft.ttl.Turtle.Triple
import graft.ttl.TurtleParser
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial random-document round-trip for the in-house Turtle
  * parser — the corner the five golden files and the hand-built
  * construct test cannot reach: random PN_LOCAL escape sequences,
  * unicode literals in all three string spellings (short escaped,
  * long-form with raw newlines, fully \u/\U-escaped), nested
  * collections, and blank-node property lists, under random
  * whitespace and comments.
  *
  * The generator builds a term TREE first (pure), then one
  * deterministic walk renders the document text AND the expected
  * canonical triples, mirroring the parser's blank-node allocation
  * order (a `[` allocates on open; a collection allocates its cells
  * AFTER its items — nested structures first). Comparison is exact
  * set equality on canonical terms, so any divergence in escaping,
  * canonicalization, or bnode bookkeeping fails loudly. Pure JVM —
  * no Spark session needed. */
class TurtleFuzzSpec extends AnyFunSuite {

  // ── term tree ──────────────────────────────────────────────────
  private sealed trait Term
  // `local` is the DECODED local part; rendering re-escapes it
  private case class PName(local: String) extends Term
  private case class Iri(iri: String) extends Term
  /** spelling: 0 short-escaped, 1 long-form (raw newlines), 2 every
    * char as \uXXXX / \U-escape; `suffix`: None plain,
    * Some(Left(lang)), Some(Right(datatypeIri)). */
  private case class Lit(value: String, spelling: Int,
    suffix: Option[Either[String, String]]) extends Term
  private case class Coll(items: List[Term]) extends Term
  private case class BProps(props: List[(PName, Term)]) extends Term
  private case class Stmt(subj: Term,
    po: List[(Term, List[Term])])

  private val Ex = "http://example.org/"

  // ── generators ─────────────────────────────────────────────────
  private val pnLocalEsc = "_~.-!$&'()*+,;=/?#@%"
  private val safeLocal = Gen.alphaNumChar
  private val escLocal = Gen.oneOf(pnLocalEsc.toSeq)
  private val localGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(5, Gen.frequency(
      3 -> safeLocal, 2 -> escLocal))
  } yield (head :: tail).mkString

  private val litChar: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("\n", "\r", "\t", "\\", "\"", "'", " "),
    2 -> Gen.oneOf("é", "ß", "你", "好", "Ω", "λ", "ñ"),
    1 -> Gen.oneOf("😀", "🚀", "𝔘")) // supplementary-plane (\U) chars
  private val litValue: Gen[String] =
    Gen.listOfN(6, litChar).map(_.mkString)

  private val pnameGen: Gen[PName] = localGen.map(PName)
  private val iriGen: Gen[Iri] =
    localGen.map(l => Iri(s"http://other.example/$l"))
  private val litGen: Gen[Lit] = for {
    v <- litValue
    sp <- Gen.oneOf(0, 1, 2)
    suf <- Gen.frequency(
      3 -> Gen.const(None),
      1 -> Gen.oneOf("en", "fr-CA").map(t => Some(Left(t))),
      1 -> localGen.map(d => Some(Right(s"${Ex}dt/$d"))))
  } yield Lit(v, sp, suf)

  private val leafGen: Gen[Term] =
    Gen.frequency(3 -> litGen, 2 -> pnameGen, 1 -> iriGen)
  private val collGen: Gen[Coll] = for {
    inner <- Gen.listOfN(2, leafGen)
    nested <- Gen.oneOf(true, false)
    items <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, leafGen))
  } yield Coll(if (nested) Coll(inner) :: items else items)
  private val bpropsGen: Gen[BProps] = for {
    n <- Gen.choose(1, 2)
    props <- Gen.listOfN(n, Gen.zip(pnameGen,
      Gen.frequency(3 -> litGen, 1 -> collGen)))
  } yield BProps(props)

  private val objGen: Gen[Term] = Gen.frequency(
    4 -> leafGen, 2 -> collGen, 2 -> bpropsGen)
  private val stmtGen: Gen[Stmt] = for {
    subj <- Gen.frequency(3 -> pnameGen, 1 -> iriGen)
    nPreds <- Gen.choose(1, 3)
    po <- Gen.listOfN(nPreds, for {
      p <- Gen.frequency(3 -> pnameGen, 1 -> iriGen)
      nObjs <- Gen.choose(1, 2)
      os <- Gen.listOfN(nObjs, objGen)
    } yield (p: Term, os))
  } yield Stmt(subj, po)
  private val docGen: Gen[(List[Stmt], Long)] = for {
    n <- Gen.choose(1, 5)
    stmts <- Gen.listOfN(n, stmtGen)
    wsSeed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (stmts, wsSeed)

  // ── mirrored rendering walk ────────────────────────────────────
  private final class Walk(wsSeed: Long) {
    val text = new StringBuilder(
      s"@prefix ex: <$Ex> .\n@prefix exd: <${Ex}dt/> .\n")
    val triples = scala.collection.mutable.ArrayBuffer[Triple]()
    private var bn = 0
    private val rnd = new scala.util.Random(wsSeed)
    private def fresh(): String = { val l = s"_:b$bn"; bn += 1; l }
    // random inter-token whitespace, sometimes with a comment
    private def ws(): String = rnd.nextInt(6) match {
      case 0 => " "
      case 1 => "  "
      case 2 => "\n  "
      case 3 => "\t"
      case 4 => " # noise\n "
      case _ => " "
    }

    private def renderLocal(l: String): String =
      l.map(c => if (pnLocalEsc.indexOf(c) >= 0) s"\\$c"
        else c.toString).mkString

    private def renderLitText(l: Lit): String = {
      val body = l.spelling match {
        case 0 => "\"" + TurtleParser.escape(l.value) + "\""
        case 1 =>
          // long form: raw newlines/tabs stay raw; backslashes and
          // double quotes escape (escapes are legal in long strings,
          // and escaping quotes sidesteps the ≥3-quote-run close)
          "\"\"\"" + l.value.replace("\\", "\\\\")
            .replace("\"", "\\\"") + "\"\"\""
        case _ => "\"" + l.value.codePoints().toArray.map { cp =>
            if (cp > 0xFFFF) f"\\U$cp%08X" else f"\\u$cp%04X"
          }.mkString + "\""
      }
      body + (l.suffix match {
        case None => ""
        case Some(Left(lang)) => s"@$lang"
        case Some(Right(dt)) => s"^^<$dt>"
      })
    }

    private def litCanon(l: Lit): String = l.suffix match {
      case Some(Right(dt)) => TurtleParser.canonTyped(l.value, s"<$dt>")
      case Some(Left(lang)) =>
        "\"" + TurtleParser.escape(l.value) + "\"@" + lang
      case None => "\"" + TurtleParser.escape(l.value) + "\""
    }

    private val RdfFirst =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
    private val RdfRest =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
    private val RdfNil =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"

    /** Renders `t` into `text`, returns its expected canonical term,
      * appending any triples the term itself implies — in the
      * parser's own bnode-allocation order. */
    def term(t: Term): String = t match {
      case PName(l) =>
        text.append("ex:").append(renderLocal(l)); s"<$Ex$l>"
      case Iri(iri) => text.append(s"<$iri>"); s"<$iri>"
      case l: Lit => text.append(renderLitText(l)); litCanon(l)
      case Coll(items) =>
        text.append("(").append(ws())
        // parser reads items first (nested structures allocate
        // during readObject), THEN allocates this collection's cells
        val itemTerms = items.map { it =>
          val term0 = term(it); text.append(ws()); term0
        }
        text.append(")")
        if (itemTerms.isEmpty) RdfNil
        else {
          val cells = itemTerms.map(_ => fresh())
          itemTerms.indices.foreach { k =>
            triples += Triple(cells(k), RdfFirst, itemTerms(k))
            triples += Triple(cells(k), RdfRest,
              if (k + 1 < cells.length) cells(k + 1) else RdfNil)
          }
          cells.head
        }
      case BProps(props) =>
        text.append("[").append(ws())
        val label = fresh() // parser allocates on '['
        props.zipWithIndex.foreach { case ((p, v), k) =>
          if (k > 0) { text.append(";").append(ws()) }
          val pTerm = term(p)
          text.append(" ")
          val vTerm = term(v)
          text.append(ws())
          triples += Triple(label, pTerm, vTerm)
        }
        text.append("]")
        label
    }

    def stmt(st: Stmt): Unit = {
      val s = term(st.subj)
      st.po.zipWithIndex.foreach { case ((p, os), k) =>
        if (k > 0) text.append(" ;").append(ws())
        else text.append(ws())
        val pTerm = term(p)
        os.zipWithIndex.foreach { case (o, j) =>
          if (j > 0) text.append(" ,")
          text.append(ws())
          val oTerm = term(o)
          triples += Triple(s, pTerm, oTerm)
        }
      }
      text.append(" .\n")
    }
  }

  /** Deterministic scalacheck driver (scalatestplus bridge is not in
    * the dependency set; same pattern as GeomPropertiesSpec). */
  private def forAll[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(421L)
    (1 to n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  test("random documents round-trip: PN_LOCAL escapes, unicode " +
    "literals in three spellings, nested collections, bnode lists") {
    forAll(docGen, n = 60) { case (stmts, wsSeed) =>
      val w = new Walk(wsSeed)
      stmts.foreach(w.stmt)
      val doc = w.text.toString
      val got =
        try TurtleParser.parse(doc)
        catch { case e: IllegalArgumentException =>
          fail(s"parse failed: ${e.getMessage}\n--- doc ---\n$doc") }
      assert(got.toSet == w.triples.toSet,
        s"round-trip mismatch\n--- doc ---\n$doc\n--- extra ---\n" +
          s"${got.toSet -- w.triples.toSet}\n--- missing ---\n" +
          s"${w.triples.toSet -- got.toSet}")
    }
  }

  test("regression: escaped trailing dot in PN_LOCAL survives; " +
    "unescaped trailing dot is the statement terminator") {
    val doc = s"@prefix ex: <$Ex> .\nex:a\\. ex:p ex:b\\.\\. .\n" +
      s"ex:c ex:p ex:d.\n"
    val got = TurtleParser.parse(doc).toSet
    assert(got == Set(
      Triple(s"<${Ex}a.>", s"<${Ex}p>", s"<${Ex}b..>"),
      Triple(s"<${Ex}c>", s"<${Ex}p>", s"<${Ex}d>")), got)
  }

  test("regression: supplementary-plane \\U escape and raw emoji " +
    "canonicalize identically") {
    val doc = s"""@prefix ex: <$Ex> .
      |ex:a ex:p "\\U0001F600x" .
      |ex:b ex:p "😀x" .
      |""".stripMargin
    val got = TurtleParser.parse(doc)
    assert(got.map(_.o).distinct == Seq("\"😀x\""), got)
  }
}
