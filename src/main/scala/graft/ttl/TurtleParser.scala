package graft.ttl

import graft.ttl.Turtle.Triple
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable

/** Recursive-descent Turtle parser — the S10 graph-load surface for
  * REAL Turtle (reference U-RDF:285-300 parses turtle/nt/n3), able to
  * re-read everything the engine's own serializers and the reference's
  * published outputs emit: `@prefix` directives, IRIs (including the
  * relative `<>`), prefixed names, `a`, quoted literals with the full
  * Turtle escape set plus `^^datatype` / `@lang`, bare numeric and
  * boolean literals, `;` / `,` chains, comments, and arbitrarily
  * nested blank-node property lists `[ ... ]`.
  *
  * Emits CANONICAL terms so graphs from different serializations
  * compare equal: IRIs expanded to absolute `<...>` form, literal
  * values unescaped then re-escaped with the engine's own rules
  * (Turtle.escapeLiteral), datatype IRIs expanded, and ALL blank
  * nodes — anonymous `[ ]` and explicit `_:label` alike — renamed
  * `_:b0, _:b1, …` in first-use order through one shared counter, so
  * a generated label can never collide with a parsed one.
  *
  * Scale: parsing is per-FILE (Turtle blocks are not line-splittable)
  * — use it via `readTurtle` (wholetext, one task per file, the right
  * shape for the reference's file-per-image corpus). For single huge
  * graph files, serialize to N-Triples and use readNTriples, which
  * splits freely.
  */
object TurtleParser {

  val RdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

  /** Parse a full Turtle document into triples. Throws
    * IllegalArgumentException with position info on malformed input. */
  def parse(content: String): Seq[Triple] = new P(content).document()

  /** Distributed Turtle load: one task per file (wholetext), blank
    * nodes disambiguated per file (see Rdf.load). */
  def readTurtle(spark: SparkSession, path: String): Dataset[Triple] =
    Rdf.load(spark, path, "turtle")

  /** Scala-level twin of Turtle.escapeLiteral (Column version). */
  def escape(v: String): String = v
    .replace("\\", "\\\\").replace("\"", "\\\"")
    .replace("\n", "\\n").replace("\r", "\\r")

  /** Inverse of `escape`, plus the rest of Turtle's ECHAR/UCHAR set
    * (\t \b \f \' \uXXXX \UXXXXXXXX). */
  def unescape(v: String): String = {
    val b = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case '"' => b.append('"'); i += 2
          case '\'' => b.append('\''); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' =>
            b.appendCodePoint(hexEscape(v, i + 2, 4)); i += 6
          case 'U' =>
            b.appendCodePoint(hexEscape(v, i + 2, 8)); i += 10
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private val XsdInteger = "<http://www.w3.org/2001/XMLSchema#integer>"
  private val XsdDecimal = "<http://www.w3.org/2001/XMLSchema#decimal>"
  private val XsdDouble = "<http://www.w3.org/2001/XMLSchema#double>"
  private val XsdBoolean = "<http://www.w3.org/2001/XMLSchema#boolean>"

  /** Bare DOUBLE lexicals this parser can RE-READ: mantissa +
    * mandatory exponent (without an exponent a dotted token is a
    * DECIMAL), and the fraction must be NON-EMPTY when a dot is
    * present — the Turtle grammar admits `1.E0`, but
    * readBareTokenRaw stops at a dot not followed by a digit, so
    * canonicalizing such a lexical to bare form would emit a term
    * the engine cannot parse back. `"1.E0"^^xsd:double` therefore
    * stays in quoted-typed form (still ONE canonical spelling,
    * shared by every reader via canonTyped). */
  private val BareDouble = "[+-]?([0-9]+\\.[0-9]+|\\.?[0-9]+)[eE][+-]?[0-9]+"

  /** Canonical term for a typed literal with UNESCAPED lexical `lex`
    * and expanded datatype term `dt` (`<...>`). Turtle's bare tokens
    * (`42`, `12.5`, `1.2e3`, `true`) ARE xsd:integer/decimal/double/
    * boolean literals, so those datatypes canonicalize to the bare
    * spelling whenever the lexical form fits the bare grammar — one
    * spelling per RDF term across every reader (Turtle, RDF/XML,
    * JSON-LD). */
  def canonTyped(lex: String, dt: String): String = dt match {
    case XsdInteger if lex.matches("[+-]?[0-9]+") => lex
    case XsdDecimal if lex.matches("[+-]?[0-9]*\\.[0-9]+") => lex
    case XsdDouble if lex.matches(BareDouble) => lex
    case XsdBoolean if lex == "true" || lex == "false" => lex
    case _ => "\"" + escape(lex) + "\"^^" + dt
  }

  /** Datatype for a bare token, for writers targeting formats with no
    * bare-token syntax (RDF/XML, JSON-LD). Exponent forms are
    * xsd:double per the Turtle grammar — calling them decimal would
    * change the literal's RDF identity on round-trip. */
  def bareTokenDatatype(tok: String): String =
    if (tok == "true" || tok == "false") XsdBoolean
    else if (tok.matches("[+-]?[0-9]+")) XsdInteger
    else if (tok.matches(BareDouble)) XsdDouble
    else XsdDecimal

  private def hexEscape(v: String, from: Int, len: Int): Int = {
    if (from + len > v.length)
      throw new IllegalArgumentException(
        s"truncated \\u escape at offset $from in literal «$v»")
    try Integer.parseInt(v.substring(from, from + len), 16)
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"malformed \\u escape at offset $from in literal «$v»")
    }
  }

  private final class P(s: String) {
    private var i = 0
    private val prefixes = mutable.Map[String, String]()
    private val out = mutable.ArrayBuffer[Triple]()
    private var bnCount = 0
    private val bnMap = mutable.Map[String, String]()

    private def freshBn(): String = {
      val l = s"_:b$bnCount"; bnCount += 1; l
    }

    private def fail(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, i - 30), math.min(s.length, i + 30))
      throw new IllegalArgumentException(s"$msg at offset $i near «$ctx»")
    }

    private def ws(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c)) i += 1
        else if (c == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else go = false
      }
    }

    private def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'

    private def expect(c: Char): Unit =
      if (peek == c) i += 1 else fail(s"expected '$c', got '$peek'")

    def document(): Seq[Triple] = {
      ws()
      while (i < s.length) {
        if (s.regionMatches(true, i, "@prefix", 0, 7)) prefixDirective()
        else if (s.regionMatches(true, i, "PREFIX", 0, 6) &&
          i + 6 < s.length && Character.isWhitespace(s.charAt(i + 6))) {
          i += 6; sparqlPrefix()
        } else statement()
        ws()
      }
      out.toSeq
    }

    private def prefixDirective(): Unit = {
      i += 7
      sparqlPrefix()
      ws(); expect('.')
    }

    private def sparqlPrefix(): Unit = {
      ws()
      val ns = new StringBuilder
      while (i < s.length && peek != ':' &&
        !Character.isWhitespace(peek)) {
        ns.append(peek); i += 1
      }
      if (i >= s.length) fail("unterminated @prefix directive")
      ws(); expect(':'); ws()
      if (peek != '<') fail("expected IRIREF in @prefix")
      val iri = readIriRaw()
      prefixes(ns.toString) = iri
    }

    private def statement(): Unit = {
      val wasBnode = peek == '['
      val subj = peek match {
        case '[' => bnodePropertyList()
        case '(' => collection()
        case '<' => s"<${readIriRaw()}>"
        case '_' => readBlankLabel()
        case _ => readPname()
      }
      ws()
      // `[ ... ] .` is a complete statement (predicateObjectList is
      // optional after a blank-node property list in the grammar)
      if (!(wasBnode && peek == '.')) predicateObjectList(subj)
      ws(); expect('.')
    }

    /** verb objectList (';' (verb objectList)?)* */
    private def predicateObjectList(subj: String): Unit = {
      var done = false
      while (!done) {
        ws()
        val p = readVerb()
        objectList(subj, p)
        ws()
        if (peek == ';') {
          while (peek == ';') { i += 1; ws() }
          if (peek == '.' || peek == ']' || i >= s.length) done = true
        } else done = true
      }
    }

    private def objectList(subj: String, p: String): Unit = {
      var more = true
      while (more) {
        ws()
        val o = readObject()
        out += Triple(subj, p, o)
        ws()
        if (peek == ',') i += 1 else more = false
      }
    }

    private def readVerb(): String =
      if (peek == '<') s"<${readIriRaw()}>"
      else if (peek == 'a' && i + 1 < s.length &&
        Character.isWhitespace(s.charAt(i + 1))) { i += 1; RdfType }
      else readPname()

    private def readObject(): String = peek match {
      case '<' => s"<${readIriRaw()}>"
      case '"' | '\'' => readLiteral()
      case '[' => bnodePropertyList()
      case '(' => collection()
      case '_' => readBlankLabel()
      case c if c.isDigit || c == '+' || c == '-' ||
        (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit) =>
        readBareToken()
      case _ =>
        val save = i
        val t = readBareTokenRaw()
        if (t == "true" || t == "false") t
        else { i = save; readPname() }
    }

    private val RdfFirst =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
    private val RdfRest =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
    private val RdfNil =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"

    /** `( o1 o2 … )` → the standard rdf:first/rdf:rest bnode chain;
      * `()` is rdf:nil. */
    private def collection(): String = {
      expect('(')
      ws()
      val items = mutable.ArrayBuffer[String]()
      while (peek != ')') {
        if (i >= s.length) fail("unterminated collection")
        items += readObject()
        ws()
      }
      i += 1
      if (items.isEmpty) RdfNil
      else {
        val cells = items.map(_ => freshBn())
        for (idx <- items.indices) {
          out += Triple(cells(idx), RdfFirst, items(idx))
          out += Triple(cells(idx), RdfRest,
            if (idx + 1 < items.length) cells(idx + 1) else RdfNil)
        }
        cells.head
      }
    }

    /** `[ predicateObjectList? ]` → fresh `_:bN`, nested triples
      * appended in document order. */
    private def bnodePropertyList(): String = {
      expect('[')
      val label = freshBn()
      ws()
      if (peek != ']') predicateObjectList(label)
      ws(); expect(']')
      label
    }

    private def readIriRaw(): String = {
      expect('<')
      val b = new StringBuilder
      while (peek != '>') {
        if (i >= s.length) fail("unterminated IRI")
        b.append(peek); i += 1
      }
      i += 1
      b.toString
    }

    private def readBlankLabel(): String = {
      val b = new StringBuilder
      b.append(peek); i += 1 // '_'
      expect(':'); b.append(':')
      while (isPnameChar(peek)) { b.append(peek); i += 1 }
      // like PN_LOCAL, a label never ends with '.' — that is the
      // statement terminator abutting the label
      var l = b.toString
      while (l.endsWith(".")) { l = l.dropRight(1); i -= 1 }
      // canonicalize through the shared counter so explicit labels
      // and generated `[ ]` labels can never collide
      bnMap.getOrElseUpdate(l, freshBn())
    }

    private def isPnameChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

    /** PN_LOCAL_ESC: the reserved chars a backslash may escape inside
      * a prefixed-name local part (`ex:foo\?bar` → <…foo?bar>). */
    private val pnLocalEsc = "_~.-!$&'()*+,;=/?#@%"

    private def readPname(): String = {
      val ns = new StringBuilder
      // PN_PREFIX admits INTERIOR dots (`ex.a:foo` is legal Turtle,
      // and sparqlPrefix happily declares such a prefix) but cannot
      // end with one — roll trailing dots back, they belong to the
      // surrounding statement
      while (isPnameChar(peek)) { ns.append(peek); i += 1 }
      var nsStr = ns.toString
      while (nsStr.endsWith(".")) { nsStr = nsStr.dropRight(1); i -= 1 }
      if (peek != ':')
        fail(s"expected prefixed name, got '$nsStr$peek'")
      i += 1
      val local = new StringBuilder
      // escaped chars decode to ONE name char but consume TWO source
      // chars — remember which, so the trailing-dot rollback below
      // can restore `i` correctly and never strips an ESCAPED dot
      // (that one is part of the name, not a statement terminator)
      val escaped = new scala.collection.mutable.ArrayBuffer[Boolean]
      while (isPnameChar(peek) ||
        (peek == '\\' && i + 1 < s.length &&
          pnLocalEsc.indexOf(s.charAt(i + 1)) >= 0)) {
        if (peek == '\\') {
          local.append(s.charAt(i + 1)); escaped += true; i += 2
        } else { local.append(peek); escaped += false; i += 1 }
      }
      // PN_LOCAL must not end with '.' — trailing dots are statement
      // terminators
      var l = local.toString
      while (l.nonEmpty && l.last == '.' && !escaped.last) {
        l = l.dropRight(1); escaped.remove(escaped.length - 1); i -= 1
      }
      val base = prefixes.getOrElse(nsStr,
        fail(s"unknown prefix '$nsStr:'"))
      s"<$base$l>"
    }

    /** Quoted literal incl. escapes, with optional ^^dt / @lang.
      * Handles all four Turtle string forms: `"…"`, `'…'`, and the
      * long forms `"""…"""` / `'''…'''` (rdflib's turtle serializer
      * emits the long double-quote form for any literal containing a
      * newline — the engine must re-read its outputs). Long strings
      * admit raw newlines and unescaped quotes, including quotes
      * ABUTTING the closing delimiter: per the Turtle grammar the
      * close is longest-match, so in a quote run of n ≥ 3 the final
      * three quotes close the literal and the leading n−3 belong to
      * the content (`"""a""""` is the string `a"`). */
    private def readLiteral(): String = {
      val q = peek // '"' or '\''
      i += 1
      val raw = new StringBuilder
      if (peek == q && i + 1 < s.length && s.charAt(i + 1) == q) {
        // long form: consume the two remaining openers, scan to q q q
        i += 2
        var closed = false
        while (!closed) {
          if (i >= s.length) fail("unterminated long literal")
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            raw.append(c).append(s.charAt(i + 1)); i += 2
          } else if (c == q) {
            // longest-match close: in a run of n consecutive quotes,
            // n < 3 are content; otherwise the LAST three close and
            // the leading n−3 are content (so content may end in `"`)
            var run = 1
            while (i + run < s.length && s.charAt(i + run) == q) run += 1
            if (run >= 3) {
              var k = 0
              while (k < run - 3) { raw.append(q); k += 1 }
              closed = true; i += run
            } else { raw.append(c); i += 1 }
          } else { raw.append(c); i += 1 }
        }
      } else if (peek == q) {
        i += 1 // empty short string `""` / `''`
      } else {
        var closed = false
        while (!closed) {
          if (i >= s.length) fail("unterminated literal")
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            raw.append(c).append(s.charAt(i + 1)); i += 2
          } else if (c == q) { closed = true; i += 1 }
          else { raw.append(c); i += 1 }
        }
      }
      val lex = unescape(raw.toString)
      val canon = "\"" + escape(lex) + "\""
      if (peek == '^' && i + 1 < s.length && s.charAt(i + 1) == '^') {
        i += 2
        val dt = if (peek == '<') s"<${readIriRaw()}>" else readPname()
        canonTyped(lex, dt)
      } else if (peek == '@') {
        i += 1
        val tag = new StringBuilder
        while (Character.isLetterOrDigit(peek) || peek == '-') {
          tag.append(peek); i += 1
        }
        canon + "@" + tag.toString
      } else canon
    }

    /** Bare numeric/boolean token, ended by whitespace or punctuation;
      * a trailing '.' is the statement terminator unless followed by a
      * digit (decimal point). */
    private def readBareToken(): String = readBareTokenRaw()

    private def readBareTokenRaw(): String = {
      val b = new StringBuilder
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c) || c == ';' || c == ',' ||
          c == ']' || c == ')') go = false
        else if (c == '.' &&
          (i + 1 >= s.length || !s.charAt(i + 1).isDigit)) go = false
        else { b.append(c); i += 1 }
      }
      if (b.isEmpty) fail("expected token")
      b.toString
    }
  }
}
