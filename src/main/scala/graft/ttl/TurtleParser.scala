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
  def parse(content: String): Seq[Triple] = parse(content, None)

  /** Parse with a base IRI: relative IRIs (including those introduced
    * by `@base` / `BASE` directives, themselves resolved against the
    * outer base) resolve per RFC 3986 §5.2. With `base = None` a
    * relative IRI is kept verbatim — the engine's historical behavior,
    * which its own document-local outputs (`<>` subjects) rely on. */
  def parse(content: String, base: Option[String]): Seq[Triple] =
    new P(content, base).document()

  /** RFC 3986 §5.2 reference resolution (public spec), enough for IRI
    * use: scheme/authority/path/query/fragment split by regex (§B),
    * merge + dot-segment removal (§5.2.3/5.2.4). */
  private val Rfc3986 =
    "^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(?://([^/?#]*))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$".r

  /** Scheme presence without a regex — this runs once per IRI on the
    * Turtle parse hot path. */
  private[ttl] def hasScheme(iri: String): Boolean = {
    if (iri.isEmpty || !iri.charAt(0).isLetter) return false
    var k = 1
    while (k < iri.length) {
      val c = iri.charAt(k)
      if (c == ':') return true
      if (!(c.isLetterOrDigit || c == '+' || c == '.' || c == '-'))
        return false
      k += 1
    }
    false
  }

  private[ttl] def resolveIri(base: String, ref: String): String = {
    def parts(s: String) = s match {
      case Rfc3986(sc, au, pa, qu, fr) =>
        (Option(sc), Option(au), Option(pa).getOrElse(""), Option(qu),
          Option(fr))
    }
    def removeDots(p: String): String = {
      val out = mutable.ArrayBuffer[String]()
      val abs = p.startsWith("/")
      val segs = p.split("/", -1)
      segs.foreach {
        case "." => ()
        case ".." => if (out.nonEmpty && out.last != "..") out.remove(out.length - 1)
          else if (!abs) out += ".."
        case s => out += s
      }
      // a trailing "." or ".." keeps the directory slash
      val trail = if (p.endsWith("/.") || p.endsWith("/..") ||
        p == "." || p == "..") "/" else ""
      val joined = out.mkString("/") + trail
      if (abs && !joined.startsWith("/")) "/" + joined else joined
    }
    val (bs, ba, bp, bq, _) = parts(base)
    val (rs, ra, rp, rq, rf) = parts(ref)
    val (ts, ta, tp, tq) =
      if (rs.isDefined) (rs, ra, removeDots(rp), rq)
      else if (ra.isDefined) (bs, ra, removeDots(rp), rq)
      else if (rp.isEmpty) (bs, ba, bp, rq.orElse(bq))
      else if (rp.startsWith("/")) (bs, ba, removeDots(rp), rq)
      else {
        // merge: base path up to last '/', then ref
        val dir = if (ba.isDefined && bp.isEmpty) "/"
          else bp.take(bp.lastIndexOf('/') + 1)
        (bs, ba, removeDots(dir + rp), rq)
      }
    ts.map(_ + ":").getOrElse("") +
      ta.map("//" + _).getOrElse("") + tp +
      tq.map("?" + _).getOrElse("") + rf.map("#" + _).getOrElse("")
  }

  /** Chars RAW-forbidden inside an IRIREF (`<...>`) by the Turtle /
    * N-Triples grammars: controls, space, and <>"{}|^`\ — they may
    * only appear via UCHAR escapes. */
  private[ttl] def badIriChar(c: Char): Boolean =
    c <= ' ' || "<>\"{}|^`\\".indexOf(c) >= 0

  /** LANGTAG ::= '@' [a-zA-Z]+ ('-' [a-zA-Z0-9]+)* */
  private val LangTagP =
    java.util.regex.Pattern.compile("[a-zA-Z]+(-[a-zA-Z0-9]+)*")
  private[ttl] def validLangTag(tag: String): Boolean =
    LangTagP.matcher(tag).matches()

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
          case other =>
            // strict ECHAR/UCHAR set: `\x` for any other x is a
            // syntax error per the Turtle/N-Triples grammars (W3C
            // negative-syntax tests turtle-syntax-bad-string-*) —
            // passing it through silently would corrupt the lexical
            throw new IllegalArgumentException(
              s"invalid escape '\\$other' in literal «$v»")
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private val XsdInteger = "<http://www.w3.org/2001/XMLSchema#integer>"
  private val XsdDecimal = "<http://www.w3.org/2001/XMLSchema#decimal>"
  private val XsdDouble = "<http://www.w3.org/2001/XMLSchema#double>"
  private val XsdBoolean = "<http://www.w3.org/2001/XMLSchema#boolean>"

  /** Bare DOUBLE lexicals — the full Turtle DOUBLE production:
    * mantissa + mandatory exponent (without an exponent a dotted
    * token is a DECIMAL), empty fraction allowed (`1.E0`):
    * readBareTokenRaw's exponent lookahead re-reads it, so every
    * DOUBLE lexical has ONE canonical spelling, the bare one, shared
    * by every reader via canonTyped. */
  private val BareDouble =
    "[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)[eE][+-]?[0-9]+"
  private val BareInteger = "[+-]?[0-9]+"
  private val BareDecimal = "[+-]?[0-9]*\\.[0-9]+"
  // precompiled: these run per-term on parse/serialize hot paths
  private val BareDoubleP = java.util.regex.Pattern.compile(BareDouble)
  private val BareIntegerP = java.util.regex.Pattern.compile(BareInteger)
  private val BareDecimalP = java.util.regex.Pattern.compile(BareDecimal)

  /** Canonical term for a typed literal with UNESCAPED lexical `lex`
    * and expanded datatype term `dt` (`<...>`). Turtle's bare tokens
    * (`42`, `12.5`, `1.2e3`, `true`) ARE xsd:integer/decimal/double/
    * boolean literals, so those datatypes canonicalize to the bare
    * spelling whenever the lexical form fits the bare grammar — one
    * spelling per RDF term across every reader (Turtle, RDF/XML,
    * JSON-LD). */
  def canonTyped(lex: String, dt: String): String = dt match {
    case XsdInteger if BareIntegerP.matcher(lex).matches() => lex
    case XsdDecimal if BareDecimalP.matcher(lex).matches() => lex
    case XsdDouble if BareDoubleP.matcher(lex).matches() => lex
    case XsdBoolean if lex == "true" || lex == "false" => lex
    case _ => "\"" + escape(lex) + "\"^^" + dt
  }

  /** Datatype for a bare token, for writers targeting formats with no
    * bare-token syntax (RDF/XML, JSON-LD). Exponent forms are
    * xsd:double per the Turtle grammar — calling them decimal would
    * change the literal's RDF identity on round-trip. */
  def bareTokenDatatype(tok: String): String =
    if (tok == "true" || tok == "false") XsdBoolean
    else if (BareIntegerP.matcher(tok).matches()) XsdInteger
    else if (BareDoubleP.matcher(tok).matches()) XsdDouble
    else XsdDecimal

  /** A lexical the Turtle grammar admits as a bare token — the
    * engine's canonical spelling for those four datatypes. */
  private[ttl] def isBareToken(t: String): Boolean =
    t == "true" || t == "false" ||
      BareIntegerP.matcher(t).matches() ||
      BareDecimalP.matcher(t).matches() ||
      BareDoubleP.matcher(t).matches()

  /** `\uXXXX` / `\UXXXXXXXX` hex payload at `from` (N-Triples UCHAR
    * decoding shares this with the Turtle reader). */
  private[ttl] def hexEscapeAt(v: String, from: Int, len: Int): Int =
    hexEscape(v, from, len)

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

  private final class P(s: String, initBase: Option[String]) {
    private var i = 0
    private var base: Option[String] = initBase
    private val prefixes = mutable.Map[String, String]()
    private val out = mutable.ArrayBuffer[Triple]()
    private var bnCount = 0
    private val bnMap = mutable.Map[String, String]()

    /** Resolve `iri` against the current base when it is relative (no
      * scheme). Without a base, keep it verbatim (engine-internal
      * documents use `<>` subjects with no base in scope). */
    private def resolve(iri: String): String =
      if (hasScheme(iri)) iri
      else base match {
        case Some(b) => resolveIri(b, iri)
        case None => iri
      }

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
        // @-directives are case-SENSITIVE keywords in the Turtle
        // grammar ('@prefix'/'@base'); only the SPARQL-style
        // PREFIX/BASE forms below are case-insensitive
        if (s.regionMatches(false, i, "@prefix", 0, 7)) prefixDirective()
        else if (s.regionMatches(false, i, "@base", 0, 5)) {
          i += 5; baseDirective(); ws(); expect('.')
        } else if (s.regionMatches(true, i, "BASE", 0, 4) &&
          i + 4 < s.length && Character.isWhitespace(s.charAt(i + 4))) {
          i += 4; baseDirective()
        } else if (s.regionMatches(true, i, "PREFIX", 0, 6) &&
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

    /** `@base <iri> .` / `BASE <iri>` — the new base itself resolves
      * against the base in scope (RFC 3986 chained resolution). */
    private def baseDirective(): Unit = {
      ws()
      if (peek != '<') fail("expected IRIREF in @base")
      base = Some(resolve(readIriRaw()))
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
      // resolved at DECLARATION time: a later @base must not move
      // an already-declared prefix
      val iri = resolve(readIriRaw())
      prefixes(ns.toString) = iri
    }

    private def statement(): Unit = {
      val wasBnode = peek == '['
      val subj = peek match {
        case '[' => bnodePropertyList()
        case '(' => collection()
        case '<' => readIri()
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
      if (peek == '<') readIri()
      else if (peek == 'a' && i + 1 < s.length &&
        Character.isWhitespace(s.charAt(i + 1))) { i += 1; RdfType }
      else readPname()

    private def readObject(): String = peek match {
      case '<' => readIri()
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

    /** IRIREF body: raw chars validated against the grammar's
      * excluded set (controls, space, <>"{}|^`\ — W3C negative tests
      * turtle-syntax-bad-uri-*), UCHAR escapes decoded so the
      * canonical term carries the actual codepoints. */
    private def readIriRaw(): String = {
      expect('<')
      val b = new StringBuilder
      while (peek != '>') {
        if (i >= s.length) fail("unterminated IRI")
        val c = peek
        if (c == '\\') {
          val e = if (i + 1 < s.length) s.charAt(i + 1) else '\u0000'
          if (e == 'u') {
            b.appendAll(Character.toChars(hexEscape(s, i + 2, 4))); i += 6
          } else if (e == 'U') {
            b.appendAll(Character.toChars(hexEscape(s, i + 2, 8))); i += 10
          } else fail(s"invalid escape '\\$e' in IRI (only \\u/\\U)")
        } else if (badIriChar(c)) {
          fail(s"character '$c' (0x${c.toInt.toHexString}) not allowed " +
            "raw in an IRI")
        } else { b.append(c); i += 1 }
      }
      i += 1
      b.toString
    }

    /** A full IRI term: IRIREF read, resolved, wrapped. */
    private def readIri(): String = s"<${resolve(readIriRaw())}>"

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
      def isHex(c: Char) = (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      // PERCENT ::= '%' HEX HEX — kept RAW in the IRI (the grammar
      // treats %XX as opaque name chars, NOT percent-decoding them)
      def atPercent = peek == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))
      while (isPnameChar(peek) || atPercent ||
        (peek == '\\' && i + 1 < s.length &&
          pnLocalEsc.indexOf(s.charAt(i + 1)) >= 0)) {
        if (atPercent) {
          // three source chars, three name chars, none a rollback dot
          local.append(s.charAt(i)).append(s.charAt(i + 1))
            .append(s.charAt(i + 2))
          escaped += true; escaped += true; escaped += true
          i += 3
        } else
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
        val dt = if (peek == '<') readIri() else readPname()
        canonTyped(lex, dt)
      } else if (peek == '@') {
        i += 1
        val tag = new StringBuilder
        while (Character.isLetterOrDigit(peek) || peek == '-') {
          tag.append(peek); i += 1
        }
        if (!validLangTag(tag.toString))
          fail(s"malformed language tag '@$tag'")
        canon + "@" + tag.toString
      } else canon
    }

    /** Bare numeric/boolean token, ended by whitespace or punctuation;
      * a trailing '.' is the statement terminator unless followed by
      * a digit (decimal point) or an exponent (`1.E0` is a legal
      * DOUBLE with empty fraction). Validated against the INTEGER /
      * DECIMAL / DOUBLE productions — `123abc` is a syntax error
      * (W3C turtle-syntax-bad-num-*), not a term. */
    private def readBareToken(): String = {
      val t = readBareTokenRaw()
      if (!(BareIntegerP.matcher(t).matches() ||
        BareDecimalP.matcher(t).matches() ||
        BareDoubleP.matcher(t).matches()))
        fail(s"malformed numeric literal '$t'")
      t
    }

    /** A '.' continues the token only before a digit (decimal point)
      * or before a COMPLETE exponent (`[eE][+-]?[0-9]`, the `1.E0`
      * empty-fraction DOUBLE). `2.e:c` has no exponent digits, so per
      * longest-match the dot is the statement terminator and `e:c` a
      * prefixed name — a lookahead on the marker alone would swallow
      * legal documents. */
    private def dotContinuesToken(hasDigits: Boolean): Boolean = {
      if (i + 1 >= s.length) return false
      val n = s.charAt(i + 1)
      if (n.isDigit) return true
      if ((n != 'e' && n != 'E') || !hasDigits) return false
      if (i + 2 >= s.length) false
      else if (s.charAt(i + 2).isDigit) true
      else (s.charAt(i + 2) == '+' || s.charAt(i + 2) == '-') &&
        i + 3 < s.length && s.charAt(i + 3).isDigit
    }

    private def readBareTokenRaw(): String = {
      val b = new StringBuilder
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c) || c == ';' || c == ',' ||
          c == ']' || c == ')') go = false
        else if (c == '.' &&
          !dotContinuesToken(b.nonEmpty && b.last.isDigit)) go = false
        else { b.append(c); i += 1 }
      }
      if (b.isEmpty) fail("expected token")
      b.toString
    }
  }
}
