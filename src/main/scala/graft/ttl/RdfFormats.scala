package graft.ttl

import graft.ttl.Turtle.Triple
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** S10 format coverage beyond Turtle/N-Triples: RDF/XML and JSON-LD
  * readers + writers, and the `Rdf` load/serialize dispatcher
  * mirroring the reference's format switch (mongo-etl/utils/
  * rdf_utils.py:259-299 — rdflib `parse/serialize(format=turtle|xml|
  * n3|nt|json-ld)`).
  *
  * Both readers emit the SAME canonical terms as TurtleParser (IRIs
  * as absolute `<...>`, literals escaped with the engine's rules,
  * blank nodes `_:bN` in first-use order), so a graph loaded from any
  * format compares equal triple-for-triple. JDK-only dependencies:
  * DOM for XML, Jackson (already on Spark's classpath) for JSON-LD.
  */
object RdfXml {
  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  def parse(content: String): Seq[Triple] = parse(content, None)

  /** `base` is the document base IRI: it resolves `rdf:ID="x"` to
    * `<base#x>` and relative `rdf:about`/`rdf:resource`/`rdf:datatype`
    * references per RFC 3986; scoped `xml:base` attributes override it
    * per XML Base (a relative xml:base resolves against the outer
    * one). Without any base in scope, relative references are kept
    * VERBATIM — the same documented deviation as the Turtle and
    * N-Triples readers (the engine's pipelines emit document-local
    * `<>` terms) — while rdf:ID (whose whole meaning is base#frag)
    * and a relative xml:base stay loud errors. */
  def parse(content: String, base: Option[String]): Seq[Triple] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // No entity resolution of ANY kind: an executor parsing untrusted
    // RDF/XML must not read local files via a DOCTYPE SYSTEM entity
    // (XXE) — disallow DOCTYPE outright, plus belt-and-braces the
    // external-entity features.
    dbf.setFeature(
      "http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature(
      "http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature(
      "http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setFeature(
      "http://apache.org/xml/features/nonvalidating/load-external-dtd",
      false)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(content)))
    val st = new XmlState(base)
    val root = doc.getDocumentElement
    if (root.getNamespaceURI == RdfNs && root.getLocalName == "RDF")
      childElements(root).foreach(e => st.nodeElement(e))
    else st.nodeElement(root) // a single node element as document root
    st.out.toSeq
  }

  private def childElements(n: org.w3c.dom.Node)
    : Seq[org.w3c.dom.Element] = {
    val kids = n.getChildNodes
    (0 until kids.getLength).map(kids.item)
      .collect { case e: org.w3c.dom.Element => e }
  }

  private final class XmlState(base: Option[String]) {
    val out = mutable.ArrayBuffer[Triple]()
    private var bnCount = 0
    private val bnMap = mutable.Map[String, String]()
    private def freshBn(): String = { val l = s"_:b$bnCount"; bnCount += 1; l }
    private def nodeId(id: String): String =
      bnMap.getOrElseUpdate(id, freshBn())

    /** DOM's getAttributeNS returns "" for a MISSING attribute, so
      * presence must come from hasAttributeNS — an empty rdf:about=""
      * / rdf:resource="" is a legal reference to the base IRI itself,
      * not an absent attribute. */
    private def rdfAttr(e: org.w3c.dom.Element, local: String)
      : Option[String] =
      if (e.hasAttributeNS(RdfNs, local))
        Some(e.getAttributeNS(RdfNs, local))
      else None

    private val XmlNs = "http://www.w3.org/XML/1998/namespace"

    /** In-scope base IRI for `e` (XML Base): every `xml:base` on the
      * root→e chain applies, each resolved against the one above it
      * (a relative xml:base is itself a reference); the outermost
      * base is the caller's `parse(content, base)` argument. */
    private def inheritedBase(e: org.w3c.dom.Element): Option[String] = {
      var chain = List.empty[String]
      var n: org.w3c.dom.Node = e
      while (n != null) {
        n match {
          case el: org.w3c.dom.Element
            if el.hasAttributeNS(XmlNs, "base") =>
            chain = el.getAttributeNS(XmlNs, "base") :: chain
          case _ =>
        }
        n = n.getParentNode
      }
      chain.foldLeft(base) {
        case (_, b) if TurtleParser.hasScheme(b) => Some(b)
        case (Some(outer), b) => Some(TurtleParser.resolveIri(outer, b))
        case (None, b) => throw new IllegalArgumentException(
          s"""relative xml:base="$b" with no outer base IRI to """ +
            "resolve against — pass one via parse(content, Some(base))")
      }
    }

    /** Resolve an IRI reference (rdf:about / rdf:resource /
      * rdf:datatype / rdf:type) against the in-scope base. With NO
      * base in scope the reference is kept VERBATIM — the same
      * documented deviation as the Turtle and N-Triples readers
      * (w3c/README.md #2): the engine's own pipelines emit
      * document-local `<>` subjects (rdflib's graph-as-document
      * idiom), and the four formats must round-trip each other's
      * output without a base. */
    private def resolveRef(e: org.w3c.dom.Element, ref: String): String =
      if (TurtleParser.hasScheme(ref)) ref
      else inheritedBase(e) match {
        case Some(b) => TurtleParser.resolveIri(b, ref)
        case None => ref
      }

    /** Nearest xml:lang walking UP the element chain (the attribute
      * is scoped per the XML spec); an explicit xml:lang="" cancels
      * any outer tag. */
    private def inheritedLang(e: org.w3c.dom.Element): Option[String] = {
      var n: org.w3c.dom.Node = e
      while (n != null) {
        n match {
          case el: org.w3c.dom.Element
            if el.hasAttributeNS(XmlNs, "lang") =>
            val l = el.getAttributeNS(XmlNs, "lang")
            return if (l.isEmpty) None else Some(l)
          case _ =>
        }
        n = n.getParentNode
      }
      None
    }

    /** A node/property element with no namespace would interpolate the
      * literal string "null" into the IRI — fail loudly instead (the
      * module contract is "unsupported input throws, never corrupts"). */
    private def qnameIri(e: org.w3c.dom.Element): String = {
      val ns = e.getNamespaceURI
      if (ns == null) throw new IllegalArgumentException(
        s"element '${e.getNodeName}' has no XML namespace — RDF/XML " +
          "node and property elements must be namespace-qualified")
      s"<$ns${e.getLocalName}>"
    }

    /** Node element → subject term; emits its triples. */
    def nodeElement(e: org.w3c.dom.Element): String = {
      val subj = rdfAttr(e, "about").map(a => s"<${resolveRef(e, a)}>")
        .orElse(rdfAttr(e, "ID").map { id =>
          inheritedBase(e) match {
            // rdf:ID="x" names the in-document fragment <base#x>;
            // "#x" against the base strips any base fragment per
            // RFC 3986, matching the RDF/XML spec's baseURI + "#" + id
            case Some(b) => s"<${TurtleParser.resolveIri(b, "#" + id)}>"
            case None => throw new IllegalArgumentException(
              s"""rdf:ID="$id" requires a base IRI to resolve against """ +
                "— pass one via parse(content, Some(base)), or use " +
                "rdf:about with an absolute IRI")
          }
        })
        .orElse(rdfAttr(e, "nodeID").map(nodeId))
        .getOrElse(freshBn())
      if (!(e.getNamespaceURI == RdfNs && e.getLocalName == "Description"))
        out += Triple(subj, TurtleParser.RdfType, qnameIri(e))
      // non-rdf attributes are literal property shorthands
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item).foreach {
        case a: org.w3c.dom.Attr
          if a.getNamespaceURI != null && a.getNamespaceURI != RdfNs &&
            a.getNamespaceURI != "http://www.w3.org/2000/xmlns/" &&
            a.getNamespaceURI != "http://www.w3.org/XML/1998/namespace" =>
          // property-attribute literals take the IN-SCOPE xml:lang
          // exactly like property-element literals (the spec's
          // literal-language := e.language) — the two spellings of
          // one document must emit the same RDF term
          val lit = "\"" + TurtleParser.escape(a.getValue) + "\""
          out += Triple(subj, s"<${a.getNamespaceURI}${a.getLocalName}>",
            inheritedLang(e).map(l => lit + "@" + l).getOrElse(lit))
        // a namespace-less attribute (bare `xmlns` declares the default
        // namespace and carries the xmlns NS URI, so it is NOT this
        // case) would become a "<nullfoo>" predicate — fail loudly
        case a: org.w3c.dom.Attr if a.getNamespaceURI == null =>
          throw new IllegalArgumentException(
            s"attribute '${a.getName}' has no XML namespace — RDF/XML " +
              "property-attribute shorthands must be namespace-qualified")
        case a: org.w3c.dom.Attr if a.getNamespaceURI == RdfNs =>
          a.getLocalName match {
            case "about" | "ID" | "nodeID" => () // the subject, read above
            case "type" => // valid property-attribute shorthand:
              // (subj, rdf:type, <value>) — dropping it would lose a
              // triple silently
              out += Triple(subj, TurtleParser.RdfType,
                s"<${resolveRef(e, a.getValue)}>")
            case other => throw new IllegalArgumentException(
              s"unsupported rdf:$other attribute on a node element — " +
                "refusing to drop it silently")
          }
        case _ => // xmlns / xml:* declarations carry no triples here
      }
      childElements(e).foreach(p => propertyElement(subj, p))
      subj
    }

    private val RdfFirst = s"<${RdfNs}first>"
    private val RdfRest = s"<${RdfNs}rest>"
    private val RdfNil = s"<${RdfNs}nil>"

    private def propertyElement(subj: String,
      p: org.w3c.dom.Element): Unit = {
      if (p.getNamespaceURI == RdfNs && p.getLocalName == "li")
        throw new IllegalArgumentException(
          "rdf:li / container membership is not supported by this reader")
      val pred = qnameIri(p)
      val kids = childElements(p)

      // Audit the attribute set FIRST — every attribute must be one
      // this reader understands, or we throw instead of dropping it
      // (an ignored rdf:ID would silently lose the spec's reification
      // triples; an ignored property attribute would lose a literal).
      var propAttrs = Vector.empty[(String, String)]
      var typeAttr: Option[String] = None
      val pAttrs = p.getAttributes
      (0 until pAttrs.getLength).map(pAttrs.item).foreach {
        case a: org.w3c.dom.Attr if a.getNamespaceURI == RdfNs =>
          a.getLocalName match {
            case "resource" | "nodeID" | "datatype" | "parseType"
              | "ID" => () // read below
            case "type" => typeAttr = Some(resolveRef(p, a.getValue))
            case other => throw new IllegalArgumentException(
              s"unsupported rdf:$other attribute on a property " +
                "element — refusing to drop it silently")
          }
        case a: org.w3c.dom.Attr if a.getNamespaceURI == null =>
          throw new IllegalArgumentException(
            s"attribute '${a.getName}' has no XML namespace — RDF/XML " +
              "property attributes must be namespace-qualified")
        case a: org.w3c.dom.Attr
          if a.getNamespaceURI != "http://www.w3.org/2000/xmlns/" &&
            a.getNamespaceURI != XmlNs =>
          propAttrs :+= ((s"<${a.getNamespaceURI}${a.getLocalName}>",
            a.getValue))
        case _ => // xmlns / xml:* declarations carry no triples here
      }

      // rdf:ID on a PROPERTY element reifies the statement (RDF/XML
      // spec §7.3): <base#id> gets rdf:type rdf:Statement plus
      // subject/predicate/object triples pointing at the main triple.
      val reify = rdfAttr(p, "ID").map { id =>
        inheritedBase(p) match {
          case Some(b) => s"<${TurtleParser.resolveIri(b, "#" + id)}>"
          case None => throw new IllegalArgumentException(
            s"""rdf:ID="$id" requires a base IRI to resolve against """ +
              "— pass one via parse(content, Some(base))")
        }
      }
      def emit(obj: String): Unit = {
        out += Triple(subj, pred, obj)
        reify.foreach { st =>
          out += Triple(st, TurtleParser.RdfType, s"<${RdfNs}Statement>")
          out += Triple(st, s"<${RdfNs}subject>", subj)
          out += Triple(st, s"<${RdfNs}predicate>", pred)
          out += Triple(st, s"<${RdfNs}object>", obj)
        }
      }
      // rdf:parseType shorthands (rdflib's pretty-xml emits Resource
      // and Collection); "Literal" (XML content) stays a loud error —
      // silently stringifying markup would corrupt data.
      val pt = rdfAttr(p, "parseType")
      if (pt.isDefined && (propAttrs.nonEmpty || typeAttr.isDefined))
        throw new IllegalArgumentException(
          s"rdf:parseType=\"${pt.get}\" cannot combine with property " +
            "attributes — refusing to drop them silently")
      // parseTypeResourcePropertyElt/...CollectionPropertyElt allow
      // ONLY rdf:ID besides parseType: a co-present resource/nodeID/
      // datatype would be silently shadowed by the parse-typed body
      if (pt.isDefined)
        Seq("resource", "nodeID", "datatype").foreach { a =>
          if (rdfAttr(p, a).isDefined) throw new IllegalArgumentException(
            s"rdf:parseType=\"${pt.get}\" cannot combine with rdf:$a " +
              "— refusing to drop it silently")
        }
      if (pt.exists(t => t == "Resource" || t == "Collection") &&
        kids.isEmpty && p.getTextContent.trim.nonEmpty)
        throw new IllegalArgumentException(
          s"rdf:parseType=\"${pt.get}\" body must be element content, " +
            s"got text «${p.getTextContent.trim.take(40)}» — refusing " +
            "to drop it silently")
      pt match {
        case Some("Resource") =>
          // the property element body IS a property list of a fresh bnode
          val b = freshBn()
          emit(b)
          kids.foreach(k => propertyElement(b, k))
          return
        case Some("Collection") =>
          // children are list items → rdf:first/rest chain. Item terms
          // are evaluated BEFORE chain cells are allocated — the same
          // label order as the Turtle and JSON-LD collection readers,
          // so the three formats stay canonical-label-identical.
          if (kids.isEmpty) { emit(RdfNil); return }
          val items = kids.map(nodeElement)
          val cells = items.map(_ => freshBn())
          emit(cells.head)
          for (idx <- items.indices) {
            out += Triple(cells(idx), RdfFirst, items(idx))
            out += Triple(cells(idx), RdfRest,
              if (idx + 1 < items.length) cells(idx + 1) else RdfNil)
          }
          return
        case Some(other) =>
          throw new IllegalArgumentException(
            s"rdf:parseType=\"$other\" is not supported by this reader")
        case None => ()
      }
      if (propAttrs.nonEmpty || typeAttr.isDefined) {
        // emptyPropertyElt with property attributes (spec §7.2.21's
        // last production): the object is an implicit node whose
        // properties are the attributes themselves.
        if (kids.nonEmpty || p.getTextContent.trim.nonEmpty ||
          rdfAttr(p, "datatype").isDefined)
          throw new IllegalArgumentException(
            "property attributes require an EMPTY property element " +
              "(no element/text content, no rdf:datatype)")
        val obj = rdfAttr(p, "resource").map(r => s"<${resolveRef(p, r)}>")
          .orElse(rdfAttr(p, "nodeID").map(nodeId))
          .getOrElse(freshBn())
        emit(obj)
        typeAttr.foreach(t =>
          out += Triple(obj, TurtleParser.RdfType, s"<$t>"))
        // property-attribute literals take the in-scope xml:lang,
        // same as on node elements
        val lang = inheritedLang(p)
        propAttrs.foreach { case (ap, v) =>
          val lit = "\"" + TurtleParser.escape(v) + "\""
          out += Triple(obj, ap, lang.map(l => lit + "@" + l).getOrElse(lit))
        }
        return
      }
      // a resource/nodeID object requires an EMPTY property element
      // (emptyPropertyElt production); element or text content beside
      // it would be silently shadowed. Likewise, resourcePropertyElt
      // has exactly ONE node-element child — a second child's whole
      // subtree would vanish.
      if ((rdfAttr(p, "resource").isDefined ||
        rdfAttr(p, "nodeID").isDefined) &&
        (kids.nonEmpty || p.getTextContent.trim.nonEmpty))
        throw new IllegalArgumentException(
          "rdf:resource/rdf:nodeID require an empty property element " +
            "— refusing to drop the element/text content silently")
      if (kids.length > 1)
        throw new IllegalArgumentException(
          s"property element <${p.getNodeName}> has ${kids.length} " +
            "node-element children; resourcePropertyElt allows one — " +
            "refusing to drop the others silently")
      val obj =
        rdfAttr(p, "resource").map(r => s"<${resolveRef(p, r)}>")
          .orElse(rdfAttr(p, "nodeID").map(nodeId))
          .getOrElse {
            if (kids.nonEmpty) nodeElement(kids.head)
            else {
              val lex = p.getTextContent
              val dt = rdfAttr(p, "datatype").map(resolveRef(p, _))
              // xml:lang is SCOPED: it inherits from ancestor elements
              // (rdf:RDF, the node element, …) until overridden —
              // reading only the property element would silently strip
              // language tags the document declares once at the top
              val lang = inheritedLang(p)
              dt.map(d => TurtleParser.canonTyped(lex, s"<$d>"))
                .orElse(lang.map(l =>
                  "\"" + TurtleParser.escape(lex) + "\"@" + l))
                .getOrElse("\"" + TurtleParser.escape(lex) + "\"")
            }
          }
      emit(obj)
    }
  }

  /** Predicate IRI → (namespace, local) where local is the longest
    * IRI suffix that is a valid XML NCName — an all-digit tail (e.g.
    * <http://ex.org/123>) has none and CANNOT be serialized as
    * RDF/XML (a real limitation of the format); fail loudly. */
  private def splitQName(iri: String): (String, String) = {
    def ncChar(c: Char) = Character.isLetterOrDigit(c) ||
      c == '_' || c == '-' || c == '.'
    def ncStart(c: Char) = Character.isLetter(c) || c == '_'
    var idx = iri.length
    var i = iri.length - 1
    while (i >= 0 && ncChar(iri.charAt(i))) {
      if (ncStart(iri.charAt(i))) idx = i
      i -= 1
    }
    if (idx == iri.length)
      throw new IllegalArgumentException(
        s"predicate IRI <$iri> has no XML-serializable local name")
    (iri.substring(0, idx), iri.substring(idx))
  }

  /** Deterministic RDF/XML writer: one rdf:Description per subject,
    * subjects and predicates sorted (same canonical ordering rule as
    * Turtle.serialize). Terms must be in canonical form. */
  def write(triples: Seq[Triple]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<rdf:RDF xmlns:rdf="$RdfNs">\n""")
    // '\r' must be a character reference: XML parsers normalize raw
    // CR (and CRLF) to LF in content, silently corrupting literals.
    def xmlEsc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
      .replace("\r", "&#13;")
    for ((s, ts) <- triples.groupBy(_.s).toSeq.sortBy(_._1)) {
      // rdf:nodeID must be an NCName — it cannot START with a digit,
      // but relabeled bnode tags are hex (`_:3fa2…_b0`), so emitted
      // labels get a letter prefix. The reader re-canonicalizes every
      // nodeID to fresh `_:bN` labels anyway (label text is not
      // identity across documents), so round-trips are unaffected —
      // while spec-compliant parsers (rdflib/Jena) stop rejecting the
      // output.
      val about =
        if (s.startsWith("_:")) s"""rdf:nodeID="b${s.drop(2)}""""
        else s"""rdf:about="${xmlEsc(s.stripPrefix("<").stripSuffix(">"))}""""
      sb.append(s"  <rdf:Description $about>\n")
      for (t <- ts.sortBy(tt => (tt.p, tt.o))) {
        val (ns, local) = splitQName(t.p.stripPrefix("<").stripSuffix(">"))
        val tag = s"""n:$local xmlns:n="${xmlEsc(ns)}""""
        t.o match {
          case o if o.startsWith("<") =>
            sb.append(s"""    <$tag rdf:resource="${
              xmlEsc(o.stripPrefix("<").stripSuffix(">"))}"/>\n""")
          case o if o.startsWith("_:") => // NCName letter prefix, as above
            sb.append(s"""    <$tag rdf:nodeID="b${o.drop(2)}"/>\n""")
          case o if o.startsWith("\"") =>
            val vEnd = o.lastIndexOf('"')
            val v = xmlEsc(TurtleParser.unescape(o.substring(1, vEnd)))
            val suffix = o.substring(vEnd + 1)
            if (suffix.startsWith("^^"))
              sb.append(s"""    <$tag rdf:datatype="${xmlEsc(suffix
                .drop(2).stripPrefix("<").stripSuffix(">"))}">$v</n:$local>\n""")
            else if (suffix.startsWith("@"))
              sb.append(s"""    <$tag xml:lang="${suffix.drop(1)}">$v</n:$local>\n""")
            else sb.append(s"    <$tag>$v</n:$local>\n")
          case o =>
            // bare numeric/boolean token: XML has no bare syntax, so
            // write the equivalent typed literal; parse canonicalizes
            // it back to the bare token (TurtleParser.canonTyped)
            val dt = TurtleParser.bareTokenDatatype(o)
              .stripPrefix("<").stripSuffix(">")
            sb.append(s"""    <$tag rdf:datatype="${
              xmlEsc(dt)}">${xmlEsc(o)}</n:$local>\n""")
        }
      }
      sb.append("  </rdf:Description>\n")
    }
    sb.append("</rdf:RDF>\n")
    sb.toString
  }
}

/** JSON-LD reader/writer for the idioms the reference ecosystem emits
  * (rdf_utils.py:285-300 accepts any rdflib-parsable JSON-LD): node
  * objects with `@id`/`@type`, `@graph` arrays, `@value` / `@type` /
  * `@language` literal objects, `@id` reference objects, nested node
  * objects (blank nodes), `@list` collections, and plain
  * string/number/boolean values.
  *
  * `@context` processing covers the inline forms real documents use:
  *  - term → absolute-IRI strings and prefix:suffix compact IRIs;
  *  - EXPANDED term definitions `{"@id": …, "@type": "@id"|dtype,
  *    "@language": …, "@container": "@set"|"@list"|"@language"|
  *    "@index"}` with type coercion (a coerced plain string becomes
  *    an IRI reference or typed literal); a `@list` container wraps
  *    the term's values in an rdf:first/rest chain exactly like an
  *    explicit `@list`; a `@language` container reads a language map
  *    (key = tag, `@none` = untagged); an `@index` container drops
  *    its keys (no RDF meaning) and processes the values;
  *  - `@reverse` — both the node-object keyword (`"@reverse": {p:
  *    nodes}` emits (node, p, subject) triples) and reverse TERM
  *    definitions (`{"@reverse": iri}`; a reverse term used inside
  *    `@reverse` flips back to forward, per the spec);
  *  - context-wide `"@vocab"`, `"@base"` (relative-IRI resolution)
  *    and default `"@language"`;
  *  - ARRAY-form contexts (merged left→right) and `null` entries
  *    (term / default-language removal).
  * Remote context URLs resolve from a CALLER-SUPPLIED map (url →
  * context document) — nothing here fetches (zero-egress), unlike
  * the reference's rdflib path which dereferences them over HTTP
  * (geosparql-etl U-RDF:285-300). A document naming a URL absent
  * from the map throws with the URL, rather than silently
  * mis-reading; unsupported keys likewise throw. */
object JsonLd {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  private val XsdInteger = "<http://www.w3.org/2001/XMLSchema#integer>"

  /** A term's definition: target IRI, optional type coercion
    * ("@id" or an expanded datatype IRI), optional per-term language
    * (Some(None) = explicit null clearing the context default),
    * optional container ("@set" is a no-op, "@list" wraps values in
    * an RDF collection), and whether the term is a REVERSE property
    * (its values become subjects). */
  private final case class TermDef(iri: String,
    coerce: Option[String] = None,
    lang: Option[Option[String]] = None,
    container: Option[String] = None,
    reverse: Boolean = false)

  /** Validate a language tag at EMISSION (covers every source: the
    * @value branch, language-map keys, per-term and context-default
    * @language): a malformed tag concatenated into the term would
    * violate the LANGTAG grammar and corrupt cross-format graph
    * equality silently. */
  private def langTag(tag: String): String = {
    if (!TurtleParser.validLangTag(tag))
      throw new IllegalArgumentException(
        s"invalid @language tag '$tag' (LANGTAG ::= " +
          "[a-zA-Z]+('-'[a-zA-Z0-9]+)*)")
    tag
  }

  /** Accumulated context state along one node-object path. */
  private final case class Ctx(terms: Map[String, TermDef],
    vocab: Option[String], base: Option[String], lang: Option[String])
  private object Ctx { val empty = Ctx(Map.empty, None, None, None) }

  def parse(content: String): Seq[Triple] = parse(content, Map.empty)

  /** Parse with remote `@context` URLs resolved from `remoteContexts`
    * (url → the context DOCUMENT's JSON, i.e. either a bare context
    * object/array or a wrapper `{"@context": …}` as served on the
    * web). Resolution is recursive — a mapped document may itself
    * name another mapped URL — with cycles detected. */
  def parse(content: String,
    remoteContexts: Map[String, String]): Seq[Triple] = {
    val root = new ObjectMapper().readTree(content)
    val st = new LdState(remoteContexts)
    root match {
      case a: ArrayNode => a.elements().asScala.foreach(n =>
        st.nodeObject(nodeObj(n), Ctx.empty))
      case o: ObjectNode =>
        val ctx = st.context(o, Ctx.empty)
        if (o.has("@graph")) {
          // this module is triples-only: a root object carrying keys
          // besides @context/@graph is a NAMED graph (quad semantics)
          // or root-level content — dropping either would corrupt
          val extra = o.properties().asScala.map(_.getKey)
            .filterNot(k => k == "@context" || k == "@graph")
          if (extra.nonEmpty) throw new IllegalArgumentException(
            s"@graph with sibling keys ${extra.mkString(", ")} — named " +
              "graphs (quads) are not supported by this triples-only " +
              "reader; refusing to drop them silently")
        }
        Option(o.get("@graph")) match {
          case Some(g: ArrayNode) => g.elements().asScala.foreach(n =>
            st.nodeObject(nodeObj(n), ctx))
          // a single node object is a valid @graph value
          case Some(g: ObjectNode) => st.nodeObject(g, ctx)
          case Some(other) => throw new IllegalArgumentException(
            s"@graph must be a node object or an array of node " +
              s"objects, got $other")
          // nodeObject merges the node's own @context itself — pass
          // the EMPTY parent, not ctx, or the context merges twice
          case None => st.nodeObject(o, Ctx.empty)
        }
      case other =>
        throw new IllegalArgumentException(
          s"JSON-LD root must be object or array, got $other")
    }
    st.out.toSeq
  }

  /** Loud error contract for array elements that must be node
    * objects (a raw ClassCastException carries no context). */
  private def nodeObj(n: JsonNode): ObjectNode = n match {
    case o: ObjectNode => o
    case other => throw new IllegalArgumentException(
      s"expected a JSON-LD node object, got $other")
  }

  private final class LdState(
    resolver: Map[String, String] = Map.empty) {
    val out = mutable.ArrayBuffer[Triple]()
    private var bnCount = 0
    private val bnMap = mutable.Map[String, String]()
    private val loadingCtx = mutable.Set[String]()
    private def freshBn(): String = { val l = s"_:b$bnCount"; bnCount += 1; l }

    /** Merge a node's `@context` (object, array of objects, or null)
      * into `parent`. */
    def context(o: ObjectNode, parent: Ctx): Ctx =
      Option(o.get("@context")).fold(parent)(mergeContext(parent, _))

    private def mergeContext(parent: Ctx, node: JsonNode): Ctx =
      node match {
        case a: ArrayNode =>
          a.elements().asScala.foldLeft(parent)(mergeContext)
        case _ if node.isNull => Ctx.empty // null context = reset
        case c: ObjectNode =>
          // TWO-PHASE merge: JSON-LD term resolution is ORDER-
          // INDEPENDENT within one context object — a definition may
          // use a prefix or term defined later in the same object
          // ({"label": "rdfs:label", "rdfs": <…>} is valid). Phase 1
          // takes the keywords and collects raw term entries; phase 2
          // resolves each definition lazily against the FULL map
          // (memoized, self-references falling back to the parent
          // context per the spec's term-definition algorithm).
          var base = parent
          val raw = mutable.LinkedHashMap[String, JsonNode]()
          c.properties().asScala.foreach { e =>
            (e.getKey, e.getValue) match {
              case ("@vocab", v) =>
                base = base.copy(vocab = if (v.isNull) None else Some(v.asText))
              case ("@base", v) =>
                base = base.copy(base = if (v.isNull) None else Some(v.asText))
              case ("@language", v) =>
                base = base.copy(lang = if (v.isNull) None else Some(v.asText))
              case ("@version", _) => () // 1.1 marker, no-op here
              case (k, _) if k.startsWith("@") =>
                throw new IllegalArgumentException(
                  s"unsupported @context keyword $k")
              case (term, v) => raw(term) = v
            }
          }
          val ctx0 = base
          val defined = mutable.Map[String, Option[TermDef]]()
          val inProgress = mutable.Set[String]()
          def define(term: String): Option[TermDef] =
            defined.getOrElseUpdate(term, {
              inProgress += term
              try {
                raw(term) match {
                  case v if v.isNull => None // null: remove the term
                  case v if v.isTextual =>
                    Some(TermDef(expandDefIri(v.asText, lookup)))
                  case v: ObjectNode =>
                    Some(termDef(term, v, lookup, ctx0))
                  case v => throw new IllegalArgumentException(
                    s"unsupported @context entry for '$term': $v")
                }
              } finally inProgress -= term
            })
          def lookup(term: String): Option[TermDef] =
            if (!raw.contains(term)) ctx0.terms.get(term)
            else if (inProgress.contains(term))
              // a definition referring to ITSELF resolves against the
              // parent context; with no parent definition it is a
              // genuine cycle — refuse rather than emit verbatim IRIs
              Some(ctx0.terms.getOrElse(term,
                throw new IllegalArgumentException(
                  s"cyclic term definition '$term' in @context")))
            else define(term)
          ctx0.copy(terms = raw.keys.foldLeft(ctx0.terms) { (m, t) =>
            define(t) match {
              case Some(d) => m + (t -> d)
              case None => m - t
            }
          })
        case _ if node.isTextual =>
          val url = node.asText
          val doc = resolver.getOrElse(url,
            throw new IllegalArgumentException(
              s"remote @context URL $url is not in the supplied " +
                "context map — fetch it out of band and pass it via " +
                "JsonLd.parse(content, remoteContexts) (nothing here " +
                "performs network access)"))
          if (!loadingCtx.add(url))
            throw new IllegalArgumentException(
              s"cyclic remote @context reference: $url")
          try {
            val root = new ObjectMapper().readTree(doc)
            // a served context document usually wraps the context in
            // {"@context": …}; accept a bare context object/array too
            val ctxNode = root match {
              case o: ObjectNode if o.has("@context") => o.get("@context")
              case other => other
            }
            mergeContext(parent, ctxNode)
          } finally loadingCtx.remove(url)
        case other => throw new IllegalArgumentException(
          s"unsupported @context form: $other")
      }

    /** Expanded term definition {"@id":…, "@type":…, "@language":…,
      * "@container":"@set"|"@list", "@reverse":…}. `lookup` resolves
      * sibling terms/prefixes order-independently (see mergeContext);
      * `ctx0` carries the keyword state (@vocab). */
    private def termDef(term: String, o: ObjectNode,
      lookup: String => Option[TermDef], ctx0: Ctx): TermDef = {
      o.properties().asScala.foreach { e =>
        e.getKey match {
          case "@id" | "@type" | "@language" | "@reverse" => ()
          case "@container" =>
            val c = e.getValue.asText
            if (!Set("@set", "@list", "@language", "@index").contains(c))
              throw new IllegalArgumentException(
                s"unsupported @container '$c' for term '$term' " +
                  "(@set, @list, @language, @index are supported)")
          case k => throw new IllegalArgumentException(
            s"unsupported key $k in term definition for '$term'")
        }
      }
      val rev = Option(o.get("@reverse"))
      if (rev.isDefined && o.has("@id"))
        throw new IllegalArgumentException(
          s"term '$term' has both @id and @reverse")
      val container = Option(o.get("@container")).map(_.asText)
      if (rev.isDefined &&
        container.exists(c => c == "@list" || c == "@language"))
        throw new IllegalArgumentException(
          s"term '$term': @reverse with @container ${container.get} " +
            "is invalid JSON-LD")
      if (container.contains("@language") && o.has("@type"))
        throw new IllegalArgumentException(
          s"term '$term': @container @language cannot combine with " +
            "@type coercion (language-tagged strings carry no datatype)")
      val iri = rev.orElse(Option(o.get("@id")))
        .map(n => expandDefIri(n.asText, lookup))
        .getOrElse(ctx0.vocab.map(_ + term).getOrElse(
          throw new IllegalArgumentException(
            s"term definition for '$term' has no @id and no @vocab")))
      val coerce = Option(o.get("@type")).map { t =>
        if (t.asText == "@id") "@id"
        // datatype IRI (term/compact/absolute)
        else expandWith(t.asText, lookup, ctx0.vocab)
      }
      val lang = Option(o.get("@language"))
        .map(l => if (l.isNull) None else Some(l.asText))
      TermDef(iri, coerce, lang, container, rev.isDefined)
    }

    /** IRI inside a term DEFINITION: may itself be a term, compact
      * IRI, or absolute IRI — but never vocab-relative. */
    private def expandDefIri(s: String,
      lookup: String => Option[TermDef]): String = {
      val colon = s.indexOf(':')
      lookup(s).map(_.iri).getOrElse {
        val pref = if (colon > 0) lookup(s.take(colon)) else None
        pref.map(_.iri + s.drop(colon + 1)).getOrElse(s)
      }
    }

    /** Expand a predicate/type position term → "<iri>". */
    private def expand(term: String, ctx: Ctx): String =
      expandWith(term, ctx.terms.get, ctx.vocab)

    private def expandWith(term: String,
      lookup: String => Option[TermDef], vocab: Option[String]): String =
      lookup(term) match {
        case Some(d) => s"<${d.iri}>"
        case None =>
          val colon = term.indexOf(':')
          val pref = if (colon > 0) lookup(term.take(colon)) else None
          pref match {
            case Some(p) => s"<${p.iri}${term.drop(colon + 1)}>"
            case None =>
              if (term.contains("://") || term.startsWith("urn:"))
                s"<$term>"
              else vocab match {
                case Some(v) => s"<$v$term>"
                case None => throw new IllegalArgumentException(
                  s"term '$term' not in @context and not an absolute IRI")
              }
          }
      }

    /** Expand an @id-position reference: blank node, absolute IRI, or
      * (with @base) a relative IRI resolved against it. */
    private def subjectTerm(id: String, ctx: Ctx): String =
      if (id.startsWith("_:")) bnMap.getOrElseUpdate(id, freshBn())
      else if (id.contains("://") || id.startsWith("urn:")) s"<$id>"
      else {
        val colon = id.indexOf(':')
        if (colon > 0 && ctx.terms.contains(id.take(colon)))
          s"<${ctx.terms(id.take(colon)).iri}${id.drop(colon + 1)}>"
        else ctx.base match {
          // same RFC 3986 resolver as the Turtle and RDF/XML readers,
          // so the three formats resolve relative references
          // identically (java.net.URI.resolve diverges on empty and
          // authority-less references). resolveIri performs no syntax
          // validation (unlike the java.net.URI it replaced), so check
          // the result against the IRIREF character set — a raw space
          // from a malformed @base must not silently become a term the
          // writers emit and no parser can re-read.
          case Some(b) =>
            val r = TurtleParser.resolveIri(b, id)
            r.find(TurtleParser.badIriChar).foreach(c =>
              throw new IllegalArgumentException(
                s"@base resolution produced an invalid IRI <$r> " +
                  s"(bad character '$c')"))
            s"<$r>"
          case None => s"<$id>" // pre-@base behavior: trust as-is
        }
      }

    def nodeObject(o: ObjectNode, parentCtx: Ctx): String = {
      val ctx = context(o, parentCtx)
      val subj = Option(o.get("@id")).map(n => subjectTerm(n.asText, ctx))
        .getOrElse(freshBn())
      o.properties().asScala.foreach { e =>
        (e.getKey, e.getValue) match {
          case ("@context" | "@id", _) => ()
          case ("@type", v) =>
            values(v).foreach(t => out += Triple(subj,
              TurtleParser.RdfType, expand(t.asText, ctx)))
          case ("@reverse", ro: ObjectNode) =>
            // {"@reverse": {p: nodes}} — nodes POINT AT this subject
            ro.properties().asScala.foreach { re =>
              val rd = ctx.terms.get(re.getKey)
              val pred = rd.map(t => s"<${t.iri}>")
                .getOrElse(expand(re.getKey, ctx))
              values(re.getValue).foreach { n =>
                // reverse-of-reverse term flips back to forward
                if (rd.exists(_.reverse))
                  out += Triple(subj, pred, objectTerm(n, ctx, rd))
                else out += Triple(reverseNode(n, ctx), pred, subj)
              }
            }
          case ("@reverse", other) => throw new IllegalArgumentException(
            s"@reverse must be a map of properties, got $other")
          case (k, _) if k.startsWith("@") =>
            throw new IllegalArgumentException(s"unsupported keyword $k")
          case (k, v) =>
            val d = ctx.terms.get(k)
            val pred = d.map(t => s"<${t.iri}>").getOrElse(expand(k, ctx))
            if (d.exists(_.reverse))
              values(v).foreach(n =>
                out += Triple(reverseNode(n, ctx), pred, subj))
            else if (d.exists(_.container.contains("@list")) &&
              !(v.isObject && v.asInstanceOf[ObjectNode].has("@list")))
              // a @list-container term's value IS one list (an explicit
              // {"@list": …} value falls through to objectTerm as-is)
              out += Triple(subj, pred,
                listChain(values(v).map(objectTerm(_, ctx, d))))
            else if (d.exists(_.container.contains("@language")) &&
              v.isObject)
              // language map: key = language tag ("@none" = no tag),
              // values = plain strings → language-tagged literals
              v.asInstanceOf[ObjectNode].properties().asScala
                .foreach { le =>
                  values(le.getValue).foreach { n =>
                    if (!n.isTextual) throw new IllegalArgumentException(
                      s"language-map value for '$k'/${le.getKey} " +
                        s"must be a string: $n")
                    val lit = "\"" + TurtleParser.escape(n.asText) + "\""
                    out += Triple(subj, pred,
                      if (le.getKey == "@none") lit
                      else lit + "@" + langTag(le.getKey))
                  }
                }
            else if (d.exists(_.container.contains("@index")) &&
              v.isObject && !v.asInstanceOf[ObjectNode].has("@value") &&
              !v.asInstanceOf[ObjectNode].has("@id") &&
              !v.asInstanceOf[ObjectNode].has("@list"))
              // index map: keys carry NO RDF meaning (JSON-LD drops
              // @index on expansion); values process normally
              v.asInstanceOf[ObjectNode].properties().asScala
                .foreach { ie =>
                  values(ie.getValue).foreach(n =>
                    out += Triple(subj, pred, objectTerm(n, ctx, d)))
                }
            else values(v).foreach(n => out += Triple(subj, pred,
              objectTerm(n, ctx, d)))
        }
      }
      subj
    }

    /** A value in @reverse position names the SUBJECT of the emitted
      * triple — node objects and IRI references only; a literal has
      * no subject position to occupy. */
    private def reverseNode(n: JsonNode, ctx: Ctx): String = n match {
      case o: ObjectNode if o.has("@value") || o.has("@list") =>
        throw new IllegalArgumentException(
          s"@reverse value must be a node object or IRI reference: $o")
      case o: ObjectNode => nodeObject(o, ctx)
      case v if v.isTextual => subjectTerm(v.asText, ctx)
      case other => throw new IllegalArgumentException(
        s"@reverse value must be a node object or IRI reference: $other")
    }

    private def values(n: JsonNode): Seq[JsonNode] = n match {
      case a: ArrayNode => a.elements().asScala.toSeq
      case other => Seq(other)
    }

    private val RdfFirst =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
    private val RdfRest =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
    private val RdfNil =
      "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"

    /** rdf:first/rest chain for a list's (already-converted) items —
      * the same collection shape the Turtle and XML readers build.
      * Returns the head cell (or rdf:nil for the empty list). */
    private def listChain(items: Seq[String]): String =
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

    private def objectTerm(n: JsonNode, ctx: Ctx,
      term: Option[TermDef] = None): String = n match {
      case o: ObjectNode if o.has("@list") =>
        // rdflib's JSON-LD spelling of an RDF collection; the term's
        // type/language coercion applies to each ITEM (JSON-LD spec)
        listChain(values(o.get("@list")).map(v => objectTerm(v, ctx, term)))
      case o: ObjectNode if o.has("@value") =>
        val v = o.get("@value")
        Option(o.get("@type")) match {
          case Some(t) =>
            // canonTyped folds xsd:integer/decimal/boolean back to the
            // bare-token spelling — the same canonical term every
            // reader emits for that RDF literal
            TurtleParser.canonTyped(v.asText, expand(t.asText, ctx))
          case None =>
            val lang = Option(o.get("@language"))
            if (lang.isDefined && !v.isTextual)
              // JSON-LD only allows @language on string @values;
              // concatenating it onto a bare numeric token would
              // silently produce a malformed term (e.g. 1.5E0@en)
              throw new IllegalArgumentException(
                s"@language on non-string @value: ${v.toString}")
            val lit =
              if (v.isTextual)
                "\"" + TurtleParser.escape(v.asText) + "\""
              else nativeToken(v) // bare numeric/boolean, canonical
            lang.map(l => lit + "@" + langTag(l.asText)).getOrElse(lit)
        }
      case o: ObjectNode if o.has("@id") && o.size() == 1 =>
        // a PURE reference; {@id, …props} carries triples and must go
        // through nodeObject (which also returns the subject term)
        subjectTerm(o.get("@id").asText, ctx)
      case o: ObjectNode => nodeObject(o, ctx) // nested node → bnode
      case v if v.isTextual =>
        term.flatMap(_.coerce) match {
          case Some("@id") => subjectTerm(v.asText, ctx) // coerced IRI
          case Some(dtype) => TurtleParser.canonTyped(v.asText, dtype)
          case None =>
            val lit = "\"" + TurtleParser.escape(v.asText) + "\""
            // per-term @language beats the context default; an explicit
            // per-term null clears it
            term.flatMap(_.lang).orElse(ctx.lang.map(Some(_)))
              .flatten.map(l => lit + "@" + langTag(l)).getOrElse(lit)
        }
      case v => nativeToken(v)
    }

    /** JSON-LD data round-tripping: integral JSON numbers are
      * xsd:integer, booleans xsd:boolean (both already canonical as
      * `asText`), but non-integral numbers are xsd:DOUBLE in the
      * CANONICAL XSD lexical form (`1.5E0`, one mantissa digit) — the
      * engine's bare-double spelling of that same literal. Emitting
      * `1.5` here would silently change the datatype to xsd:decimal.
      * Routed through canonTyped so NON-BARE double lexicals (INF /
      * -INF / NaN, e.g. Jackson overflowing 1e999) come out as the
      * quoted-typed spelling instead of a corrupt bare term. */
    private def nativeToken(v: JsonNode): String =
      if (v.isNumber && !v.isIntegralNumber)
        TurtleParser.canonTyped(canonicalXsdDouble(v.asDouble),
          "<http://www.w3.org/2001/XMLSchema#double>")
      else v.asText
  }

  /** Canonical XSD double lexical: `[-]d.dddE[-]e`, exactly one
    * nonzero leading mantissa digit, no trailing zeros (xsd:double
    * canonical representation, XML Schema Part 2 §3.2.5.2). */
  private[ttl] def canonicalXsdDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "INF"
    else if (d.isNegInfinity) "-INF"
    else if (d == 0.0) { if (1 / d < 0) "-0.0E0" else "0.0E0" }
    else {
      val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
      val unscaled = bd.unscaledValue.abs.toString
      val sign = if (bd.signum < 0) "-" else ""
      val digits = unscaled.reverse.dropWhile(_ == '0').reverse match {
        case "" => "0"
        case x => x
      }
      val exp = unscaled.length - bd.scale - 1
      val mant =
        if (digits.length == 1) digits + ".0"
        else digits.head + "." + digits.tail
      s"$sign${mant}E$exp"
    }

  /** Deterministic expanded-form writer (sorted subjects/predicates). */
  def write(triples: Seq[Triple]): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    def idOf(term: String): String =
      if (term.startsWith("_:")) term else term.stripPrefix("<").stripSuffix(">")
    for ((s, ts) <- triples.groupBy(_.s).toSeq.sortBy(_._1)) {
      val node = mapper.createObjectNode()
      node.put("@id", idOf(s))
      for ((p, pts) <- ts.groupBy(_.p).toSeq.sortBy(_._1)) {
        val vals = mapper.createArrayNode()
        for (t <- pts.sortBy(_.o)) {
          t.o match {
            case o if o.startsWith("<") || o.startsWith("_:") =>
              vals.add(mapper.createObjectNode().put("@id", idOf(o)))
            case o if o.startsWith("\"") =>
              val vEnd = o.lastIndexOf('"')
              val v = TurtleParser.unescape(o.substring(1, vEnd))
              val obj = mapper.createObjectNode().put("@value", v)
              val suffix = o.substring(vEnd + 1)
              if (suffix.startsWith("^^"))
                obj.put("@type",
                  suffix.drop(2).stripPrefix("<").stripSuffix(">"))
              else if (suffix.startsWith("@"))
                obj.put("@language", suffix.drop(1))
              vals.add(obj)
            case o => // bare numeric/boolean token. Numbers keep their
              // LEXICAL form: a JSON native number collapses it
              // (007→7, 12.50→12.5, beyond-Long throws), changing the
              // RDF term on round-trip — so only a Long-canonical
              // integer rides as a native number; everything else is
              // the expanded string-@value + @type form, which
              // canonTyped folds back to the same bare token on read
              val obj = mapper.createObjectNode()
              if (o == "true" || o == "false")
                obj.put("@value", o.toBoolean)
              else {
                val dt = TurtleParser.bareTokenDatatype(o)
                  .stripPrefix("<").stripSuffix(">")
                if (o.matches("[+-]?[0-9]+") &&
                  scala.util.Try(o.toLong).toOption.exists(_.toString == o))
                  obj.put("@value", o.toLong)
                else obj.put("@value", o)
                obj.put("@type", dt)
              }
              vals.add(obj)
          }
        }
        if (p == TurtleParser.RdfType) {
          val types = mapper.createArrayNode()
          pts.sortBy(_.o).foreach(t => types.add(idOf(t.o)))
          node.set[JsonNode]("@type", types)
        } else node.set[JsonNode](idOf(p), vals)
      }
      arr.add(node)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }
}

/** `load_graph` / `serialize_graph` analog (rdf_utils.py:259-299):
  * one entry point, format-dispatched. N3 documents that stay within
  * Turtle's grammar (the overwhelmingly common case, and everything
  * rdflib's turtle serializer emits) load via the Turtle parser. */
object Rdf {
  /** Blank-node labels are scoped to one DOCUMENT: when loading many
    * files into one Dataset, `_:b0` from file A and `_:b0` from file B
    * are different nodes — prefix each with a tag derived from its
    * file name so the union never conflates them. */
  private def relabel(t: Triple, tag: String): Triple = {
    def fix(term: String): String =
      if (term.startsWith("_:")) "_:" + tag + "_" + term.drop(2) else term
    Triple(fix(t.s), t.p, fix(t.o))
  }

  /** 128-bit per-file tag. A 32-bit tag is past its ~2^16 birthday
    * bound at the reference's ~4M file-per-image corpus — thousands of
    * expected colliding file pairs, each silently conflating `_:b0` of
    * two distinct documents in the unioned Dataset. 128 bits puts the
    * collision probability at ~(4e6)^2 / 2^129 ≈ 1e-26: negligible at
    * any plausible scale. */
  private[ttl] def fileTag(f: String): String = {
    // canonicalize before hashing: input_file_name() spells a local
    // file "file:///tmp/x" while Hadoop's Path.toString spells it
    // "file:/tmp/x" — hashing the raw string would give the SAME
    // document different bnode tags depending on which API loaded it.
    // ENCODING too: input_file_name is percent-encoded ("a%20b.nt")
    // while FileStatus.getPath.toString is decoded ("a b.nt"). A
    // strict java.net.URI parse succeeds exactly on the encoded
    // spelling and DECODES it; the decoded spelling (spaces make the
    // strict parse throw) falls back to the Hadoop Path route
    // unchanged — both APIs then hash identical decoded components.
    // (A literal "%XX" inside an already-decoded name is the one
    // ambiguous corner; it decodes here, trading that rare name for
    // correct tags on every encoded one.)
    val uri =
      try new java.net.URI(f)
      catch {
        case _: java.net.URISyntaxException =>
          new org.apache.hadoop.fs.Path(f).toUri
      }
    val canon = s"${Option(uri.getScheme).getOrElse("")}://" +
      s"${Option(uri.getAuthority).getOrElse("")}${uri.getPath}"
    graft.Hex.digest("SHA-256",
      canon.getBytes(java.nio.charset.StandardCharsets.UTF_8)).take(32)
  }

  private def readWholetext(spark: SparkSession, path: String)(
    parseOne: String => Seq[Triple]): Dataset[Triple] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.option("wholetext", true).text(path)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
      .flatMap { case (f, content) =>
        val tag = fileTag(f)
        parseOne(content).map(relabel(_, tag))
      }
  }

  /** Scan for syntax that is N3-proper but NOT Turtle — formulas
    * (`{ … }` as a term), universal variables (`?x`), `@forAll` /
    * `@forSome` quantifiers, `=>` implication — skipping comments,
    * IRIs and string literals. Returns the first offending construct.
    * The engine reads the Turtle SUBSET of N3 (all the reference
    * itself emits/reads, rdf_utils.py's rdflib "n3" usage); these
    * constructs have no RDF-triple projection here, and deserve a
    * named error instead of a generic parse failure. */
  private def n3OnlySyntax(content: String): Option[String] = {
    var i = 0
    val n = content.length
    def at(s: String) = content.regionMatches(i, s, 0, s.length)
    while (i < n) {
      content.charAt(i) match {
        case '#' =>
          while (i < n && content.charAt(i) != '\n') i += 1
        case '<' =>
          i += 1
          while (i < n && content.charAt(i) != '>') i += 1
        case q @ ('"' | '\'') =>
          val fence = s"$q$q$q"
          if (at(fence)) {
            i += 3
            while (i < n && !at(fence)) {
              if (content.charAt(i) == '\\') i += 1
              i += 1
            }
            i += 3
          } else {
            i += 1
            while (i < n && content.charAt(i) != q) {
              if (content.charAt(i) == '\\') i += 1
              i += 1
            }
            i += 1
          }
        // PN_LOCAL_ESC: outside strings a backslash only legally
        // escapes a reserved char in a prefixed-name local part
        // (e.g. `ex:foo\?bar`) — skip the pair so the escaped char
        // is never mistaken for N3 syntax
        case '\\' => i += 2
        case '{' => return Some("formula syntax '{ … }'")
        case '?' => return Some("universal variable '?…'")
        case '@' if at("@forAll") => return Some("'@forAll'")
        case '@' if at("@forSome") => return Some("'@forSome'")
        case '=' if i + 1 < n && content.charAt(i + 1) == '>' =>
          return Some("'=>' (log:implies)")
        case _ => i += 1
      }
    }
    None
  }

  private def parseN3(content: String): Seq[Triple] = {
    n3OnlySyntax(content).foreach(what =>
      throw new IllegalArgumentException(
        s"N3 $what is unsupported: this engine reads the Turtle " +
          "subset of N3 only (formulas, variables and quantifiers " +
          "have no RDF-triple projection)"))
    TurtleParser.parse(content)
  }

  /** One document's content → triples, bnodes relabeled with the
    * per-file tag (the same document-scoping rule `load` applies).
    * Shared with the DataSource V2 connector (RdfDataSource). */
  private[graft] def parseDocument(fileName: String, content: String,
    format: String): Seq[Triple] = {
    val parse: String => Seq[Triple] = format.toLowerCase match {
      case "turtle" | "ttl" => TurtleParser.parse _
      case "n3" => parseN3 _
      case "nt" | "ntriples" | "n-triples" =>
        c => c.linesIterator.flatMap(Turtle.parseLine).toSeq
      case "xml" | "rdf-xml" | "rdfxml" | "rdf/xml" => RdfXml.parse _
      case "json-ld" | "jsonld" => JsonLd.parse _
      case other => throw new IllegalArgumentException(
        s"unsupported RDF format '$other' " +
          "(turtle|ttl|n3|nt|xml|json-ld)")
    }
    val tag = fileTag(fileName)
    parse(content).map(relabel(_, tag))
  }

  def load(spark: SparkSession, path: String, format: String = "turtle")
    : Dataset[Triple] =
    format.toLowerCase match {
      case "turtle" | "ttl" =>
        readWholetext(spark, path)(TurtleParser.parse _)
      case "n3" =>
        readWholetext(spark, path)(parseN3 _)
      case "nt" | "ntriples" | "n-triples" =>
        // line-splittable (NOT wholetext — N-Triples is the 100 TB
        // format) but still per-file bnode-scoped like every other
        // format: `_:b0` of file A and of file B are different nodes,
        // and parseDocument("nt") relabels too, so the two load paths
        // emit identical terms. One tag computation per file RUN, not
        // per line (lines of one file arrive contiguously per split).
        {
          import spark.implicits._
          import org.apache.spark.sql.functions.{col, input_file_name}
          spark.read.text(path)
            .select(input_file_name().as("f"), col("value"))
            .as[(String, String)]
            .mapPartitions { it =>
              var lastF: String = null
              var tag: String = null
              it.flatMap { case (f, line) =>
                if (f != lastF) { lastF = f; tag = fileTag(f) }
                Turtle.parseLine(line).map(relabel(_, tag))
              }
            }
        }
      case "xml" | "rdf-xml" | "rdfxml" | "rdf/xml" =>
        readWholetext(spark, path)(RdfXml.parse _)
      case "json-ld" | "jsonld" =>
        readWholetext(spark, path)(JsonLd.parse _)
      case other => throw new IllegalArgumentException(
        s"unsupported RDF format '$other' " +
          "(turtle|ttl|n3|nt|xml|json-ld)")
    }

  /** Whole-graph serialization to a single string (driver-side, for
    * per-document graphs — the reference's usage shape; distributed
    * sinks go through Turtle.serialize / serializeNTriples).
    *
    * Terms go out through the spelling-repair layer (Turtle.ntTermOut
    * / turtleTermOut): a canonical IRI may carry DECODED codepoints
    * of UCHAR escapes it was read with (raw space, `|`, …) which must
    * re-escape on write or the emitted document is unreadable; bare
    * tokens are legal Turtle but must expand to quoted-typed literals
    * in N-Triples. */
  def serialize(triples: Seq[Triple], format: String = "turtle"): String =
    format.toLowerCase match {
      case "turtle" | "ttl" | "n3" =>
        triples.groupBy(_.s).toSeq.sortBy(_._1).map { case (s, ts) =>
          Turtle.turtleTermOut(s) + "\n    " +
            ts.map(t =>
              s"${Turtle.turtleTermOut(t.p)} ${Turtle.turtleTermOut(t.o)}")
              .sorted.mkString(" ;\n    ") + " .\n"
        }.mkString
      case "nt" | "ntriples" | "n-triples" =>
        triples.map(t => s"${Turtle.ntTermOut(t.s)} " +
          s"${Turtle.ntTermOut(t.p)} ${Turtle.ntTermOut(t.o)} .")
          .mkString("\n") + "\n"
      case "xml" | "rdf-xml" | "rdfxml" | "rdf/xml" => RdfXml.write(triples)
      case "json-ld" | "jsonld" => JsonLd.write(triples)
      case other => throw new IllegalArgumentException(
        s"unsupported RDF format '$other'")
    }
}
