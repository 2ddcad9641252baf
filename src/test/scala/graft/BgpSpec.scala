package graft

import graft.functions.GeomFunctions
import graft.ttl.Bgp
import graft.ttl.Bgp.Pattern
import graft.ttl.Turtle.Triple
import org.apache.spark.sql.functions._

class BgpSpec extends SparkTestBase {
  import spark.implicits._

  private val rdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
  private val hasGeom = "<http://ex.org/hasGeometry>"
  private val coords = "<http://ex.org/coords>"
  private val mark = "<http://ex.org/Mark>"
  private val label = "<http://ex.org/label>"

  // two marks with geometries (colon-string, the reference's F2
  // format), one typed node without geometry, one stray triple
  private def graph = Seq(
    Triple("<http://ex.org/m1>", rdfType, mark),
    Triple("<http://ex.org/m1>", hasGeom, "<http://ex.org/g1>"),
    Triple("<http://ex.org/g1>", coords, "\"0:0:4:0:4:4:0:4\""),
    Triple("<http://ex.org/m1>", label, "\"tumor\""),
    Triple("<http://ex.org/m2>", rdfType, mark),
    Triple("<http://ex.org/m2>", hasGeom, "<http://ex.org/g2>"),
    Triple("<http://ex.org/g2>", coords, "\"10:10:12:10:12:12:10:12\""),
    Triple("<http://ex.org/m2>", label, "\"stroma\""),
    Triple("<http://ex.org/m3>", rdfType, mark),
    Triple("<http://ex.org/other>", label, "\"noise\"")).toDS()

  test("single pattern binds variables; constants filter") {
    val marks = Bgp.query(graph, Seq(Pattern("?m", rdfType, mark)))
      .as[String].collect().toSet
    assert(marks == Set("<http://ex.org/m1>", "<http://ex.org/m2>",
      "<http://ex.org/m3>"))
  }

  test("multi-pattern join chains on shared variables") {
    val got = Bgp.query(graph, Seq(
      Pattern("?m", rdfType, mark),
      Pattern("?m", hasGeom, "?g"),
      Pattern("?g", coords, "?c"),
      Pattern("?m", label, "?l")))
      .orderBy("m").as[(String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("<http://ex.org/m1>", "<http://ex.org/g1>",
        "\"0:0:4:0:4:4:0:4\"", "\"tumor\""),
      ("<http://ex.org/m2>", "<http://ex.org/g2>",
        "\"10:10:12:10:12:12:10:12\"", "\"stroma\"")))
    // m3 (no geometry) and the stray label node joined away
  }

  test("geosparql: containment over BGP-bound geometry columns") {
    // the namesake query: which marks' polygons contain point (2, 2)?
    val bound = Bgp.query(graph, Seq(
      Pattern("?m", hasGeom, "?g"),
      Pattern("?g", coords, "?c")))
    val inside = bound
      .withColumn("geom", GeomFunctions.polygonFromColonString(
        regexp_replace(col("c"), "\"", "")))
      .filter(GeomFunctions.stContains(col("geom"), lit(2.0), lit(2.0)))
      .select("m").as[String].collect().toSeq
    assert(inside == Seq("<http://ex.org/m1>"))
  }

  test("repeated variable in one pattern forces self-equality") {
    val g = (graph.collect().toSeq :+
      Triple("<http://ex.org/self>", label, "<http://ex.org/self>"))
      .toDS()
    val selfRef = Bgp.query(g, Seq(Pattern("?x", label, "?x")))
      .as[String].collect().toSeq
    assert(selfRef == Seq("<http://ex.org/self>"))
  }

  test("disconnected patterns are refused, not planned as a cartesian") {
    val e = intercept[IllegalArgumentException] {
      Bgp.query(graph, Seq(
        Pattern("?a", rdfType, mark),
        Pattern("?b", label, "?l")))
    }
    assert(e.getMessage.contains("disconnected"), e.getMessage)
  }

  test("OPTIONAL extends with nulls; MINUS drops matching solutions") {
    val marks = Bgp.query(graph, Seq(Pattern("?m", rdfType, mark)))
    // OPTIONAL geometry: m1/m2 bind ?g, m3 null-fills
    val withGeom = Bgp.optional(marks, graph,
      Seq(Pattern("?m", hasGeom, "?g")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(withGeom == Set(
      ("<http://ex.org/m1>", Some("<http://ex.org/g1>")),
      ("<http://ex.org/m2>", Some("<http://ex.org/g2>")),
      ("<http://ex.org/m3>", None)), withGeom)
    // MINUS the marks that have a geometry: only m3 survives
    val bare = Bgp.minus(marks, graph, Seq(Pattern("?m", hasGeom, "?g")))
      .as[String].collect().toSeq
    assert(bare == Seq("<http://ex.org/m3>"), bare)
    // a group sharing no variable cannot constrain — refused
    val e = intercept[IllegalArgumentException] {
      Bgp.minus(marks, graph, Seq(Pattern("?x", label, "?l")))
    }
    assert(e.getMessage.contains("shares no variable"), e.getMessage)
  }

  test("constant-only pattern acts as an existence gate") {
    val some = Bgp.query(graph, Seq(
      Pattern("?m", rdfType, mark),
      Pattern("<http://ex.org/m1>", label, "\"tumor\"")))
    assert(some.count() == 3) // gate matched: bindings flow through
    val none = Bgp.query(graph, Seq(
      Pattern("?m", rdfType, mark),
      Pattern("<http://ex.org/m1>", label, "\"absent\"")))
    assert(none.count() == 0)
  }

  private val in = "<http://ex.org/in>"
  // a -> b -> c -> d chain plus a 2-cycle x <-> y, all via `in`
  private def pathGraph = Seq(
    Triple("a", in, "b"), Triple("b", in, "c"), Triple("c", in, "d"),
    Triple("x", in, "y"), Triple("y", in, "x"),
    Triple("a", label, "\"noise\"")).toDS()

  private def released[T](f: => T): T =
    try f finally graft.operators.Broadcasting.releaseAll()

  test("property path: var-to-var closure with min hops") {
    val got = released(Bgp.path(pathGraph,
      Bgp.PathPattern("?s", in, "?t", minHops = 1, maxHops = 2))
      .as[(String, String, Int)].collect().toSet)
    assert(got == Set(("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
      ("a", "c", 2), ("b", "d", 2),
      ("x", "y", 1), ("y", "x", 1), ("x", "x", 2), ("y", "y", 2)),
      got)
  }

  test("property path: constant subject seeds, constant object filters") {
    val fromA = released(Bgp.path(pathGraph,
      Bgp.PathPattern("a", in, "?t", minHops = 1, maxHops = 3))
      .as[(String, Int)].collect().toSet)
    assert(fromA == Set(("b", 1), ("c", 2), ("d", 3)), fromA)
    val toD = released(Bgp.path(pathGraph,
      Bgp.PathPattern("?s", in, "d", minHops = 1, maxHops = 3))
      .as[(String, Int)].collect().toSet)
    assert(toD == Set(("c", 1), ("b", 2), ("a", 3)), toD)
  }

  test("property path: minHops 0 includes self; ?x p ?x finds cycles") {
    val zero = released(Bgp.path(pathGraph,
      Bgp.PathPattern("a", in, "?t", minHops = 0, maxHops = 1))
      .as[(String, Int)].collect().toSet)
    assert(zero == Set(("a", 0), ("b", 1)), zero)
    val cyc = released(Bgp.path(pathGraph,
      Bgp.PathPattern("?s", in, "?s", minHops = 1, maxHops = 2))
      .as[(String, Int)].collect().toSet)
    assert(cyc == Set(("x", 2), ("y", 2)), cyc)
  }

  test("property path joins with BGP solutions on shared variables") {
    // marks-style composition: path reachability constrained by a
    // regular pattern on the path's start variable
    val sols = Bgp.query(pathGraph, Seq(Pattern("?s", label, "?l")))
    val joined = released(sols.join(
      Bgp.path(pathGraph,
        Bgp.PathPattern("?s", in, "?t", minHops = 2, maxHops = 2)),
      Seq("s"))
      .select("s", "t").as[(String, String)].collect().toSet)
    assert(joined == Set(("a", "c")), joined)
  }

  test("minHops >= 2 matches longer in-window walks, not just shortest") {
    // a→b directly AND a→c→b: p{2,2} must match (a, b) via the
    // 2-walk even though the SHORTEST a→b path is 1 (min-hop BFS
    // would drop it — the exact-length mode is what makes this pass)
    val diamond = Seq(
      Triple("a", in, "b"), Triple("a", in, "c"), Triple("c", in, "b")
    ).toDS()
    val got = released(Bgp.path(diamond,
      Bgp.PathPattern("?s", in, "?t", minHops = 2, maxHops = 2))
      .as[(String, String, Int)].collect().toSet)
    assert(got == Set(("a", "b", 2)), got)
  }

  test("zero-length paths include pure sinks") {
    // d and x/y's targets: every node of the edge set matches the
    // zero-length path, including ones with no OUTGOING edge
    val got = released(Bgp.path(pathGraph,
      Bgp.PathPattern("?s", in, "?t", minHops = 0, maxHops = 1))
      .as[(String, String, Int)].collect().toSet)
    assert(got(("d", "d", 0)), got)
    assert(got.count(_._3 == 0) == 6, got) // all six nodes at 0
    // constant object keeps its own zero-length solution
    val toD = released(Bgp.path(pathGraph,
      Bgp.PathPattern("?s", in, "d", minHops = 0, maxHops = 2))
      .as[(String, Int)].collect().toSet)
    assert(toD == Set(("d", 0), ("c", 1), ("b", 2)), toD)
  }

  test("property path refuses variable predicates and bad bounds") {
    intercept[IllegalArgumentException](
      Bgp.PathPattern("?s", "?p", "?t", 1, 2))
    intercept[IllegalArgumentException](
      Bgp.PathPattern("a", in, "b", 1, 2)) // no variable end
    intercept[IllegalArgumentException](
      Bgp.PathPattern("?s", in, "?t", 3, 2))
  }
}
