package graft.ttl

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ttl.Turtle.Triple

/** Basic-graph-pattern matching over a [[Turtle.Triple]] dataset —
  * the SPARQL SELECT core, compiled to DataFrame equi-joins so
  * Catalyst plans it like any relational query. The reference loads,
  * merges and serializes GeoSPARQL graphs (`rdf_utils.py`) but always
  * hands QUERYING to an external store; this closes that loop — the
  * graph the ETL built is queryable in the same engine, and the
  * bound columns compose with `GeomFunctions` for the actual
  * GeoSPARQL part (see BgpSpec's polygon-containment query).
  *
  * A pattern term starting with `?` is a variable; anything else
  * must match exactly. Compilation:
  *  - each pattern → one filtered projection of the triple frame
  *    (constant terms become pushable equality filters; repeated
  *    variables within one pattern become a self-equality filter);
  *  - patterns chain by NATURAL equi-join on shared variables —
  *    Catalyst orders/broadcasts them like any join tree;
  *  - the result carries one column per distinct variable (no `?`).
  *
  * Scale shape: the triple frame is just a 3-column table — bucket
  * or partition it by predicate (the classic triple-store layout)
  * and every constant-predicate pattern becomes a pruned scan; the
  * joins are keyed shuffles on the shared variables. Cartesian
  * products (patterns sharing no variable) are refused rather than
  * planned — at 100 TB a disconnected BGP is a mistake, not a query.
  */
object Bgp {

  case class Pattern(s: String, p: String, o: String)

  private def isVar(t: String) = t.startsWith("?")

  /** One pattern → (projection with one column per variable). */
  private def compileOne(triples: DataFrame, pat: Pattern): DataFrame = {
    val terms = Seq("s" -> pat.s, "p" -> pat.p, "o" -> pat.o)
    val filtered = terms.foldLeft(triples) { case (df, (c, t)) =>
      if (isVar(t)) df else df.filter(col(c) === t)
    }
    // repeated variables inside the pattern: all positions must bind
    // to the same value
    val varPos = terms.filter { case (_, t) => isVar(t) }
    val dup = varPos.groupBy(_._2).filter(_._2.size > 1).values
    val selfEq = dup.foldLeft(filtered) { (df, ps) =>
      ps.map(_._1).sliding(2).foldLeft(df) {
        case (d, Seq(a, b)) => d.filter(col(a) === col(b))
        case (d, _) => d
      }
    }
    val cols: Seq[Column] = varPos.map(_._2).distinct.map { v =>
      val pos = varPos.find(_._2 == v).get._1
      col(pos).as(v.drop(1))
    }
    if (cols.isEmpty) selfEq.select(lit(1).as("_matched")).limit(1)
    else selfEq.select(cols: _*)
  }

  /** Solutions of the conjunctive pattern list: one row per binding
    * of the distinct variables (bag semantics, like SPARQL SELECT
    * without DISTINCT). Patterns must be connected through shared
    * variables. */
  def query(triples: Dataset[Triple], patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "BGP needs at least one pattern")
    val df = triples.toDF()
    patterns.map(compileOne(df, _)).reduce { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq
      require(shared.nonEmpty || acc.columns.contains("_matched") ||
        next.columns.contains("_matched"),
        "disconnected BGP (no shared variable between pattern groups) " +
          "- a cartesian product at scale; join the groups through a " +
          "shared variable or run them as separate queries")
      if (shared.nonEmpty) acc.join(next, shared)
      else acc.crossJoin(next) // only the 1-row "_matched" probe
    }.drop("_matched")
  }

  private def sharedVars(solutions: DataFrame, triples: Dataset[Triple],
    patterns: Seq[Pattern], what: String): (DataFrame, Seq[String]) = {
    val side = query(triples, patterns)
    val shared = solutions.columns.toSet
      .intersect(side.columns.toSet).toSeq
    require(shared.nonEmpty,
      s"$what group shares no variable with the solutions - " +
        "it cannot constrain them")
    (side, shared)
  }

  /** SPARQL OPTIONAL: extend each solution with the group's bindings
    * when it matches, null-fill its exclusive variables when it
    * doesn't — a LEFT OUTER join on the shared variables. */
  def optional(solutions: DataFrame, triples: Dataset[Triple],
    patterns: Seq[Pattern]): DataFrame = {
    val (side, shared) = sharedVars(solutions, triples, patterns,
      "OPTIONAL")
    solutions.join(side, shared, "left_outer")
  }

  /** SPARQL MINUS: drop every solution for which the group matches
    * on the shared variables — a LEFT ANTI join (SPARQL's MINUS on
    * domain-overlapping groups; the no-shared-variable case, where
    * SPARQL MINUS removes nothing, is refused as a probable
    * query-authoring bug rather than silently kept). */
  def minus(solutions: DataFrame, triples: Dataset[Triple],
    patterns: Seq[Pattern]): DataFrame = {
    val (side, shared) = sharedVars(solutions, triples, patterns,
      "MINUS")
    solutions.join(side.select(shared.map(col): _*).distinct(),
      shared, "left_anti")
  }

  /** SPARQL property path `p{minHops,maxHops}` with a CONSTANT
    * predicate: subject and object as in [[Pattern]] (variable or
    * constant), at least one a variable. `minHops = 0` includes the
    * zero-length path (every path-start node reaches itself). */
  case class PathPattern(s: String, p: String, o: String,
    minHops: Int, maxHops: Int) {
    require(!Bgp.isVar(p),
      "property paths need a constant predicate - a variable-length " +
        "path over a variable predicate is the full graph closure")
    require(Bgp.isVar(s) || Bgp.isVar(o),
      "at least one path end must be a variable")
    require(0 <= minHops && minHops <= maxHops,
      s"need 0 <= minHops <= maxHops: $minHops/$maxHops")
  }

  /** Solutions of a property path: one row per (s, o) binding
    * connected by `minHops..maxHops` applications of the predicate,
    * plus the minimum hop count as `path_hops`. Compiled onto
    * [[graft.operators.Bfs.minHopsPerSource]] — the constant-
    * predicate filter prunes the triple scan to the predicate's edge
    * set (partition/bucket triples by `p` and it is a pruned read),
    * then the bounded closure runs frontier-at-a-time. A constant
    * subject seeds a single-source BFS; a constant object filters
    * the closure (documented asymmetry: seed-side selectivity is
    * free, object-side is post-hoc — put the constant on the
    * SUBJECT when both spellings are available, or invert the edges
    * yourself for `^p` paths). The result joins with [[query]]
    * solutions like any pattern group (shared variables). */
  def path(triples: Dataset[Triple], pat: PathPattern): DataFrame = {
    val edges = triples.toDF().filter(col("p") === pat.p)
      .select(col("s").as("src"), col("o").as("dst"))
    // zero-length paths (`p*`) match EVERY node of the predicate's
    // edge set, including pure sinks — seed them too (a sink seed
    // simply never expands); for positive-length paths only nodes
    // with an outgoing edge can start one
    val sources =
      if (!isVar(pat.s))
        triples.sparkSession.range(1).select(lit(pat.s).as("id"))
      else if (pat.minHops == 0)
        edges.select(col("src").as("id"))
          .unionAll(edges.select(col("dst").as("id"))).distinct()
      else edges.select(col("src").as("id")).distinct()
    // minHops 0 → `p*` reachability (origin reached at 0, cycles
    // collapse to it); minHops 1 → `p+` (only edge traversals
    // reach, so a cycle re-reaches its origin at the cycle length —
    // for windows starting at ≤1, membership equals
    // min-path-in-window, so the BFS is exact); minHops ≥ 2 →
    // exact-length frontiers (Bfs.lengthWindow), because a pair
    // whose shortest path undershoots the window can still match
    // via a longer in-window walk (`a→b` plus `a→c→b` matches
    // p{2,2}) and min-hop BFS would drop it.
    val reach =
      if (pat.minHops >= 2)
        graft.operators.Bfs.lengthWindow(edges, sources,
          pat.minHops, pat.maxHops)
      else if (isVar(pat.s))
        // variable subject: the source set IS the predicate's node
        // set, so the frontier walk degenerates to all-pairs anyway —
        // the routed closure picks frontier vs ⌈log₂ maxHops⌉-round
        // path doubling by depth (the ONE decision point:
        // Bfs.allPairsMinHops / Bfs.DoublingCrossover; same output
        // either way, Bfs doc + spec)
        graft.operators.Bfs
          .allPairsMinHops(edges, sources, pat.maxHops,
            seedReached = pat.minHops == 0)
          .filter(col("hops") >= pat.minHops)
      else graft.operators.Bfs
        .minHopsPerSource(edges, sources, pat.maxHops,
          exhaustCheck = false, seedReached = pat.minHops == 0)
        .filter(col("hops") >= pat.minHops)
    val constrained =
      if (isVar(pat.o)) reach else reach.filter(col("id") === pat.o)
    if (isVar(pat.s) && pat.s == pat.o)
      // ?x p{m,n} ?x — cycles back to the start
      constrained.filter(col("origin") === col("id"))
        .select(col("origin").as(pat.s.drop(1)),
          col("hops").as("path_hops"))
    else {
      val cols =
        (if (isVar(pat.s))
          Seq(col("origin").as(pat.s.drop(1))) else Nil) ++
        (if (isVar(pat.o))
          Seq(col("id").as(pat.o.drop(1))) else Nil) :+
        col("hops").as("path_hops")
      constrained.select(cols: _*)
    }
  }
}
