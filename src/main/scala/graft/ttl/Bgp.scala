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
}
