package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * transitive-closure step that turns near-dup PAIRS into dedup
  * GROUPS (d7's single-pass keep-lowest is deliberately not closure;
  * this is). Each node starts labeled with itself; every round each
  * node takes the min of its own and its neighbors' labels; fixpoint
  * = every node carries its component's minimum id.
  *
  * Scale shape: one shuffle per round (join edges⋈labels + min-agg),
  * rounds bounded by graph DIAMETER — near-dup graphs are unions of
  * small cliques/chains, so a handful of rounds closes them. Each
  * round's result is persisted and the previous round's cache dropped
  * (the IvfIndex lesson: never let an iterative lineage chain re-run
  * from round 0), and convergence is checked with a count on the
  * CHANGED set, not a collect.
  */
object ConnectedComponents {

  /** Edges (srcCol, dstCol) are undirected. Returns (id, comp): every
    * node of the edge set mapped to its component's min id. Throws if
    * `maxIter` rounds do not converge (diameter > maxIter). The
    * returned frame is PERSISTED (already materialized by the last
    * convergence check — one small row per node); unpersist it when
    * done, or release with the session. */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
    maxIter: Int = 25): DataFrame = {
    // persist the symmetric edge set: its lineage may be an entire
    // upstream pipeline (minhash → bands → pairs), and EVERY round
    // joins against it — without the cut, round i re-executes the
    // pipeline i times (the IvfIndex lineage lesson)
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist()
    try {
      var comp = sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .persist()
      comp.count() // materialize so each round starts from a cut lineage
      var round = 0
      var converged = false
      while (!converged) {
        if (round >= maxIter)
          throw new IllegalStateException(
            s"connected components did not converge in $maxIter rounds")
        val next = sym.join(comp, col("src") === col("id"))
          .select(col("dst").as("id"), col("comp"))
          .union(comp.select(col("id"), col("comp")))
          .groupBy(col("id")).agg(min("comp").as("comp"))
          .persist()
        val changed = next.join(comp.withColumnRenamed("comp", "prev"),
          Seq("id"))
          .filter(col("comp") < col("prev")).count()
        comp.unpersist()
        comp = next
        converged = changed == 0
        round += 1
      }
      comp
    } finally sym.unpersist()
  }

  /** Dedup grouping: component assignment for every doc in `pairs`
    * plus the component SIZE — the group a doc's text belongs to. */
  def dedupGroups(pairs: DataFrame, aCol: String, bCol: String)
    : DataFrame = {
    val comp = minLabel(pairs, aCol, bCol)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("group_size"))
    comp.join(sizes, Seq("comp"))
      .select(col("id"), col("comp"), col("group_size"))
  }
}
