package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst stops column pruning and predicate pushdown at logical
  * nodes it doesn't know — so a [[GroupedTopKPlan]] under a narrow
  * Project would still scan every column, and a filter on the GROUP
  * key would run after the heaps did the work for groups the filter
  * throws away. This rule restores both, exploiting what the
  * optimizer can't know about the operator's semantics:
  *
  *  - **Pruning**: top-k keeps whole rows but only READS the group +
  *    order columns; everything else rides along. A Project above
  *    that drops columns pushes a pruning Project below (keeping
  *    group/order), so scans read only what survives.
  *  - **Group-key filters commute**: selecting groups before or
  *    after per-group top-k yields identical rows (each group's
  *    top-k depends only on its own rows). Conjuncts referencing
  *    ONLY group columns move below the operator; all other
  *    conjuncts (order or payload columns) must stay above — they
  *    do NOT commute (filtering rows first would promote different
  *    rows into the k).
  *
  * Always on (unlike [[TopKRewrite]]): both moves strictly shrink
  * the work below the operator, with no cardinality trade.
  */
object GroupedTopKPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // group-only filter conjuncts slide below the heaps
    case f @ Filter(cond, g: GroupedTopKPlan) =>
      val groupSet = AttributeSet(g.groupExprs)
      val (below, above) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(groupSet))
      if (below.isEmpty) f
      else {
        val pushed = g.copy(child =
          Filter(below.reduce(org.apache.spark.sql.catalyst.expressions
            .And), g.child))
        above.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }

    // a narrowing Project pushes a pruning Project below (group +
    // order columns must survive for the operator itself)
    case p @ Project(projectList, g: GroupedTopKPlan)
      if p.references.subsetOf(g.outputSet) =>
      val needed = (p.references ++
        AttributeSet(g.groupExprs :+ g.orderExpr)).toSeq
      if (needed.length >= g.child.output.length) p
      else {
        // preserve the child's column order for the kept subset so
        // the operator's ordinal bindings stay stable
        val keep = g.child.output.filter(a =>
          needed.exists(_.exprId == a.exprId))
        p.copy(child = g.copy(child = Project(keep, g.child)))
      }
  }
}
