package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a CUSTOM physical operator — the architecture
  * rung where Spark's built-ins genuinely can't express the plan:
  * the idiomatic spelling (`row_number() over (partition by g order
  * by v) <= k`) SORTS every group in full, shuffling and ordering
  * the whole corpus to keep k rows per group. This operator keeps a
  * bounded k-heap per group instead, in two phases mirroring
  * partial/final aggregation:
  *
  *   scan → [GroupedTopKExec partial]   per-partition heaps, ≤ k
  *          rows per (group, partition) survive
  *        → Exchange(group)             shuffle carries the
  *                                      SURVIVORS only
  *        → [GroupedTopKExec final]     per-group merge, exact top-k
  *
  * Work is O(n log k) with no full sort anywhere; the shuffle volume
  * is partitions × groups × k rows instead of n. Memory is k rows ×
  * live groups per task (no spill path — for extreme group
  * cardinality per partition fall back to the window spelling).
  *
  * Pieces: [[GroupedTopKPlan]] (logical node), [[GroupedTopKStrategy]]
  * (planner: logical → partial/final pair; Spark inserts the
  * exchange to satisfy the final's ClusteredDistribution), and
  * [[GroupedTopK.topK]] (public API: resolves columns on the
  * analyzed child and hands the plan back as a DataFrame via
  * GraftShims.ofRows). Registered through
  * `GraftFunctions.register` / the `spark.sql.extensions` hook.
  *
  * Determinism contract: ties at the k-boundary of `orderExpr` are
  * broken arbitrarily — pass a UNIQUE order value (e.g. value·C +
  * id) for reproducible results, as the w9 oracle query does.
  */
case class GroupedTopKPlan(groupExprs: Seq[Attribute],
  orderExpr: Attribute, descending: Boolean, k: Int,
  child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
    : GroupedTopKPlan = copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(g, o, desc, k, child) =>
      GroupedTopKExec(g, o, desc, k,
        GroupedTopKExec(g, o, desc, k, planLater(child),
          partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

/** One heap pass. `partial = true` runs on the child's partitioning
  * (map-side pruning); `partial = false` demands co-location by
  * group and emits the exact per-group top-k. */
case class GroupedTopKExec(groupExprs: Seq[Attribute],
  orderExpr: Attribute, descending: Boolean, k: Int,
  child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan)
    : GroupedTopKExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupSeq = groupExprs
    val orderE: Expression = orderExpr
    val outSchema = child.output
    val desc = descending
    val kk = k
    val fn = (iter: Iterator[InternalRow]) => {
      val groupProj = UnsafeProjection.create(groupSeq, outSchema)
      // an AttributeReference is Unevaluable until bound to the
      // child's output ordinals
      val boundOrder = org.apache.spark.sql.catalyst.expressions
        .BindReferences.bindReference(orderE, outSchema)
      val base = TypeUtils.getInterpretedOrdering(orderE.dataType)
      // "better" = kept; heap head is the WORST retained row so one
      // comparison decides admission. NULL order values sort worst
      // in both directions (they never displace a real value).
      val better: Ordering[Any] = new Ordering[Any] {
        override def compare(a: Any, b: Any): Int = (a, b) match {
          case (null, null) => 0
          case (null, _) => -1
          case (_, null) => 1
          case _ => if (desc) base.compare(a, b) else base.compare(b, a)
        }
      }
      // PriorityQueue dequeues its LARGEST; order by "worseness" so
      // head = worst retained
      val heapOrd = Ordering.by[(Any, UnsafeRow), Any](_._1)(better.reverse)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[(Any, UnsafeRow)]]
      val toUnsafe = UnsafeProjection.create(
        outSchema.map(_.dataType).toArray)
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = mutable.PriorityQueue.empty[(Any, UnsafeRow)](heapOrd)
            heaps.put(key.copy(), h)
            h
          case h => h
        }
        val v = boundOrder.eval(row)
        if (heap.size < kk) {
          heap.enqueue((v, toUnsafe(row).copy()))
        } else if (better.compare(v, heap.head._1) > 0) {
          heap.dequeue()
          heap.enqueue((v, toUnsafe(row).copy()))
        }
      }
      heaps.valuesIterator.flatMap(
        _.iterator.map(_._2): Iterator[InternalRow])
    }
    child.execute().mapPartitions(fn, preservesPartitioning = true)
  }
}

object GroupedTopK {

  /** Exact top-k rows per group by `orderCol` (descending by
    * default). Registers the planner strategy on the session if
    * missing; see the class doc for the tie contract. */
  def topK(df: DataFrame, groupCols: Seq[String], orderCol: String,
    k: Int, descending: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "topK needs at least one group column")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute =
      analyzed.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${analyzed.output.map(_.name).mkString(", ")}]"))
    GraftShims.ofRows(spark, GroupedTopKPlan(
      groupCols.map(attr), attr(orderCol), descending, k, analyzed))
  }

  /** [[topK]] plus a 1-based `rnk` column. The ranking window runs
    * AFTER the heap pruning, over at most groups × k surviving rows
    * — so the full-corpus sort the plain window spelling pays never
    * happens; only the survivors sort. Same tie contract as topK. */
  def rankedTopK(df: DataFrame, groupCols: Seq[String],
    orderCol: String, k: Int, descending: Boolean = true,
    rankCol: String = "rnk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    require(!df.columns.contains(rankCol),
      s"column $rankCol collides with the rank output")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(if (descending) col(orderCol).desc else col(orderCol).asc)
    topK(df, groupCols, orderCol, k, descending)
      .withColumn(rankCol, row_number().over(w).cast("long"))
  }

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
}
