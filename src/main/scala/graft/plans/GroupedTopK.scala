package graft.plans

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.util.collection.GraftSorterShim

/** Grouped top-k as a CUSTOM physical operator. Spark 4's own
  * `InsertWindowGroupLimit` already prunes the idiomatic spelling
  * (`row_number() over (partition by g order by v) <= k`) to k rows
  * per (group, partition) — but it still SORTS each partition in
  * full to do so. This operator keeps a bounded k-heap per group
  * instead — O(n log k) work, no sort — in two phases mirroring
  * partial/final aggregation:
  *
  *   scan → [GroupedTopKExec partial]   per-partition heaps, ≤ k
  *          rows per (group, partition) survive
  *        → Exchange(group)             shuffle carries the
  *                                      SURVIVORS only
  *        → [GroupedTopKExec final]     per-group merge, exact top-k
  *
  * Work is O(n log k) with no full sort anywhere; the shuffle volume
  * is partitions × groups × k rows instead of n — the same reduction
  * WindowGroupLimit achieves, minus its per-partition sort. The
  * trade is GROUP CARDINALITY: the interpreted hash-heap beats the
  * codegen'd sort up to ~10⁴ live groups per task (3× at dozens of
  * groups) and loses beyond (BASELINE.md r11 A/B) — which is why
  * the automatic rewrite ([[TopKRewrite]]) is opt-in while direct
  * callers, who know their cardinality, use this unconditionally.
  *
  * Memory is BOUNDED even at extreme group cardinality, via the
  * live-group cap `spark.graft.topk.maxLiveGroups` (default 262144
  * groups per task; at most (cap + 1) × k retained rows — the row
  * that creates group cap+1 is admitted and ends the chunk):
  *  - the PARTIAL phase flushes its heaps to output and restarts
  *    when the cap trips — correct because a partition-wide top-k
  *    row is top-k in every chunk that contains it, so the union of
  *    per-chunk survivors still covers the exact answer (metric:
  *    `capFlushes`);
  *  - the FINAL phase (which must be exact, so it cannot flush)
  *    degrades to sort-based eviction: accumulated heap entries plus
  *    the rest of the task's input are handed to Spark's spill-capable
  *    ExternalSorter keyed by (group, order value), and the top-k per
  *    group is then evicted from the group-sorted stream with O(k)
  *    state (metric: `sortFallbacks`). Same discipline as hash
  *    aggregate falling back to sort aggregation.
  *
  * Order values are only retained as copies (or as views into rows
  * this operator itself copied): `eval` on a reused scan row returns
  * UTF8String/struct/array VIEWS into the row's backing buffer, which
  * the scan overwrites on the next row — so admission comparisons use
  * the transient value, but anything enqueued is re-evaluated against
  * the operator's own stable copy of the row.
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
  * id, or a struct with a unique trailing field) for reproducible
  * results, as the w9 oracle query does.
  */
case class GroupedTopKPlan(groupExprs: Seq[Attribute],
  orderExpr: Attribute, descending: Boolean, k: Int,
  child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // group keys are compared as raw UnsafeRow bytes: top-level float/
  // double keys get SQL-faithful normalization (normalizeFloatKey),
  // but a float nested inside a struct/array/map key would still be
  // byte-compared, splitting SQL-equal groups (-0.0 vs 0.0, NaN bit
  // patterns) into separate heaps. Fail loudly rather than group
  // wrongly; TopKRewrite declines such keys before reaching here.
  groupExprs.find(g => GroupedTopKExec.hasNestedFloat(g.dataType))
    .foreach(g => throw new IllegalArgumentException(
      s"GroupedTopK group key ${g.name}: floating-point values " +
        s"nested inside ${g.dataType.simpleString} are compared by " +
        "raw bytes, which diverges from SQL equality (-0.0/NaN); " +
        "use atomic group keys or pre-normalize the nested floats"))
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
  * group and emits the exact per-group top-k. See the class doc for
  * the live-group cap / bounded-memory contract. */
object GroupedTopKExec {
  /** SQL-faithful key equality for floating group columns: one NaN
    * bit pattern, -0.0 folded to 0.0 — what Spark's own (private)
    * NormalizeFloatingNumbers does for Aggregate/Window keys. NULL
    * passes through (both CASE branches are null-false). */
  private[plans] def normalizeFloatKey(e: org.apache.spark.sql
    .catalyst.expressions.Expression): org.apache.spark.sql.catalyst
    .expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen,
      EqualTo, IsNaN, Literal}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    e.dataType match {
      case DoubleType => CaseWhen(Seq(
        (IsNaN(e), Literal(Double.NaN)),
        (EqualTo(e, Literal(0.0d)), Literal(0.0d))), e)
      case FloatType => CaseWhen(Seq(
        (IsNaN(e), Literal(Float.NaN)),
        (EqualTo(e, Literal(0.0f)), Literal(0.0f))), e)
      case _ => e
    }
  }

  /** True iff `dt` transitively contains a float/double INSIDE a
    * non-atomic type (struct/array/map). Top-level FloatType/
    * DoubleType are fine — [[normalizeFloatKey]] handles those;
    * nested ones would be byte-compared unnormalized. */
  private[plans] def hasNestedFloat(dt: org.apache.spark.sql.types
    .DataType): Boolean = {
    import org.apache.spark.sql.types._
    def inside(t: DataType): Boolean = t match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => inside(f.dataType))
      case a: ArrayType => inside(a.elementType)
      case m: MapType => inside(m.keyType) || inside(m.valueType)
      case _ => false
    }
    dt match {
      case s: StructType => s.fields.exists(f => inside(f.dataType))
      case a: ArrayType => inside(a.elementType)
      case m: MapType => inside(m.keyType) || inside(m.valueType)
      case _ => false
    }
  }
}

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

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "gtkTasks" -> SQLMetrics.createMetric(sparkContext,
      GroupedTopK.TasksMetricName),
    "capFlushes" -> SQLMetrics.createMetric(sparkContext,
      GroupedTopK.CapFlushesMetricName),
    "sortFallbacks" -> SQLMetrics.createMetric(sparkContext,
      GroupedTopK.SortFallbacksMetricName))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupSeq = groupExprs
    val orderE: Expression = orderExpr
    val outSchema = child.output
    val desc = descending
    val kk = k
    val isPartial = partial
    val maxLiveGroups = SQLConf.get.getConfString(
      GroupedTopK.MaxLiveGroupsKey, "262144").toInt
    require(maxLiveGroups >= 1,
      s"${GroupedTopK.MaxLiveGroupsKey} must be >= 1, got $maxLiveGroups")
    val capFlushes = longMetric("capFlushes")
    val sortFallbacks = longMetric("sortFallbacks")
    val gtkTasks = longMetric("gtkTasks")
    val fn = (iter: Iterator[InternalRow]) => {
      // always-nonzero witness that this operator executed — lets the
      // bench distinguish "ran, never tripped a fallback" (headroom)
      // from "no GroupedTopKExec in the plan", where the fallback
      // counters are indistinguishable (both read 0)
      gtkTasks += 1
      // group keys are compared as raw UnsafeRow bytes, so floating
      // keys must be NORMALIZED first (-0.0 ≡ 0.0, one NaN pattern):
      // Spark gives its own Aggregate/Window/Join this treatment
      // (NormalizeFloatingNumbers — private[sql], hence the local
      // spelling) and a bare projection would split SQL-equal keys
      // into separate heaps. No-op on non-floating types; keys with
      // floats NESTED in struct/array/map are rejected at plan
      // construction (GroupedTopKPlan / hasNestedFloat).
      val groupProj = UnsafeProjection.create(
        groupSeq.map(GroupedTopKExec.normalizeFloatKey), outSchema)
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
      // head = worst retained. Plain HashMap (2.13 flat hash, no
      // linked entries): per-group output order is irrelevant —
      // anything order-sensitive above re-sorts survivors anyway.
      val heapOrd = Ordering.by[(Any, UnsafeRow), Any](_._1)(better.reverse)
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[(Any, UnsafeRow)]]
      val toUnsafe = UnsafeProjection.create(
        outSchema.map(_.dataType).toArray)
      // Copy first, THEN evaluate the stored order value against the
      // copy: the value may be a UTF8String/struct/array view into
      // the row's buffer, and only the copy's buffer is stable.
      // Rows off a scan/shuffle are already UnsafeRows of this very
      // schema — one buffer copy, no re-projection (the projection
      // writes a whole second buffer before copy() copies it AGAIN;
      // the profile had that double copy as the operator's #1 cost).
      def stableCopy(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u.copy()
        case other => toUnsafe(other).copy()
      }
      // += (addOne), never enqueue(): the varargs enqueue wraps each
      // element in a Seq and routes through addAll — measured ~20% of
      // task time at high group cardinality
      def enqueue(heap: mutable.PriorityQueue[(Any, UnsafeRow)],
        row: InternalRow): Unit = {
        val copied = stableCopy(row)
        heap += ((boundOrder.eval(copied), copied))
      }
      def admit(row: InternalRow): Unit = {
        val key = groupProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = mutable.PriorityQueue.empty[(Any, UnsafeRow)](heapOrd)
            heaps.put(key.copy(), h)
            h
          case h => h
        }
        if (heap.size < kk) {
          enqueue(heap, row)
        } else {
          // transient view — compared now, never retained
          val v = boundOrder.eval(row)
          if (better.compare(v, heap.head._1) > 0) {
            heap.dequeue()
            enqueue(heap, row)
          }
        }
      }
      def drain(): Iterator[InternalRow] = {
        val out = mutable.ArrayBuffer.empty[InternalRow]
        heaps.valuesIterator.foreach(h => h.iterator.foreach(out += _._2))
        heaps.clear()
        out.iterator
      }
      // Final-phase fallback: hand everything to a spill-capable
      // sort keyed by (group bytes, order value) with the BEST row
      // of each group first, then evict all but the first k per
      // group from the sorted stream.
      def sortEvict(remaining: Iterator[InternalRow])
        : Iterator[InternalRow] = {
        sortFallbacks += 1
        val keyOrd = new Ordering[(Array[Byte], Any)] {
          override def compare(a: (Array[Byte], Any),
            b: (Array[Byte], Any)): Int = {
            val ka = a._1; val kb = b._1
            val n = math.min(ka.length, kb.length)
            var i = 0
            while (i < n) {
              val c = (ka(i) & 0xff) - (kb(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            val lc = ka.length - kb.length
            if (lc != 0) lc
            else {
              // sign-flip, not arithmetic negation: interpreted
              // orderings may return any int (UTF8String compares
              // return byte differences) and -Int.MinValue overflows
              val c2 = better.compare(a._2, b._2)
              if (c2 > 0) -1 else if (c2 < 0) 1 else 0
            }
          }
        }
        val ctx = TaskContext.get()
        val sorter = GraftSorterShim
          .create[(Array[Byte], Any), UnsafeRow](ctx, keyOrd)
        if (ctx != null) {
          ctx.addTaskCompletionListener[Unit](_ => sorter.stop())
        }
        val fromHeaps = heaps.iterator.flatMap { case (gk, h) =>
          val bytes = gk.getBytes
          h.iterator.map { case (v, r) => ((bytes, v), r) }
        }
        val fromInput = remaining.map { row =>
          val copied = stableCopy(row)
          // .copy() before .getBytes: the projection's buffer is
          // reused, and getBytes may return it un-copied
          ((groupProj(copied).copy().getBytes,
            boundOrder.eval(copied)), copied)
        }
        sorter.insertAll(fromHeaps ++ fromInput)
        heaps.clear()
        var curKey: Array[Byte] = null
        var emitted = 0
        sorter.iterator.flatMap { p =>
          val gk = p._1._1
          if (curKey == null || !java.util.Arrays.equals(curKey, gk)) {
            curKey = gk
            emitted = 0
          }
          if (emitted < kk) { emitted += 1; Some(p._2: InternalRow) }
          else None
        }
      }
      if (isPartial) {
        // chunked: heaps until the cap trips, flush, restart — the
        // union of per-chunk survivors covers the exact answer
        new Iterator[InternalRow] {
          private var out: Iterator[InternalRow] = Iterator.empty
          private def refill(): Unit = {
            // <= is deliberate: rows of EXISTING groups keep
            // admitting while the cap holds, and only the row that
            // creates group cap+1 ends the chunk — so peak retention
            // is (cap+1) heaps (documented), in exchange for far
            // fewer flushes than a strict < (which would end a chunk
            // the moment cap groups are live, existing-group rows
            // included)
            while (iter.hasNext && heaps.size <= maxLiveGroups) {
              admit(iter.next())
            }
            if (heaps.size > maxLiveGroups) capFlushes += 1
            out = drain()
          }
          override def hasNext: Boolean = {
            while (!out.hasNext && iter.hasNext) refill()
            out.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty")
            out.next()
          }
        }
      } else {
        var degraded: Iterator[InternalRow] = null
        while (iter.hasNext && degraded == null) {
          admit(iter.next())
          if (heaps.size > maxLiveGroups) degraded = sortEvict(iter)
        }
        if (degraded != null) degraded else drain()
      }
    }
    child.execute().mapPartitions(fn, preservesPartitioning = true)
  }
}

object GroupedTopK {

  /** Per-task live-group cap (see class doc). Session conf. */
  val MaxLiveGroupsKey = "spark.graft.topk.maxLiveGroups"

  /** SQLMetric display names, shared with Bench's accumulable
    * listener: the bench tallies metrics by matching these strings
    * against task-end accumulable names, so a rename here must reach
    * both sites or the telemetry silently zeroes. Single source. */
  val TasksMetricName = "graft topk tasks"
  val CapFlushesMetricName = "partial heap flushes (live-group cap)"
  val SortFallbacksMetricName =
    "final tasks degraded to sort-based eviction"

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
    * happens; only the survivors sort. Same tie contract as topK.
    * NULL order values rank LAST in BOTH directions — the window
    * must spell the heap's null contract explicitly (`better()`
    * treats null as worst either way), because Spark's bare `asc`
    * defaults to NULLS FIRST and would rank a surviving null AHEAD
    * of the real values the heap kept it behind. */
  def rankedTopK(df: DataFrame, groupCols: Seq[String],
    orderCol: String, k: Int, descending: Boolean = true,
    rankCol: String = "rnk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    require(!df.columns.contains(rankCol),
      s"column $rankCol collides with the rank output")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(if (descending) col(orderCol).desc_nulls_last
        else col(orderCol).asc_nulls_last)
    topK(df, groupCols, orderCol, k, descending)
      .withColumn(rankCol, row_number().over(w).cast("long"))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    // the pruning/pushdown companion travels with the operator: a
    // plan holding a GroupedTopKPlan without it loses column pruning
    // and group-filter pushdown at the node boundary
    if (!spark.experimental.extraOptimizations
        .contains(GroupedTopKPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GroupedTopKPushdown
  }
}
