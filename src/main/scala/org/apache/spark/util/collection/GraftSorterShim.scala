package org.apache.spark.util.collection

import org.apache.spark.TaskContext

/** Package-local bridge to Spark's spill-capable [[ExternalSorter]]
  * (`private[spark]`). graft's GroupedTopKExec uses it for the
  * final-phase fallback when live group cardinality in one task
  * exceeds the in-memory heap budget: rows are handed to the sorter
  * (which acquires execution memory and spills to disk under
  * pressure, exactly like SortExec) and the per-group top-k is then
  * evicted from the group-sorted stream with O(k) state.
  */
object GraftSorterShim {

  /** A key-sorted, non-aggregating, single-partition sorter. The
    * caller must arrange `sorter.stop()` (task-completion listener)
    * to release memory and delete spill files. */
  def create[K, V](context: TaskContext, ord: Ordering[K])
    : ExternalSorter[K, V, V] =
    new ExternalSorter[K, V, V](context, None, None, Some(ord))
}
