package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: assign documents to
  * fixed-token-budget bins (context windows) by RUNNING OFFSET — doc
  * d goes to bin `floor(offset(d) / budget)` where offset is the sum
  * of token counts of all earlier documents in its shard. This is the
  * standard offset-based approximation of greedy packing, chosen
  * because it is a pure window computation: one shuffle, no
  * sequential driver scan — true greedy packing is an inherently
  * serial fold. For documents no longer than the budget, a bin
  * overflows by at most one document's tail and no bin is skipped; a
  * document LONGER than the budget overflows its bin by more and
  * leaves the bins its excess spans empty (split such documents
  * before packing if that matters).
  *
  * Packing is per-`shardCol` (e.g. source): the running sum
  * parallelizes across shards, which is also the realistic training
  * layout (shards are packed independently). A GLOBAL ordered window
  * would funnel every row through one task — exactly the
  * single-reducer trap this operator exists to avoid at 100 TB.
  */
object Packing {

  /** Adds `bin` (0-based per shard) to (shardCol, orderCol, tokenCol)
    * rows. `budget` = tokens per bin. `orderCol` must be UNIQUE
    * within each shard (doc_id-like): the running sum over tied
    * order keys would be partitioning/retry-dependent — the
    * nondeterminism this module bans everywhere else. */
  def byRunningOffset(df: DataFrame, shardCol: String, orderCol: String,
    tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_off", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"_off div $budget"))
      .drop("_off")
  }
}
