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
    * nondeterminism this module bans everywhere else. Token counts
    * must be non-null and non-negative (a null would silently skip
    * the row in the running sum, shifting every later offset; a
    * negative one breaks bin monotonicity) — violations throw. */
  def byRunningOffset(df: DataFrame, shardCol: String, orderCol: String,
    tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val clash = df.columns.toSet.intersect(Set("_off", "bin"))
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with the " +
        "operator's output/internal columns (_off, bin) — rename " +
        "before packing")
    val tok = when(col(tokenCol).isNull || col(tokenCol) < 0,
      raise_error(concat(lit(s"Packing: token count '$tokenCol' must " +
        "be non-null and non-negative, got "),
        coalesce(col(tokenCol).cast("string"), lit("null")))))
      .otherwise(col(tokenCol))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // `bin` references the checked token too: the window frame ends at
    // the PREVIOUS row, so a shard's last token is never summed — the
    // gate on `bin` makes every row's own token get validated as well
    df.withColumn("_off", coalesce(sum(tok).over(w), lit(0L)))
      .withColumn("bin", when(tok >= 0, expr(s"_off div $budget")))
      .drop("_off")
  }
}
