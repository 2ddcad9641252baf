package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.OutputMode

/** Ingestion-time token-budget admission control — the STREAMING twin
  * of the batch `x25_budget_fill` face. Offline, the corpus is in
  * hand and the budget fills in QUALITY order; on a stream, documents
  * arrive once and the only honest policy is greedy arrival-order
  * admission: each source admits documents until its token budget is
  * spent, skipping any document that no longer fits (a later smaller
  * one may still fit — skip, not stop). Within one micro-batch,
  * arrival order is made deterministic by doc_id, so replays admit
  * the identical set.
  *
  * State: ONE running `used` counter per source (a long — bounded by
  * SOURCES, not documents), updated transactionally with the emitted
  * batch by the state store, so exactly-once holds across crash
  * restarts (spec: stop/restart on the same checkpoint neither
  * re-admits nor double-counts). No timers, no watermark: admission
  * is order-dependent bookkeeping, not event-time logic. */
object Admission {

  case class Doc(doc_id: Long, source: String, n_tokens: Long)
  case class Admitted(doc_id: Long, source: String, n_tokens: Long,
    cum_tokens: Long)

  /** Admitted documents with their running per-source total. Wire to
    * writeStream (Append) with a checkpoint. */
  def tokenBudget(docs: Dataset[Doc], budget: Long)
    : Dataset[Admitted] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budget),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  private class BudgetProcessor(budget: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Doc, Admitted] {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var used: ss.ValueState[Long] = _

    override def init(outputMode: OutputMode,
      timeMode: ss.TimeMode): Unit =
      used = getHandle.getValueState[Long]("used",
        Encoders.scalaLong, ss.TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[Doc],
      tv: ss.TimerValues): Iterator[Admitted] = {
      var u = if (used.exists()) used.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).flatMap { d =>
        // fit check as a subtraction: u <= budget always holds, so
        // budget - u is non-negative and the comparison cannot
        // overflow (u + n_tokens could, for n_tokens near Long.Max,
        // wrapping negative and corrupting the durable counter)
        if (d.n_tokens >= 0 && d.n_tokens <= budget - u) {
          u += d.n_tokens
          Some(Admitted(d.doc_id, source, d.n_tokens, u))
        } else None // skip: a later, smaller doc may still fit
      }
      used.update(u)
      out.iterator
    }
  }
}
