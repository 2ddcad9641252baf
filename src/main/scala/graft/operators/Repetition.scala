package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals: the fraction of a
  * document that is repeated content — the filters (Rae et al. 2021,
  * "Scaling Language Models", §A1.1) that cut boilerplate and
  * keyboard-mash before pre-training.
  *
  *  - `dup_word_frac_e4`: 1 − distinct/total words — how much of the
  *    document is repeated vocabulary;
  *  - `top_bigram_frac_e4`: occurrences of the most frequent word
  *    bigram over total bigrams — degenerate repetition ("la la la")
  *    scores near 10000.
  *
  * Plan: ZERO shuffles. Both signals are per-document functions of
  * the token array, computed in one `mapPartitions` pass (a per-row
  * hash count for the bigram mode — O(words) time and memory per
  * document, not O(words²) like an array-HOF self-count). The
  * explode → groupBy(doc, bigram) → groupBy(doc) alternative costs
  * two keyed shuffles of one row PER BIGRAM — at 100 TB that is the
  * corpus re-shuffled twice for a per-row statistic.
  *
  * Fractions leave as integers (`*_e4`, half-up), computed `count *
  * 10000.0 / total` in IEEE double — the exact arithmetic any SQL
  * oracle replays. Documents with one token have no bigrams:
  * top_bigram_frac_e4 is 0 there by convention.
  */
object Repetition {

  /** (idCol, n_words, dup_word_frac_e4, top_bigram_frac_e4) per
    * document with ≥ 1 whitespace token. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
      expr(MinHashLsh.tokensSql(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.flatMap { case (id, w) =>
          if (w.isEmpty) None
          else {
            val cw = w.length
            val dupE4 = math.floor(
              (cw - w.distinct.length) * 10000.0 / cw + 0.5).toLong
            val topE4 =
              if (cw < 2) 0L
              else {
                val counts = new scala.collection.mutable.HashMap[String, Long]()
                var i = 0
                while (i < cw - 1) {
                  val b = w(i) + " " + w(i + 1)
                  counts.update(b, counts.getOrElse(b, 0L) + 1L)
                  i += 1
                }
                val top = counts.valuesIterator.max
                math.floor(top * 10000.0 / (cw - 1) + 0.5).toLong
              }
            Some((id, cw.toLong, dupE4, topE4))
          }
        }
      }
      .toDF(idCol, "n_words", "dup_word_frac_e4", "top_bigram_frac_e4")
  }
}
