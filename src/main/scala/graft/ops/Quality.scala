package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document quality signals + the engine's canonical keep rule — shared by
  * the standalone quality query, the cleaning pipeline's first stage and
  * the data-mixing report, so the thresholds exist in exactly one place.
  *
  * All signals are exact integers computed in one narrow map (no shuffle);
  * the keep rule uses integer-scaled comparisons so engines agree
  * bit-for-bit (each has a DuckDB mirror in the oracle SQL).
  */
object Quality {

  /** The stopword list the stopword-ratio signal counts. */
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "a", "is", "for", "on", "with")

  /** Append the integer quality-signal columns
    * (n_words, stop_cnt, n_punct, n_chars_t) for `textCol`. Narrow map;
    * tokenization is the native [[graft.functions.WordsOf]] expression. */
  def withSignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val words = call_function("graft_words", col(textCol))
    df.withColumn("n_words", size(words).cast("long"))
      .withColumn("stop_cnt",
        size(filter(words, w => w.isin(stopwords: _*))).cast("long"))
      .withColumn("n_punct",
        (length(col(textCol)) - length(regexp_replace(col(textCol), "[.,;:!?]", "")))
          .cast("long"))
      .withColumn("n_chars_t", length(col(textCol)).cast("long"))
  }

  /** The canonical keep rule over [[withSignals]] columns: at least 20
    * words, stopword ratio ≥ 2%, punctuation ratio ≤ 10% — integer-scaled,
    * no float comparisons. */
  def keepFlag: Column =
    col("n_words") >= 20 && col("stop_cnt") * 100 >= col("n_words") * 2 &&
      col("n_punct") * 100 <= col("n_chars_t") * 10
}
