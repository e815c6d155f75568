package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level repetition statistics — the Gopher-style "repetitive
  * document" signals a quality-filter stage cuts on (see the reference's
  * quality-filter surface; cf. Rae et al. 2021 §A.1.1). Two signals:
  *
  *  - `dup_word_frac`: fraction of word occurrences that are repeats of
  *    an earlier word (1 − distinct/total) — computed per row from the
  *    token array, map-only;
  *  - `top_ngram_char_frac`: characters covered by the most frequent
  *    word n-gram (count × gram length) over the document's character
  *    count — computed by exploding n-grams and aggregating twice on the
  *    8-byte doc id (both aggregations get map-side partials; nothing
  *    wider than (id, gram) ever shuffles).
  *
  * Scale shape: one scan, one explode, two hash aggregations and a
  * per-doc join on the id — no window, no driver-side state; survives a
  * 100 TB documents table as long as single documents fit in a task.
  */
object TextStats {

  /** Per-doc repetition metrics: `(idCol, n_tokens, dup_word_frac,
    * top_ngram_char_frac)`, one row per input row.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    // most-repeated n-gram, measured in characters it covers; max of
    // (count × length) is tie-stable where "the" most common gram is not
    val topChars = df
      .select(col(idCol).as("__id"), explode(TextFns.shingles(col(textCol), n)).as("g"))
      .groupBy("__id", "g").agg(count(lit(1)).as("c"))
      .groupBy("__id").agg(max(col("c") * length(col("g"))).as("top_chars"))
    val toks = TextFns.tokens(col(textCol))
    val perDoc = df.select(col(idCol).as("__id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"),
      length(col(textCol)).cast("bigint").as("n_chars"))
    perDoc.join(topChars, Seq("__id"))
      .select(col("__id").as(idCol),
        col("n_tokens"),
        round(when(col("n_tokens") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")), 6)
          .as("dup_word_frac"),
        round(when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("top_chars").cast("double") / col("n_chars")), 6)
          .as("top_ngram_char_frac"))
  }
}
