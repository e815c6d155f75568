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
  * Scale shape: ONE scan — the per-row token stats ride through the
  * n-gram explode as extra columns (constant per doc, re-aggregated
  * with `max`), so the text is decoded and tokenized once, followed by
  * two hash aggregations on the doc id (both with map-side partials);
  * no join, no window, no driver-side state. The carried stats widen
  * the (id, gram) shuffle rows by three bigints — the price of the
  * single scan. Survives a 100 TB documents table as long as single
  * documents fit in a task.
  */
object TextStats {

  /** Per-doc repetition metrics: `(idCol, n_tokens, dup_word_frac,
    * top_ngram_char_frac)`, one row per distinct id. Expects one input
    * row per id: duplicate-id rows merge (gram counts pool while the
    * per-row stats combine via max), which inflates the fractions —
    * dedupe upstream if ids can repeat.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val exploded = df.select(col(idCol).as("__id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct"),
      length(col(textCol)).cast("bigint").as("n_chars"),
      explode(TextFns.shingles(col(textCol), n)).as("g"))
    // most-repeated n-gram, measured in characters it covers; max of
    // (count × length) is tie-stable where "the" most common gram is not.
    // The per-doc stats are constant within a group, so max() re-emits
    // them without a second scan of the text.
    val topChars = exploded
      .groupBy("__id", "g")
      .agg(count(lit(1)).as("c"), max("n_tokens").as("n_tokens"),
        max("n_distinct").as("n_distinct"), max("n_chars").as("n_chars"))
      .groupBy("__id")
      .agg(max(col("c") * length(col("g"))).as("top_chars"),
        max("n_tokens").as("n_tokens"), max("n_distinct").as("n_distinct"),
        max("n_chars").as("n_chars"))
    topChars
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
