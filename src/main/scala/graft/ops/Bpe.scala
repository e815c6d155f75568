package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training and
  * application — the tokenizer-building stage of an LLM data pipeline
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"; the reference's row-transform surface has
  * no tokenizer, so this is a beyond-reference training-data operator).
  *
  * Algorithm (the classic word-level formulation):
  *
  *  1. collapse the corpus to a word-frequency table and keep the top
  *     `topWords` by (count DESC, word ASC) — the standard bounded
  *     training dictionary (real trainers cap or min-count the vocab;
  *     a 100 TB corpus has a bounded distinct-word table after this
  *     step, and ONLY this step scans the corpus);
  *  2. represent each word as space-separated symbols (initially
  *     single characters — tokens cannot contain spaces, so the space
  *     is a safe symbol delimiter);
  *  3. for each of `numMerges` rounds: count adjacent symbol pairs
  *     weighted by word count (2-shingles of the symbol string — the
  *     native [[graft.functions.WordShingles]] pass), pick the most
  *     frequent pair (ties to the lexicographically smallest — total
  *     order, so any partitioning agrees), and merge every occurrence
  *     of that pair in every word.
  *
  * Merge application is ONE `replace` pass over a DOUBLE-delimited
  * form: symbols separated by two spaces, one space at each end
  * (" a  b  c "), pattern " a  b ", replacement " ab ". A match
  * consumes its pair plus exactly ONE of the two delimiter spaces
  * that follow, so the scan always resumes on a full symbol boundary
  * — which makes plain leftmost non-overlapping substring replacement
  * EXACTLY the left-to-right greedy symbol scan of canonical BPE
  * (with single-space delimiters the match eats the shared boundary
  * and " a a a a a " under/mis-merges; `BpeSpec` exhaustively checks
  * the double-delimiter form against an independent scan
  * implementation). `replace` behaves identically in Spark and
  * DuckDB, which is what makes the whole trainer oracle-replayable.
  *
  * Scale shape: one corpus scan (word counts, map-side partial hash
  * agg) → TakeOrdered top-`topWords` → the merge loop runs on the
  * bounded dictionary (≤ topWords rows; each round is one tiny
  * map-side-combined pair aggregation plus a 1-row driver argmax —
  * the bounded-collect class of the k-means sample). Applying the
  * tokenizer to a corpus is a join of the token stream against the
  * per-distinct-word segmentation dictionary — broadcast when the
  * dictionary is small, sort-merge otherwise; the text itself is
  * never re-scanned per merge.
  */
object Bpe {

  /** One learned merge: `pair` is the space-separated symbol pair
    * ("a b"), `merged` the fused symbol ("ab"), `weight` the weighted
    * occurrence count that won the round.
    */
  final case class BpeMerge(step: Int, pair: String, merged: String, weight: Long)

  /** Space-separated single characters of a word (the initial symbol
    * representation). Spark's `split(s, "")` yields one element per
    * character with no trailing empty element.
    */
  def spacedChars(word: Column): Column = concat_ws(" ", split(word, ""))

  /** Apply one merge to a single-spaced symbol representation: widen
    * to the double-delimited form, one exact-greedy replace pass,
    * collapse back (see object doc). Double spaces only ever arise
    * from adjacent replacements (trailing+leading space), never
    * deeper, so the final collapse is unambiguous.
    */
  def applyMerge(repr: Column, pair: String, merged: String): Column = {
    val Array(a, b) = pair.split(" ", 2)
    val padded = concat(lit(" "), replace(repr, lit(" "), lit("  ")), lit(" "))
    val out = replace(padded, lit(" " + a + "  " + b + " "), lit(" " + merged + " "))
    trim(replace(out, lit("  "), lit(" ")))
  }

  /** Apply an ordered merge list (chained column expressions — one
    * codegen'd projection, no per-row interpretation).
    */
  def applyMerges(repr: Column, merges: Seq[BpeMerge]): Column =
    merges.foldLeft(repr)((r, m) => applyMerge(r, m.pair, m.merged))

  /** Top-`topWords` word-frequency table of a corpus: `(word, cnt)`,
    * deterministic under ties (count DESC, word ASC). The only
    * corpus-scanning step of training.
    */
  def wordCounts(docs: DataFrame, textCol: String, topWords: Int): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(topWords)

  /** Train `numMerges` BPE merges over a corpus. Returns the ordered
    * merge list (possibly shorter if the dictionary runs out of
    * adjacent pairs). Each round triggers one small job over the
    * cached dictionary; the 1-row argmax collect is bounded by
    * construction.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            topWords: Int = 1000): Seq[BpeMerge] = {
    val words = wordCounts(docs, textCol, topWords)
      .select(col("word"), col("cnt"), spacedChars(col("word")).as("r"))
      .cache()
    try {
      val merges = Seq.newBuilder[BpeMerge]
      var repr = col("r")
      var step = 1
      var done = false
      while (step <= numMerges && !done) {
        val top = words
          .select(col("cnt"), explode(TextFns.shingles(repr, 2)).as("bg"))
          .where(col("bg").contains(" "))
          .groupBy("bg").agg(sum("cnt").as("c"))
          .orderBy(desc("c"), asc("bg"))
          .limit(1)
          .collect()
        if (top.isEmpty) done = true
        else {
          val pair = top(0).getString(0)
          val merged = pair.replace(" ", "")
          merges += BpeMerge(step, pair, merged, top(0).getLong(1))
          repr = applyMerge(repr, pair, merged)
          step += 1
        }
      }
      merges.result()
    } finally words.unpersist()
  }

  /** Segment the training dictionary under a merge list:
    * `(word, cnt, seg, n_symbols)` — the materialized tokenizer
    * dictionary a corpus-apply joins against.
    */
  def segmentWords(docs: DataFrame, textCol: String, merges: Seq[BpeMerge],
                   topWords: Int = 1000): DataFrame =
    wordCounts(docs, textCol, topWords)
      .select(col("word"), col("cnt"),
        applyMerges(spacedChars(col("word")), merges).as("seg"))
      .withColumn("n_symbols", size(split(col("seg"), " ")).cast("bigint"))

  /** Per-document BPE token counts under a trained model: explode the
    * token stream, join the segmentation dictionary (words outside the
    * training dictionary fall back to character count — every char is
    * a symbol when no merge applies), sum per doc. The join is the
    * scale story: the dictionary is bounded (`topWords`), so Catalyst
    * broadcasts it; the corpus side stays map-only around one hash
    * aggregation on the 8-byte doc id.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[BpeMerge], topWords: Int = 1000,
                  carry: Seq[String] = Seq.empty): DataFrame = {
    val dict = segmentWords(docs, textCol, merges, topWords)
      .select(col("word"), col("n_symbols"))
    val toks = docs.select(col(idCol).as("__id") +: carry.map(col) :+
      TextFns.tokens(col(textCol)).as("w"): _*)
    toks.select(col("__id"), explode(col("w")).as("word"),
        length(col("word")).cast("bigint").as("n_chars"))
      .join(broadcast(dict), Seq("word"), "left")
      .withColumn("n_sym", coalesce(col("n_symbols"), col("n_chars")))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_sym").as("n_bpe_tokens"))
      .join(toks.select(col("__id") +: carry.map(col): _*), Seq("__id"), "right")
      .select(col("__id").as(idCol) +: carry.map(col) :+
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens") :+
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"): _*)
  }

  /** Tokenizer coverage / fertility report — the per-slice health
    * check before a tokenizer ships: by `groupCol` (language, source),
    * how many word occurrences the trained dictionary covers
    * (`oov_x1000` = out-of-dictionary rate per mille — OOV words pay
    * the char-fallback) and the fertility `fert_x1000` = BPE symbols
    * per word ×1000 (the compression proxy; a slice whose fertility
    * is 2× the corpus average is being tokenized badly and will eat
    * the training budget). Integer outputs only.
    *
    * Scale shape: identical to [[tokenCounts]] — broadcast dictionary
    * join over the exploded token stream, one map-side-partial
    * aggregation on the bounded group key.
    */
  def coverageReport(docs: DataFrame, textCol: String,
                     merges: Seq[BpeMerge], topWords: Int = 1000,
                     groupCol: String = "lang"): DataFrame = {
    val dict = segmentWords(docs, textCol, merges, topWords)
      .select(col("word"), col("n_symbols"))
    docs.select(col(groupCol).as("g"),
        explode(TextFns.tokens(col(textCol))).as("word"))
      .withColumn("n_chars", length(col("word")).cast("bigint"))
      .join(broadcast(dict), Seq("word"), "left")
      .withColumn("in_dict", col("n_symbols").isNotNull.cast("long"))
      .withColumn("n_sym", coalesce(col("n_symbols"), col("n_chars")))
      .groupBy("g")
      .agg(count(lit(1)).as("n_words"), sum("in_dict").as("n_in_dict"),
        sum("n_sym").as("n_sym"))
      .select(col("g").as(groupCol), col("n_words"), col("n_in_dict"),
        expr("(1000 * (n_words - n_in_dict)) div n_words").as("oov_x1000"),
        expr("(1000 * n_sym) div n_words").as("fert_x1000"))
  }
}
