package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines. Everything is built from codegen'd `functions._`
  * expressions — no UDFs — so a 100 TB documents scan stays inside
  * whole-stage codegen with full column pruning.
  */
object TextFns {

  /** ASCII whitespace as an explicit class — Java's `\s` matches
    * vertical tab the same as RE2's, but pinning the exact characters
    * (like [[PUNCT_CLASS]]) removes any engine-version drift between
    * Spark regexes and their DuckDB oracle twins.
    */
  val WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"

  /** Whitespace tokenization (trimmed; empty string → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), WS_CLASS + "+"))

  /** Token count as BIGINT. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** Lowercase + strip everything but letters/digits/whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", "")

  /** ASCII punctuation as an explicit class — identical in Java regex
    * and DuckDB's RE2 (`\p{Punct}` exists only in Java; RE2 has no
    * lookarounds either, so oracle-facing regexes stick to plain classes).
    */
  val PUNCT_CLASS = "[!-/:-@\\[-`{-~]"

  /** BPE-ish subword-count estimate: each punctuation character is one
    * token, each maximal run of non-space non-punctuation characters is
    * one token (equivalent to splitting at every boundary adjacent to
    * whitespace/punctuation and dropping blanks — but with no regex
    * lookarounds, so it is cheaper and DuckDB-oracle-expressible).
    */
  def approxBpeTokenCount(text: Column): Column =
    ((length(text) - length(regexp_replace(text, PUNCT_CLASS, ""))) +
      size(filter(split(text, "[ \\t\\n\\x0B\\f\\r!-/:-@\\[-`{-~]+"), t => length(t) > 0)))
      .cast("bigint")

  /** Word n-gram shingles: `["a b c", "b c d", ...]` for n-word windows.
    * Docs shorter than n shingle to the whole (trimmed) text so every
    * document still has a non-empty signature. Native one-pass
    * expression ([[WordShingles]] — the hottest path in the catalog;
    * the HOF construction it replaced paid an interpreted lambda +
    * slice + join per window).
    */
  def shingles(text: Column, n: Int): Column = WordShingles(text, n)

  /** The `transform`/`slice`/`array_join` relational construction of
    * [[shingles]] — kept as the independent cross-check
    * [[WordShingles]] is differentially specced against.
    */
  def shinglesRelational(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array(array_join(t, " ")))
      .otherwise(transform(
        sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
  }

  /** MD5 content fingerprint (hex string) — exact-dup key. */
  def fingerprint(text: Column): Column = md5(text)

  /** 64-bit fast fingerprint (xxhash64) — cheaper join key than md5. */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Rolling document fingerprint: 61-bit hash ([[HashFns.hash61]])
    * over the n-gram shingle set, order-independent (min-combine) —
    * stable under reordering of identical shingle content.
    */
  def rollingFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => HashFns.hash61(s)))

  /** Punctuation character ratio in [0,1] (ASCII [[PUNCT_CLASS]]). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(text, PUNCT_CLASS, ""))).cast("double") / len)
  }

  /** Ratio of tokens that are in the given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val sw = typedlit(stopwords)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, w => array_contains(sw, lower(w)))).cast("double") / size(t))
  }

  /** Mean token length (characters), 0 for empty docs. */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation and a natural stopword rate. Deterministic, heuristic —
    * the shape a quality-filter stage needs, tune weights per corpus.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = EN_STOPWORDS): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 100.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val swr = stopwordRatio(text, stopwords)
    val stopScore = greatest(lit(0.0), lit(1.0) - abs(swr - 0.4) * 2.0)
    round((lengthScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6)
  }

  // ------------------------------------------------------------------ //
  // PII detection / redaction                                          //
  // ------------------------------------------------------------------ //

  /** RE2-safe PII patterns (no lookarounds, explicit classes) — shared
    * verbatim with the DuckDB oracle twins. `\d`/`\b` are ASCII in both
    * engines here.
    */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SSN_RE = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PHONE_RE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact emails, SSNs, then phone numbers (fixed order — SSN before
    * phone so `ddd-dd-dddd` is never half-eaten by the phone pattern).
    * Pure codegen'd regexp_replace chain, map-only at any scale.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EMAIL_RE, "<EMAIL>"),
        SSN_RE, "<SSN>"),
      PHONE_RE, "<PHONE>")

  /** Match count of one PII pattern, as BIGINT. */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("bigint")

  val EN_STOPWORDS: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deterministic, pure-expression; real corpora would use a
    * larger table (broadcast map), same plan shape.
    */
  val LANG_MARKERS: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"))

  /** Language-ID: argmax of marker-word hit counts; "und" (undetermined)
    * when nothing matches. Single projection, no shuffle. Native
    * one-pass expression as of r16 ([[LangId]]): the r15 string
    * arithmetic below generated 40 replace+length full-string scans
    * per call — big enough that a stage composing langId with another
    * wide operator (q180's agreement join) blew janino's 64 KB method
    * limit and silently ran INTERPRETED.
    */
  def langId(text: Column, markers: Map[String, Seq[String]] = LANG_MARKERS): Column =
    LangId(text, markers)

  /** The double-space string-arithmetic construction of [[langId]]
    * (r15) — kept as the independent cross-check the native [[LangId]]
    * expression is differentially specced against (the
    * [[shinglesRelational]] precedent). Tokens joined with a DOUBLE
    * space (each occurrence owns its flanking spaces, so adjacent hits
    * cannot overlap), lowercased once; each marker's occurrences count
    * by length delta. A token equals at most one marker within a
    * language, so the per-marker sum equals a per-token filter count.
    */
  def langIdRelational(text: Column, markers: Map[String, Seq[String]] = LANG_MARKERS): Column = {
    val js = concat(lit("  "), lower(array_join(tokens(text), "  ")),
      lit("  "))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val s = words.map { w0 =>
        val p = s" ${w0.toLowerCase} "
        (length(js) - length(replace(js, lit(p), lit("")))) / lit(p.length)
      }.reduce(_ + _)
      struct(s.cast("int").as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
