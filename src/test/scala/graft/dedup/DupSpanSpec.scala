package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dupNgramSpans: hand-computable corpora exercising span merging,
  * cross-doc-only semantics, and the left-join zero path.
  */
class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.where(col("id") === id).collect().head

  test("overlapping duplicated n-grams merge into one span") {
    // docs 0 and 1 share tokens 0..5 ("a b c d e f"): two overlapping
    // 5-grams (pos 0 and 1) whose union is 6 tokens, not 10.
    val docs = Seq(
      (0L, "a b c d e f x1 y1 z1 w1"),
      (1L, "a b c d e f x2 y2 z2 w2")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 5)
    val r = row(out, 0L)
    assert(r.getAs[Long]("n_tokens") === 10L)
    assert(r.getAs[Long]("dup_tokens") === 6L)
    assert(r.getAs[Double]("dup_frac") === 0.6)
  }

  test("disjoint shared regions count as separate spans") {
    // shared head (5 tokens) + unique middle + shared tail (5 tokens)
    val docs = Seq(
      (0L, "h1 h2 h3 h4 h5 mid0a mid0b t1 t2 t3 t4 t5"),
      (1L, "h1 h2 h3 h4 h5 mid1a mid1b t1 t2 t3 t4 t5")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 5)
    assert(row(out, 0L).getAs[Long]("dup_tokens") === 10L)
  }

  test("within-doc repetition alone is not duplication") {
    val docs = Seq(
      (0L, "p q r s t p q r s t"), // repeats its own 5-gram
      (1L, "u v w x y zz aa bb cc dd")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 5)
    assert(out.agg(sum("dup_tokens")).head.getLong(0) === 0L)
  }

  test("docs without duplicated grams report zero; short docs are out of scope") {
    val docs = Seq(
      (0L, "a b c d e f g"),
      (1L, "a b c d e f g"),
      (2L, "unrelated words entirely here now ok"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramSpans(docs, "doc_id", "text", n = 5)
    assert(out.count() === 3) // doc 3 has < 5 tokens
    assert(row(out, 0L).getAs[Long]("dup_tokens") === 7L)
    assert(row(out, 0L).getAs[Double]("dup_frac") === 1.0)
    assert(row(out, 2L).getAs[Long]("dup_tokens") === 0L)
    assert(row(out, 2L).getAs[Double]("dup_frac") === 0.0)
  }

  test("cut pass keeps the canonical (min-id) copy, removes the rest") {
    val docs = Seq(
      (0L, "a b c d e f x1 y1 z1 w1"),
      (1L, "a b c d e f x2 y2 z2 w2"),
      (2L, "a b c d e f x3 y3 z3 w3")
    ).toDF("doc_id", "text")
    val out = Dedup.cutDupSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("text_clean"))).toMap
    assert(out(0L) === ((0L, "a b c d e f x1 y1 z1 w1")))
    assert(out(1L) === ((6L, "x2 y2 z2 w2")))
    assert(out(2L) === ((6L, "x3 y3 z3 w3")))
  }

  test("cut pass: doc fully covered by a duplicated span empties out") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = Dedup.cutDupSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("text_clean"))).toMap
    assert(out(0L) === ((0L, "a b c d e f g h")))
    assert(out(1L) === ((8L, "")))
  }

  test("cut pass: untouched and short docs pass through token-joined") {
    val docs = Seq(
      (0L, "unique content one two three"),
      (1L, "short")
    ).toDF("doc_id", "text")
    val out = Dedup.cutDupSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("text_clean"))).toMap
    assert(out(0L) === ((0L, "unique content one two three")))
    assert(out(1L) === ((0L, "short")))
  }
}
