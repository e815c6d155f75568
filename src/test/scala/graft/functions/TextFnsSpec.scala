package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokens splits on whitespace runs, trims, empty → empty array") {
    val t = Seq("  a  b\tc ", "", "one").toDF("t")
      .select(TextFns.tokens(col("t")).as("v")).as[Seq[String]].collect()
    assert(t(0) === Seq("a", "b", "c"))
    assert(t(1) === Seq.empty)
    assert(t(2) === Seq("one"))
  }

  test("tokenCount") {
    assert(one[Long](TextFns.tokenCount(col("t")), "a b c") === 3L)
    assert(one[Long](TextFns.tokenCount(col("t")), "") === 0L)
  }

  test("normalize lowercases and strips punctuation") {
    assert(one[String](TextFns.normalize(col("t")), "Hello, World! 42") === "hello world 42")
  }

  test("shingles: n-word windows; short docs shingle whole text") {
    assert(one[Seq[String]](TextFns.shingles(col("t"), 2), "a b c") === Seq("a b", "b c"))
    assert(one[Seq[String]](TextFns.shingles(col("t"), 5), "a b") === Seq("a b"))
  }

  test("native shingles ≡ the relational HOF construction, edge cases included") {
    // deliberate hazards: non-space whitespace at the ends (Spark trim
    // strips spaces ONLY, so split emits leading/trailing empty
    // tokens), runs of mixed whitespace, short docs, empty, spaces-only
    val corpus = Seq(
      "a b c d e", "  padded  with   runs \t and\ttabs ", "\tleading tab",
      "trailing newline\n", "", "   ", "one", "x y", "ab\fc\rd",
      " \t mixed \n ends  ") ++
      (0 until 200).map(i => s"w${i % 7} w${i % 3} w${i % 11} w${i % 5} w$i")
    for (n <- Seq(2, 3, 5)) {
      val both = corpus.toDF("t").select(
        TextFns.shingles(col("t"), n).as("native"),
        TextFns.shinglesRelational(col("t"), n).as("rel"))
        .as[(Seq[String], Seq[String])].collect()
      both.zip(corpus).foreach { case ((nat, rel), text) =>
        assert(nat === rel, s"n=$n text=${text.take(30)}")
      }
    }
  }

  test("fingerprint is md5 hex") {
    assert(one[String](TextFns.fingerprint(col("t")), "hello")
      === "5d41402abc4b2a76b9719d911017c592")
  }

  test("punctRatio / stopwordRatio / meanTokenLength") {
    assert(one[Double](TextFns.punctRatio(col("t")), "ab,.") === 0.5)
    assert(one[Double](TextFns.stopwordRatio(col("t"), Seq("the")), "the cat the dog") === 0.5)
    assert(one[Double](TextFns.meanTokenLength(col("t")), "ab abcd") === 3.0)
    assert(one[Double](TextFns.meanTokenLength(col("t")), "") === 0.0)
  }

  test("langId picks the language with most marker hits; und when none") {
    assert(one[String](TextFns.langId(col("t")), "the cat and the dog is here") === "en")
    assert(one[String](TextFns.langId(col("t")), "el perro y la casa de madrid") === "es")
    assert(one[String](TextFns.langId(col("t")), "zzz qqq xxx") === "und")
  }

  test("native LangId ≡ the r15 string-arithmetic construction (r16 pin)") {
    // deliberate hazards: multi-language markers ("de"/"la"/"un" score
    // es AND fr), ties (array_max hands a score tie to the
    // binary-greatest lang), case folding, repeated markers in one
    // doc, non-space whitespace ends, empty / spaces-only / NULL text
    // (the relational when(...) falls through to "und" on NULL — the
    // native form must match, not return NULL)
    val corpus: Seq[String] = Seq(
      "the cat and the dog is here", "el perro y la casa de madrid",
      "der hund ist nicht hier und das ist gut",
      "le chat est dans la maison de paris",
      "de la un", "DE LA UN los une", "zzz qqq xxx", "", "   ",
      "\tthe\nla ", "the el der le", "the the the el el",
      "The And Of", "que los se por dans une est",
      null) ++
      (0 until 300).map { i =>
        val ws = Seq("the", "la", "de", "und", "est", "zz", "los",
          "von", "it", "dans")
        (0 until 6).map(j => ws((i * 7 + j * 3) % ws.length)).mkString(" ")
      }
    val both = corpus.toDF("t").select(
      TextFns.langId(col("t")).as("native"),
      TextFns.langIdRelational(col("t")).as("rel"))
      .collect()
    both.zip(corpus).foreach { case (r, text) =>
      assert(r.getString(0) === r.getString(1),
        s"text=${Option(text).map(_.take(40))}")
    }
  }

  test("qualityScore is bounded [0,1] and favors natural text") {
    val natural = one[Double](TextFns.qualityScore(col("t")),
      ("the quick brown fox jumps over the lazy dog and runs to the hill " * 8).trim)
    val junk = one[Double](TextFns.qualityScore(col("t")), "!!! ### $$$ %%%")
    assert(natural > junk)
    assert(natural <= 1.0 && junk >= 0.0)
  }

  test("approxBpeTokenCount counts word+punct boundaries") {
    assert(one[Long](TextFns.approxBpeTokenCount(col("t")), "hi, there") === 3L)
  }

  test("PII: counts find email/ssn/phone; redaction replaces all, leaves clean text") {
    val dirty = "mail a@b.co or x.y+z@mail.org, call 555-867-5309, ssn 123-45-6789 ok"
    assert(one[Long](TextFns.piiCount(col("t"), TextFns.EMAIL_RE), dirty) === 2L)
    assert(one[Long](TextFns.piiCount(col("t"), TextFns.SSN_RE), dirty) === 1L)
    assert(one[Long](TextFns.piiCount(col("t"), TextFns.PHONE_RE), dirty) === 1L)
    val red = one[String](TextFns.redactPii(col("t")), dirty)
    assert(red === "mail <EMAIL> or <EMAIL>, call <PHONE>, ssn <SSN> ok")
    val clean = "no personal data here, just 12 words and 3 numbers"
    assert(one[String](TextFns.redactPii(col("t")), clean) === clean)
  }
}
