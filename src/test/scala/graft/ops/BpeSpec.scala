package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy left-to-right symbol-scan merge — the canonical
    * BPE merge-application semantics the two-pass replace must match.
    */
  private def greedy(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("double-delimited replace merge == greedy symbol scan (exhaustive over {a,b}^<=10, all pairs)") {
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
    val words = (1 to 10).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if (((bits >> i) & 1) == 0) "a" else "b").mkString
      }
    }
    for ((a, b) <- pairs) {
      val df = words.toDF("w")
        .select(col("w"), Bpe.applyMerge(Bpe.spacedChars(col("w")), s"$a $b", a + b).as("r"))
      val got = df.collect().map { case Row(w: String, r: String) => (w, r) }.toMap
      for (w <- words) {
        val want = greedy(w.map(_.toString).toVector, a, b).mkString(" ")
        assert(got(w) == want, s"pair ($a,$b) on '$w': got '${got(w)}', want '$want'")
      }
    }
  }

  test("second merge over multi-char symbols == composed greedy (exhaustive over {a,b}^<=8)") {
    // first merge (a,b)->ab, then (ab,a)->aba: exercises multi-char
    // symbols and a pair whose left side is itself a merge product.
    val words = (1 to 8).flatMap { n =>
      (0 until (1 << n)).map { bits =>
        (0 until n).map(i => if (((bits >> i) & 1) == 0) "a" else "b").mkString
      }
    }
    val merges = Seq(Bpe.BpeMerge(1, "a b", "ab", 0L), Bpe.BpeMerge(2, "ab a", "aba", 0L))
    val df = words.toDF("w")
      .select(col("w"), Bpe.applyMerges(Bpe.spacedChars(col("w")), merges).as("r"))
    val got = df.collect().map { case Row(w: String, r: String) => (w, r) }.toMap
    for (w <- words) {
      val g1 = greedy(w.map(_.toString).toVector, "a", "b")
      val g2 = greedy(g1, "ab", "a")
      assert(got(w) == g2.mkString(" "), s"'$w': got '${got(w)}', want '${g2.mkString(" ")}'")
    }
  }

  test("train learns the expected merges on a hand-computed corpus") {
    // Classic toy corpus: low/lower/newest/widest (Sennrich et al. §3).
    // Weighted by repetition: "low" x5, "lower" x2, "newest" x6, "widest" x3.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 3, topWords = 10)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ... tie
    // (e s) vs (s t) broken lexicographically -> "e s"; round 2: "es t"
    // (9); round 3: (l,o)=7 vs (o,w)=7 -> "l o".
    assert(merges.map(m => (m.pair, m.merged, m.weight)) == Seq(
      ("e s", "es", 9L), ("es t", "est", 9L), ("l o", "lo", 7L)))
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "a b c a b")).toDF("id", "text")
    // every word is a single char: zero adjacent pairs ever.
    assert(Bpe.train(docs, "text", numMerges = 4, topWords = 10).isEmpty)
  }

  test("segmentWords reproduces training's final representation") {
    val docs = Seq((1L, "abab abab abba baba baab")).toDF("id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4, topWords = 10)
    val seg = Bpe.segmentWords(docs, "text", merges, topWords = 10)
      .select("word", "seg", "n_symbols").collect()
      .map { case Row(w: String, s: String, n: Long) => w -> ((s, n)) }.toMap
    // independently recompute by composing greedy merges
    for (w <- Seq("abab", "abba", "baba", "baab")) {
      var syms = w.map(_.toString).toVector
      for (m <- merges) {
        val Array(a, b) = m.pair.split(" ")
        syms = greedy(syms, a, b)
      }
      assert(seg(w) == (syms.mkString(" "), syms.length.toLong), s"word $w")
    }
  }

  test("tokenCounts joins the dictionary and falls back to char count off-dictionary") {
    val train = Seq((1L, "aa aa aa bb")).toDF("id", "text")
    val merges = Bpe.train(train, "text", numMerges = 2, topWords = 10)
    // merges: (a,a)->aa (count 3) then (b,b)->bb -> both words 1 symbol
    val docs = Seq((1L, "aa bb"), (2L, "aa zzz"), (3L, "")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges, topWords = 10)
      .orderBy("doc_id").collect()
      .map { case Row(id: Long, nt: Long, nb: Long) => (id, nt, nb) }
    // doc 2: "zzz" is off-dictionary -> 3 chars = 3 symbols.
    assert(got.toSeq == Seq((1L, 2L, 2L), (2L, 2L, 4L), (3L, 0L, 0L)))
  }

  test("coverageReport: OOV rate and fertility per group, hand-computed") {
    import spark.implicits._
    // "aa" dominates and merges to one symbol; "zz" never enters the
    // 1-word dictionary
    val docs = Seq(
      ("g1", "aa aa aa aa"),      // 4 words, all in dict
      ("g2", "aa zz zz zz"))      // 1 in dict, 3 OOV (2 chars each)
      .toDF("lang", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2, topWords = 1)
    val out = Bpe.coverageReport(docs, "text", merges, topWords = 1, "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // g1: 4 words, 4 in dict, oov 0; "aa" merges a+a → 1 symbol → fert 1000
    // g2: 4 words, 1 in dict, oov 750; symbols = 1 + 3×2 = 7 → 1750
    assert(out.toSeq === Seq(
      ("g1", 4L, 4L, 0L, 1000L),
      ("g2", 4L, 1L, 750L, 1750L)))
  }
}
