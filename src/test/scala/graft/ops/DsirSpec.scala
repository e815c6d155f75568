package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "dom")

  test("merge(train(A), train(B)) == train(A ∪ B) exactly") {
    val a = docs((1L, "alpha beta gamma alpha", "t"), (2L, "delta beta", "r"))
    val b = docs((3L, "alpha epsilon", "t"), (4L, "zeta zeta eta", "r"))
    val u = a.unionByName(b)
    val merged = Dsir.merge(
        Dsir.train(a, "text", col("dom") === "t", 16),
        Dsir.train(b, "text", col("dom") === "t", 16))
      .orderBy("b").collect()
    val direct = Dsir.train(u, "text", col("dom") === "t", 16)
      .orderBy("b").collect()
    assert(merged.toSeq === direct.toSeq)
  }

  test("scores separate target-like from raw-like documents") {
    // target docs use one 20-word vocabulary, raw docs another; with
    // 10 docs per side the per-bucket counts dominate both the add-one
    // smoothing and any single hash-bucket collision. A probe doc of
    // target words must strictly outscore one of raw-only words (whose
    // tokens carry the negative raw-heavy weights).
    val tVocab = (0 until 20).map(i => s"t$i").mkString(" ")
    val rVocab = (0 until 20).map(i => s"r$i").mkString(" ")
    val corpus = docs(
      ((1L to 10L).map(i => (i, tVocab, "t")) ++
        (11L to 20L).map(i => (i, rVocab, "r")) ++
        Seq((21L, tVocab, "x"), (22L, rVocab, "x"))): _*)
    val scored = Dsir.selectScores(corpus, "id", "text",
        isTarget = col("dom") === "t", numBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored(21L) > 0, s"target-vocab probe ${scored(21L)} should be positive")
    assert(scored(22L) < 0, s"raw-vocab probe ${scored(22L)} should be negative")
  }

  test("empty and whitespace docs score (0, 0); every doc emits one row") {
    val corpus = docs((1L, "a b c", "t"), (2L, "", "r"), (3L, "   ", "r"))
    val out = Dsir.selectScores(corpus, "id", "text",
      isTarget = col("dom") === "t", numBuckets = 8).orderBy("id").collect()
    assert(out.length === 3)
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L)
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 0L)
  }

  test("scores are deterministic across partitionings") {
    val corpus = (1L to 200L).map(i =>
      (i, s"w${i % 17} w${i % 5} w${i % 29} tail", if (i % 3 == 0) "t" else "r"))
      .toDF("id", "text", "dom")
    val a = Dsir.selectScores(corpus, "id", "text", col("dom") === "t", 64)
      .orderBy("id").collect()
    val b = Dsir.selectScores(corpus.repartition(13), "id", "text",
        col("dom") === "t", 64)
      .orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("merge is associative: (A⊕B)⊕C == A⊕(B⊕C) == train(A∪B∪C)") {
    val a = docs((1L, "alpha beta", "t"), (2L, "gamma", "r"))
    val b = docs((3L, "alpha delta", "r"))
    val c = docs((4L, "beta beta epsilon", "t"))
    val ta = Dsir.train(a, "text", col("dom") === "t", 16)
    val tb = Dsir.train(b, "text", col("dom") === "t", 16)
    val tc = Dsir.train(c, "text", col("dom") === "t", 16)
    val left = Dsir.merge(Dsir.merge(ta, tb), tc).orderBy("b").collect()
    val right = Dsir.merge(ta, Dsir.merge(tb, tc)).orderBy("b").collect()
    val direct = Dsir.train(a.unionByName(b).unionByName(c), "text",
      col("dom") === "t", 16).orderBy("b").collect()
    assert(left.toSeq === direct.toSeq)
    assert(right.toSeq === direct.toSeq)
  }

  test("count table round-trips through parquet (profile-store lifecycle)") {
    val corpus = docs((1L, "alpha beta gamma", "t"), (2L, "delta beta zeta", "r"))
    val counts = Dsir.train(corpus, "text", col("dom") === "t", 32)
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    counts.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val a = Dsir.score(corpus, "id", "text", counts, 32).orderBy("id").collect()
    val b = Dsir.score(corpus, "id", "text", reloaded, 32).orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("a pre-trained count table scores a disjoint corpus (split lifecycle)") {
    val tVocab = (0 until 10).map(i => s"t$i").mkString(" ")
    val rVocab = (0 until 10).map(i => s"r$i").mkString(" ")
    val trainCorpus = docs(
      ((1L to 5L).map(i => (i, tVocab, "t")) ++
        (6L to 10L).map(i => (i, rVocab, "r"))): _*)
    val counts = Dsir.train(trainCorpus, "text", col("dom") === "t", 64)
    // fresh corpus, including unseen vocabulary — must not throw, one
    // row per doc; target-vocab doc outscores the raw-heavy one, and
    // unseen tokens are uninformative (score ≈ the smoothing constant,
    // between the two)
    val fresh = docs((10L, tVocab, "x"), (11L, rVocab, "x"),
      (12L, "quartz obsidian feldspar", "x"))
    val out = Dsir.score(fresh, "id", "text", counts, 64).orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size === 3)
    assert(out(10L) > out(11L),
      s"target-vocab ${out(10L)} should outscore raw-vocab ${out(11L)}")
    assert(out(12L) > out(11L),
      s"unseen-vocab ${out(12L)} should outscore raw-vocab ${out(11L)}")
  }

  test("a numBuckets mismatch between train and score fails fast, not silently") {
    // trained at 256, scored at 64: the modulo would remap tokens and
    // range(64) would treat buckets 64..255 as unseen — silent wrong
    // scores; the in-plan guard must abort with a diagnostic instead
    val corpus = docs((1L, "a b c d e f g h i j k l m n o p", "t"),
      (2L, "q r s t u v w x y z aa bb cc dd ee ff", "r"))
    val counts = Dsir.train(corpus, "text", col("dom") === "t", 256)
    val e = intercept[Exception](
      Dsir.score(corpus, "id", "text", counts, 64).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("outside [0, 64)")),
      s"expected the bucket-range diagnostic, got: ${msgs(e).mkString(" | ")}")
  }
}
