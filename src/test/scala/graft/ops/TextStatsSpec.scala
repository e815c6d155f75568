package graft.ops

import graft.SparkSpec
import org.scalactic.Tolerance._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats: hand-computed dup-word and top-bigram fractions") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 6 tokens, 2 distinct; "a b" ×3 covers 9 of 11 chars
      (2L, "x y z w"),            // no repeated words; every bigram once (3 chars of 7)
      (3L, "solo")                // single token: shingle = whole text
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap

    assert(out(1L)._2 === 6L)
    assert(out(1L)._3 === (1.0 - 2.0 / 6.0 +- 1e-6))
    assert(out(1L)._4 === (9.0 / 11.0 +- 1e-6))   // "a b" count 3 × len 3 / 11 chars
    assert(out(2L)._3 === 0.0)
    assert(out(2L)._4 === (3.0 / 7.0 +- 1e-6))
    assert(out(3L)._2 === 1L)
    assert(out(3L)._4 === 1.0)                     // whole-text shingle covers all chars
  }

  test("mixture sampling: rates honored exactly by the hash rule") {
    val docs = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "en" else "xx")).toDF("id", "grp")
    val out = Mixture.sampleByRates(docs, "id", "grp",
      rates = Map("en" -> 900), defaultPerMille = 100)
    // exact expected membership, recomputed via the Scala-native hash
    val expected = (0L until 1000L).filter { i =>
      val key = graft.functions.HashFns.hash61Bytes(
        s"mix:$i".getBytes("UTF-8")) % 1000
      key < (if (i % 2 == 0) 900 else 100)
    }.toSet
    assert(out.select("id").as[Long].collect().toSet === expected)
    // determinism: same result on a different partitioning
    val out2 = Mixture.sampleByRates(docs.repartition(7), "id", "grp",
      rates = Map("en" -> 900), defaultPerMille = 100)
    assert(out2.select("id").as[Long].collect().toSet === expected)
  }

}
