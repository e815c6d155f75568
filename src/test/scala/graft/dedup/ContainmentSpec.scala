package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val quote = (1 to 12).map(i => s"q$i").mkString(" ")
  private val longDoc = quote + " " + (1 to 60).map(i => s"f$i").mkString(" ")

  test("a short doc quoted inside a long one: high containment, low Jaccard") {
    val corpus = Seq(
      (1L, quote),
      (2L, longDoc),
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")))
      .toDF("id", "text")
    val pairs = Dedup.containmentPairs(corpus, "id", "text",
        shingleWidth = 3, maxDf = 10, minContX1000 = 500, minInter = 3)
      .collect()
    assert(pairs.length === 1)
    val r = pairs.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    // every shingle of the quote appears in the long doc
    assert(r.getLong(5) === 1000L, s"cont_a was ${r.getLong(5)}")
    // while symmetric Jaccard is small: |A∩B| / |A∪B| well under 0.3
    val inter = r.getLong(2).toDouble
    val union = r.getLong(3) + r.getLong(4) - inter
    assert(inter / union < 0.3)
  }

  test("ubiquitous shingles (df > maxDf) never generate pairs") {
    // every doc shares the same 3 words — df of that shingle = 12 > maxDf
    val corpus = (1L to 12L).map(i => (i, s"common one two extra$i tail$i"))
      .toDF("id", "text")
    val pairs = Dedup.containmentPairs(corpus, "id", "text",
      shingleWidth = 3, maxDf = 5, minContX1000 = 100, minInter = 1)
    assert(pairs.count() === 0)
  }

  test("minInter filters single-shingle collisions") {
    val corpus = Seq(
      (1L, "a b c unique1 unique2"),
      (2L, "a b c other3 other4")).toDF("id", "text")
    // the docs share exactly one 3-shingle ("a b c")
    val loose = Dedup.containmentPairs(corpus, "id", "text",
      shingleWidth = 3, maxDf = 10, minContX1000 = 100, minInter = 1)
    val strict = Dedup.containmentPairs(corpus, "id", "text",
      shingleWidth = 3, maxDf = 10, minContX1000 = 100, minInter = 2)
    assert(loose.count() === 1)
    assert(strict.count() === 0)
  }

  test("deterministic across partitionings") {
    val corpus = Seq((1L, quote), (2L, longDoc),
      (3L, quote + " " + (1 to 9).map(i => s"g$i").mkString(" ")))
      .toDF("id", "text")
    val a = Dedup.containmentPairs(corpus, "id", "text", 3, 10, 100, 1)
      .orderBy("id_a", "id_b").collect()
    val b = Dedup.containmentPairs(corpus.repartition(7), "id", "text", 3, 10, 100, 1)
      .orderBy("id_a", "id_b").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
