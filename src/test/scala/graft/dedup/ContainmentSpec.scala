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

  // ------------------------------------------------------------------ //
  // cdcChunkStats                                                      //
  // ------------------------------------------------------------------ //

  test("CDC chunks re-synchronize after a prefix insertion") {
    val body = (1 to 200).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, body),
      (2L, "inserted preamble words here " + body),
      (3L, (301 to 500).map(i => s"other$i").mkString(" ")))
      .toDF("id", "text")
    val rows = Dedup.cdcChunkStats(corpus, "id", "text", boundaryMod = 8)
      .orderBy("id").collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 2 = doc 1 with a prefix: after the first content-defined
    // boundary, chunking realigns, so MOST chunks are shared — a
    // byte-offset chunker would share none
    assert(byId(1L)._3 > 700,
      s"doc 1 should be mostly duplicated chunks, got ${byId(1L)}")
    assert(byId(2L)._3 > 700,
      s"doc 2 should re-synchronize onto doc 1's chunks, got ${byId(2L)}")
    // the unrelated doc shares nothing
    assert(byId(3L)._2 === 0L)
  }

  test("cdcChunkStats: empty docs emit (0,0,0); partition-invariant") {
    val corpus = Seq((1L, "a b c d e f g h"), (2L, ""), (3L, "   "))
      .toDF("id", "text")
    val out = Dedup.cdcChunkStats(corpus, "id", "text", 4).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 3)
    assert(out(1) === ((2L, 0L, 0L, 0L)))
    assert(out(2) === ((3L, 0L, 0L, 0L)))
    val rep = Dedup.cdcChunkStats(corpus.repartition(5), "id", "text", 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq === out.toSeq)
  }

  // ------------------------------------------------------------------ //
  // fuzzy decontamination                                              //
  // ------------------------------------------------------------------ //

  test("nearDupContamination flags an edited copy of an eval item, passes the rest") {
    val evalItem = (1 to 40).map(i => s"e$i").mkString(" ")
    // light edit: one word changed — an exact full-content fingerprint
    // would miss it; the band buckets still collide
    val edited = evalItem.replace("e20", "EDITED")
    val corpus = Seq(
      (1L, edited),
      (2L, (1 to 40).map(i => s"c$i").mkString(" ")))
      .toDF("id", "text")
    val eval = Seq((100L, evalItem)).toDF("id", "text")
    val out = Dedup.nearDupContamination(corpus, "id", "text",
        eval, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === 2)
    assert(out(0)._3 === true, s"edited copy must flag: ${out(0)}")
    assert(out(0)._2 > 0)
    assert(out(1)._3 === false, s"unrelated doc must pass: ${out(1)}")
  }

  test("nearDupContamination is partition-invariant") {
    val evalDf = Seq((1L, (1 to 30).map(i => s"q$i").mkString(" ")))
      .toDF("id", "text")
    val corpus = (10L to 40L).map(i =>
      (i, (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("id", "text")
    val a = Dedup.nearDupContamination(corpus, "id", "text", evalDf, "id", "text")
      .orderBy("id").collect()
    val b = Dedup.nearDupContamination(corpus.repartition(7), "id", "text",
        evalDf, "id", "text")
      .orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
  }

  // ------------------------------------------------------------------ //
  // duplication matrices                                               //
  // ------------------------------------------------------------------ //

  test("crossSourceDupMatrix counts distinct shared contents per source pair") {
    val corpus = Seq(
      (1L, "shared doc one", "A"), (2L, "shared doc one", "B"),
      (3L, "shared doc two", "A"), (4L, "shared doc two", "B"),
      (5L, "shared doc two", "C"),
      (6L, "only in a", "A"), (7L, "only in c", "C"),
      // a WITHIN-source duplicate must not inflate anything
      (8L, "shared doc one", "A"))
      .toDF("id", "text", "src")
    val out = Dedup.crossSourceDupMatrix(corpus, "text", "src")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
  }

  test("crossSourceNearDupMatrix surfaces near-dup (not just exact) sharing") {
    val base = (1 to 40).map(i => s"n$i").mkString(" ")
    val corpus = Seq(
      (1L, base, "A"),
      (2L, base + " tailword", "B"),   // near-dup of 1, different source
      (3L, (100 to 140).map(i => s"m$i").mkString(" "), "C"))
      .toDF("id", "text", "src")
    val out = Dedup.crossSourceNearDupMatrix(corpus, "id", "text", "src")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("A", "B")))
  }

  // ------------------------------------------------------------------ //
  // winnowMatches                                                      //
  // ------------------------------------------------------------------ //

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // k=3, w=4 → any shared run of ≥ 6 tokens must produce ≥1 shared
    // fingerprint. Give the pair a 30-token shared run (≳2 shared
    // prints at density 2/(w+1)) inside otherwise-disjoint docs.
    val run = (1 to 30).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, (1 to 20).map(i => s"a$i").mkString(" ") + " " + run),
      (2L, run + " " + (1 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"c$i").mkString(" ")))
      .toDF("id", "text")
    val pairs = Dedup.winnowMatches(corpus, "id", "text",
        shingleWidth = 3, window = 4, maxDf = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length === 1)
    assert(pairs.head._1 === 1L && pairs.head._2 === 2L)
    assert(pairs.head._3 >= 2, s"expected ≥2 shared fingerprints, got ${pairs.head._3}")
  }

  test("winnowing guarantee holds over 40 seeded random shared-run pairs") {
    // property (seeded-sample house convention): for random docs with a
    // planted shared run of exactly w+k-1 = 6 tokens, the pair ALWAYS
    // shares >= 1 fingerprint — the Schleimer et al. §3 guarantee
    val rnd = new scala.util.Random(20260814L)
    val rows = (0 until 40).flatMap { i =>
      val run = (0 until 6).map(_ => s"r${i}x${rnd.nextInt(1000)}").mkString(" ")
      val da = (0 until 30).map(_ => s"a${i}x${rnd.nextInt(5000)}").mkString(" ")
      val db = (0 until 30).map(_ => s"b${i}x${rnd.nextInt(5000)}").mkString(" ")
      Seq((2L * i, da + " " + run), (2L * i + 1, run + " " + db))
    }
    val corpus = rows.toDF("id", "text")
    val pairs = Dedup.winnowMatches(corpus, "id", "text",
        shingleWidth = 3, window = 4, maxDf = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 40).foreach { i =>
      assert(pairs.contains((2L * i, 2L * i + 1)),
        s"planted pair $i lost its guaranteed fingerprint")
    }
  }

  test("winnowing samples at roughly 2/(w+1) density and is partition-invariant") {
    val docs = (1L to 30L).map(i =>
      (i, (0 until 120).map(j => s"w${(i * 131 + j * 7) % 997}").mkString(" ")))
      .toDF("id", "text")
    val a = Dedup.winnowMatches(docs, "id", "text", 3, 4, 30, 1)
      .orderBy("id_a", "id_b").collect()
    val b = Dedup.winnowMatches(docs.repartition(7), "id", "text", 3, 4, 30, 1)
      .orderBy("id_a", "id_b").collect()
    assert(a.toSeq === b.toSeq)
  }

  // ------------------------------------------------------------------ //
  // setSimJoin                                                         //
  // ------------------------------------------------------------------ //

  test("setSimJoin ≡ the exact cross-join answer over token sets") {
    // vocab-overlapping docs at a mid threshold: the prefix-filter
    // candidates must reproduce EXACTLY the cross join's accepted set
    val docs = (1L to 30L).map(i =>
      (i, (0 to 11).map(j => s"w${(i * 3 + j * 5) % 17}").mkString(" ")))
      .toDF("id", "text")
    val got = Dedup.setSimJoin(docs, "id",
        graft.functions.TextFns.tokens(col("text")), tauX1000 = 500)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    val sets = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet).toMap
    val want = (for {
      a <- sets.keys.toSeq.sorted; b <- sets.keys.toSeq.sorted if a < b
      inter = (sets(a) & sets(b)).size.toLong
      union = (sets(a) | sets(b)).size.toLong
      if 1000 * inter >= 500 * union
    } yield (a, b, inter, 1000 * inter / union))
    assert(got.toSeq === want)
    assert(want.nonEmpty && want.size < (30 * 29) / 2,
      s"test needs a non-trivial accepted subset, had ${want.size}")
  }

  test("setSimJoin finds exact duplicates and near-misses at the threshold boundary") {
    val base = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                      // J(1,2)=1.0
      (2L, base),
      (3L, (1 to 9).map(i => s"t$i").mkString(" ")),   // J(1,3)=9/10
      (4L, (1 to 5).map(i => s"t$i").mkString(" ")),   // J(1,4)=5/10 = τ exactly
      (5L, (1 to 4).map(i => s"t$i").mkString(" ")),   // J(1,5)=4/10 < τ
      (6L, "zz yy xx")).toDF("id", "text")
    val out = Dedup.setSimJoin(docs, "id",
        graft.functions.TextFns.tokens(col("text")), tauX1000 = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(out((1L, 2L)) === 1000L)
    assert(out((1L, 3L)) === 900L)
    assert(out((1L, 4L)) === 500L, "pairs AT the threshold are included")
    assert(!out.contains((1L, 5L)), "pairs under the threshold are excluded")
    assert(!out.keySet.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("setSimJoin is partition-invariant and works over shingle sets") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "p q r s t u v w")).toDF("id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.setSimJoin(d, "id", graft.functions.TextFns.shingles(col("text"), 3),
          tauX1000 = 300)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSeq
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a === b)
    // docs 1,2 share 5 of their 6+6 3-shingles: J = 5/7 ≈ 714‰
    assert(a === Seq((1L, 2L, 714L)))
  }

  test("setSimJoinAgainst ≡ the exact bipartite cross-join answer") {
    val corpus = (1L to 20L).map(i =>
      (i, (0 to 9).map(j => s"w${(i * 3 + j * 5) % 13}").mkString(" ")))
      .toDF("id", "text")
    val ref = (1L to 20L by 4).map(i =>
      (i * 100, (0 to 9).map(j => s"w${(i * 3 + j * 5) % 13}").mkString(" ")))
      .toDF("rid", "rtext")
    val got = Dedup.setSimJoinAgainst(corpus, "id",
        graft.functions.TextFns.tokens(col("text")),
        ref, "rid", graft.functions.TextFns.tokens(col("rtext")),
        tauX1000 = 500)
      .orderBy("id", "ref_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    val cs = corpus.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet)
    val rs = ref.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSet)
    val want = (for {
      (a, sa) <- cs; (b, sb) <- rs
      inter = (sa & sb).size.toLong; union = (sa | sb).size.toLong
      if 1000 * inter >= 500 * union
    } yield (a, b, 1000 * inter / union)).sortBy(x => (x._1, x._2))
    assert(got.toSeq === want.toSeq)
    // every ref doc's corpus original is an exact J=1000 match
    assert(want.count(_._3 == 1000L) >= rs.length)
  }

  // ------------------------------------------------------------------ //
  // SetSimIndex: persisted exact-decontamination index               //
  // ------------------------------------------------------------------ //

  private def idxCorpus = (1L to 24L).map(i =>
      (i, (0 to 9).map(j => s"w${(i * 3 + j * 5) % 13}").mkString(" ")))
    .toDF("id", "text")
  private def idxRef = (1L to 24L by 5).map(i =>
      (i * 100, (0 to 9).map(j => s"w${(i * 3 + j * 5) % 13}").mkString(" ")))
    .toDF("rid", "rtext")

  private def probeRows(out: org.apache.spark.sql.DataFrame) =
    out.orderBy("id", "ref_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("setSimProbeIndex ≡ setSimJoinAgainst (eval-df order changes candidates, never matches)") {
    // includes probe docs with tokens the eval corpus never saw
    // (df 0, order first) and the valve disengaged: the verified
    // match set must equal the union-df batch join row-for-row
    val index = Dedup.setSimIndexBuild(idxRef, "rid",
      graft.functions.TextFns.tokens(col("rtext")), tauX1000 = 500)
    val probe = probeRows(Dedup.setSimProbeIndex(idxCorpus, "id",
      graft.functions.TextFns.tokens(col("text")), index))
    val batch = probeRows(Dedup.setSimJoinAgainst(idxCorpus, "id",
      graft.functions.TextFns.tokens(col("text")),
      idxRef, "rid", graft.functions.TextFns.tokens(col("rtext")),
      tauX1000 = 500))
    assert(probe === batch)
    assert(probe.nonEmpty, "test needs matches to certify")
    // threshold semantics survive the index path: J = τ included
    val idx2 = Dedup.setSimIndexBuild(
      Seq((9L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("rid", "rtext"),
      "rid", graft.functions.TextFns.tokens(col("rtext")), tauX1000 = 500)
    val edge = Dedup.setSimProbeIndex(
        Seq((1L, (1 to 5).map(i => s"t$i").mkString(" ")),   // J = 5/10 = τ
          (2L, (1 to 4).map(i => s"t$i").mkString(" "))).toDF("id", "text"),
        "id", graft.functions.TextFns.tokens(col("text")), idx2)
      .collect().map(r => (r.getLong(0), r.getLong(5))).toMap
    assert(edge === Map(1L -> 500L))
  }

  test("SetSimIndex parquet save/load round-trips the probe (shingle keys ride SortedIntersectCount)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssidx").toString
    val built = Dedup.setSimIndexBuild(idxRef, "rid",
      graft.functions.TextFns.shingles(col("rtext"), 3), tauX1000 = 600,
      itemKey = graft.functions.HashFns.hash61)
    built.save(dir)
    val loaded = Dedup.SetSimIndex.load(spark, dir)
    assert(loaded.tauX1000 === 600)
    def probe(ix: Dedup.SetSimIndex) =
      probeRows(Dedup.setSimProbeIndex(idxCorpus, "id",
        graft.functions.TextFns.shingles(col("text"), 3), ix,
        itemKey = graft.functions.HashFns.hash61))
    val a = probe(built)
    assert(a === probe(loaded))
    assert(a === probeRows(Dedup.setSimJoinAgainst(idxCorpus, "id",
      graft.functions.TextFns.shingles(col("text"), 3),
      idxRef, "rid", graft.functions.TextFns.shingles(col("rtext"), 3),
      tauX1000 = 600, itemKey = graft.functions.HashFns.hash61)))
    assert(a.nonEmpty)
  }

  test("decontamStream: per-trigger probes against the persisted index ≡ one batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ssidx-s").toString
    Dedup.setSimIndexBuild(idxRef, "rid",
        graft.functions.TextFns.tokens(col("rtext")), tauX1000 = 500)
      .save(dir)
    val index = Dedup.SetSimIndex.load(spark, dir)
    val stream = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
    val q = Dedup.decontamStream(stream.toDF().toDF("id", "text"), "id",
        graft.functions.TextFns.tokens(col("text")), index,
        java.nio.file.Files.createTempDirectory("graft-ssidx-ck").toString) {
      matches =>
        val rows = matches.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
        out.synchronized { out ++= rows }
    }
    val delivered = idxCorpus.collect().map(r => (r.getLong(0), r.getString(1)))
    stream.addData(delivered.take(12).toIndexedSeq: _*)
    q.processAllAvailable()
    stream.addData(delivered.drop(12).toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val batch = Dedup.setSimProbeIndex(delivered.toSeq.toDF("id", "text"),
        "id", graft.functions.TextFns.tokens(col("text")), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(out.sortBy(x => (x._1, x._2)).toSeq ===
      batch.sortBy(x => (x._1, x._2)).toSeq)
    assert(out.nonEmpty)
  }

  // ------------------------------------------------------------------ //
  // fuzzyValueMatches                                                  //
  // ------------------------------------------------------------------ //

  test("fuzzyValueMatches ≡ the exact cross-join answer on a typo'd value set") {
    val values = Seq("acme corp", "acme c0rp", "acme corps", "globex inc",
      "globex incx", "initech ltd", "unrelated name").map(Tuple1(_))
      .toDF("name")
    val got = Dedup.fuzzyValueMatches(values, "name", maxDist = 2,
        gramLen = 2, maxDf = 1000)
      .orderBy("name_a", "name_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // exact reference: all C(7,2) pairs, Levenshtein in [1,2]
    val names = values.collect().map(_.getString(0)).sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = for {
      i <- names.indices; j <- (i + 1) until names.length
      dd = lev(names(i), names(j)) if dd >= 1 && dd <= 2
    } yield (names(i), names(j), dd.toLong)
    assert(got.toSeq === want)
    assert(want.nonEmpty)
  }

  test("fuzzyValueMatches: short values with no shared gram still pair (advisor case)") {
    // 'abc' vs 'axc' share NO 2-gram (ab,bc vs ax,xc) yet are distance
    // 1 — the round-11 blocking lost them; the length-bucket fallback
    // must find them. 'a' vs 'ab' exercises the sub-gram-length edge.
    val values = Seq("abc", "axc", "a", "ab").map(Tuple1(_)).toDF("name")
    val got = Dedup.fuzzyValueMatches(values, "name", maxDist = 2, gramLen = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains(("abc", "axc", 1L)))
    assert(got.contains(("a", "ab", 1L)))
    assert(got.contains(("ab", "abc", 1L)))
  }

  test("fuzzyValueMatches: pairs whose shared grams are ALL common still pair (advisor case)") {
    // every shared gram occurrence ('aa'#1..#5) is carried by all 9
    // values — under the old per-gram df cap a small maxDf erased the
    // whole candidate set; the complete default must keep every
    // qualifying pair because prefixes need no df filter at all
    val values = (1 to 9).map(i => Tuple1(s"aaaaaa$i")).toDF("name")
    val got = Dedup.fuzzyValueMatches(values, "name", maxDist = 2, gramLen = 2)
    assert(got.count() === (9L * 8 / 2), "all C(9,2) pairs are distance 1")
  }

  test("fuzzyValueMatches: maxDf remains the explicit straggler valve") {
    // long values (above the short-fallback range) whose prefix tokens
    // are shared by all: capping below the token df drops the pairs —
    // the documented recall/straggler trade, now opt-in instead of on
    // by default
    val values = (1 to 9).map(i => Tuple1(s"aaaaaa$i")).toDF("name")
    val capped = Dedup.fuzzyValueMatches(values, "name", maxDist = 2,
      gramLen = 2, maxDf = 5)
    assert(capped.count() === 0)
  }

  test("fuzzy pairs chain into entity clusters over string ids (transitive)") {
    // acme -> acme1 -> acme12 chain: each adjacent pair is within
    // dist 2, the ends are dist 2 apart too; all must share a cluster
    val values = Seq("acme", "acme1", "acme12", "zzz unrelated")
      .map(Tuple1(_)).toDF("name")
    val pairs = Dedup.fuzzyValueMatches(values, "name", 2, 2, 1000)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val clusters = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(clusters.keySet === Set("acme", "acme1", "acme12"))
    assert(clusters.values.toSet === Set("acme"),
      s"all chain members must share the min-name canon: $clusters")
  }

  test("fuzzyValueMatches normalizes case/whitespace and is partition-invariant") {
    val values = Seq("  Acme Corp ", "acme corp", "ACME CORPS").map(Tuple1(_))
      .toDF("name")
    val out = Dedup.fuzzyValueMatches(values, "name", 2, 2, 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "  Acme Corp " and "acme corp" normalize to the SAME value (dist 0,
    // excluded); only the corps variant pairs
    assert(out.toSeq === Seq(("acme corp", "acme corps", 1L)))
    val rep = Dedup.fuzzyValueMatches(values.repartition(5), "name", 2, 2, 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rep.toSeq === out.toSeq)
  }
}
