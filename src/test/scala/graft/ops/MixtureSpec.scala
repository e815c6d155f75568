package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.range(20000).select(
    col("id"), (lit(1L) + col("id") % 100).as("wt"))

  test("priority sample: Σ w_hat tracks Σ w within sampling error") {
    val out = Mixture.prioritySample(corpus, "id", col("wt"), 500)
    val est = out.agg(sum("w_hat")).as[Long].collect().head
    val tot = corpus.agg(sum("wt")).as[Long].collect().head
    // k=500 ⇒ relative se ~ 1/√k ≈ 4.5%; the hash is fixed, so this
    // is a deterministic pin, not a flaky draw
    assert(math.abs(est - tot).toDouble / tot < 0.15, s"est $est vs exact $tot")
    assert(out.count() === 500)
  }

  test("priority sample: census when input ≤ k (τ NULL ⇒ w_hat = w)") {
    val df = spark.range(100).select(col("id"), lit(7L).as("wt"))
    val out = Mixture.prioritySample(df, "id", col("wt"), 500).collect()
    assert(out.length === 100)
    out.foreach(r => assert(r.getAs[Long]("w_hat") === 7L))
  }

  test("priority sample is partition-invariant") {
    val a = Mixture.prioritySample(corpus, "id", col("wt"), 300)
      .collect().map(_.toString).sorted.toSeq
    val b = Mixture.prioritySample(corpus.repartition(13), "id", col("wt"), 300)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("priority sample: a dominant weight is always kept, estimated exactly") {
    val df = spark.range(20000).select(col("id"),
      when(col("id") === 123, lit(10000000L)).otherwise(lit(1L)).as("wt"))
    val kept = Mixture.prioritySample(df, "id", col("wt"), 200)
    val hit = kept.where(col("id") === 123)
      .select("w", "w_hat").as[(Long, Long)].collect()
    // heavy row: t ≈ h/w is ~5 orders below the light-row τ, so it
    // enters with (effective) certainty and w ≥ τ ⇒ w_hat = w exactly
    assert(hit.toSeq === Seq((10000000L, 10000000L)))
  }

  test("keyed priority sample: each group ≡ the unkeyed sample on its slice") {
    val df = corpus.withColumn("g", (col("id") % 3).cast("string"))
    val keyed = Mixture.prioritySampleBy(df, Seq("g"), "id", col("wt"), 150)
    Seq("0", "1", "2").foreach { g =>
      val slice = Mixture.prioritySample(df.where(col("g") === g), "id",
          col("wt"), 150)
        .select("id", "w", "t", "w_hat").collect().toSet
      val grp = keyed.where(col("g") === g)
        .select("id", "w", "t", "w_hat").collect().toSet
      assert(grp === slice, s"group $g")
    }
  }

  test("keyed priority sample: census groups (≤ k rows) keep w_hat = w") {
    val df = corpus.withColumn("g", (col("id") % 3).cast("string"))
    val out = Mixture.prioritySampleBy(df, Seq("g"), "id", col("wt"), 7000)
    assert(out.count() === 20000)
    assert(out.where(col("w_hat") =!= col("w")).count() === 0)
  }

  // ------------------------------------------------------------------ //
  // temperature sampling                                               //
  // ------------------------------------------------------------------ //

  test("exp2E8 inverts mitchellE8 within the linear-interpolation band") {
    import graft.ops.TextStats
    // both maps are monotone piecewise-linear; composing them must land
    // within one interpolation step of the identity for q in [2^20, 2^40]
    val qs = Seq(1L << 20, (1L << 20) + 12345, 1L << 25, (1L << 30) + 999983,
      1L << 40, (3L << 33) + 7)
    val df = qs.toDF("q")
    val out = df.selectExpr(
      "q", TextStats.exp2E8Sql(TextStats.mitchellE8Sql("q")) + " AS back")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (q, back) =>
      val rel = math.abs(back - q).toDouble / q
      assert(rel < 0.09, s"roundtrip q=$q back=$back rel=$rel")
    }
  }

  test("exp2E8 is monotone through its saturation point") {
    import graft.ops.TextStats
    // the round-11 shape capped e but let f = m % 8 keep cycling, so
    // m=479 → 15·2^56 but m=480 → 8·2^56 — a silent order inversion
    // right at the cap; m must clamp BEFORE the e/f split
    val ms = (470L to 490L) ++ Seq(1000L, 100000L)
    val out = ms.toDF("m")
      .selectExpr("m", TextStats.exp2E8Sql("m") + " AS v")
      .orderBy("m").collect().map(r => (r.getLong(0), r.getLong(1)))
    out.sliding(2).foreach { case Array((m1, v1), (m2, v2)) =>
      assert(v2 >= v1, s"non-monotone: exp2($m1)=$v1 > exp2($m2)=$v2")
    }
    assert(out.filter(_._1 >= 479).forall(_._2 === 15L * (1L << 56)),
      "saturation must pin to the maximum value")
  }

  test("temperatureRates: alpha=1 keeps everything; alpha=0 equalizes tokens") {
    // source A has 64x the tokens of B
    val df = ((1L to 640L).map(i => (i, "A", 10L)) ++
      (1000L to 1009L).map(i => (i, "B", 10L))).toDF("id", "src", "t")
    val r1 = Mixture.temperatureRates(df, "src", col("t"), 1, 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r1("A") === 1000L && r1("B") === 1000L, s"alpha=1 must not resample: $r1")
    val r0 = Mixture.temperatureRates(df, "src", col("t"), 0, 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r0("B") === 1000L, "smallest source keeps everything")
    // equal-token target: A's rate ≈ 1000/64 ≈ 15‰ (Mitchell-approx)
    assert(r0("A") < 25 && r0("A") > 8, s"alpha=0 should equalize: $r0")
    // and the default alpha=0.7 sits strictly between
    val r7 = Mixture.temperatureRates(df, "src", col("t"), 7, 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(r7("A") > r0("A") && r7("A") < 1000L, s"alpha=0.7 between: $r7")
  }

  test("temperatureSample is deterministic and keeps the planted rates") {
    val df = ((1L to 2000L).map(i => (i, "big", 5L)) ++
      (10000L to 10099L).map(i => (i, "small", 5L))).toDF("id", "src", "t")
    val a = Mixture.temperatureSample(df, "id", "src", col("t"), 1, 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Mixture.temperatureSample(df.repartition(13), "id", "src", col("t"), 1, 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    // small source survives whole; big source is thinned near its rate
    assert(a.count(_ >= 10000L) === 100)
    val keptBig = a.count(_ < 10000L)
    val rate = Mixture.temperatureRates(df, "src", col("t"), 1, 2)
      .where(col("src") === "big").collect().head.getLong(3)
    assert(math.abs(keptBig - 2000.0 * rate / 1000) < 120,
      s"kept $keptBig of 2000 at rate $rate‰")
  }

  // ------------------------------------------------------------------ //
  // budgetSelect                                                       //
  // ------------------------------------------------------------------ //

  private def scoredDocs(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "score", "toks")
  }

  test("budgetSelect takes whole buckets best-first until the budget") {
    // buckets: score 9 → 40 toks, score 8 → 35, score 7 → 50
    val df = scoredDocs((1L, 9L, 20L), (2L, 9L, 20L), (3L, 8L, 35L),
      (4L, 7L, 50L), (5L, 6L, 10L))
    val out = Mixture.budgetSelect(df, "id", "score", "toks", budget = 80L)
      .orderBy("id").collect()
    // 40 + 35 = 75 ≤ 80; adding score-7's 50 would blow it
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(out.head.getLong(3) === 8L)   // cut_score
    assert(out.head.getLong(4) === 75L)  // tokens_used
  }

  test("budgetSelect keeps or cuts score ties together") {
    val df = scoredDocs((1L, 5L, 30L), (2L, 5L, 30L), (3L, 4L, 10L))
    // the score-5 bucket is 60 > 50: neither tied doc fits ⇒ nothing
    // above the next bucket either (cumulative is monotone)
    val out = Mixture.budgetSelect(df, "id", "score", "toks", budget = 50L)
    assert(out.count() === 0)
    // at 60 the whole tied bucket fits
    val out2 = Mixture.budgetSelect(df, "id", "score", "toks", budget = 60L)
      .orderBy("id").collect()
    assert(out2.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out2.head.getLong(4) === 60L)
  }

  test("budgetSelect: budget larger than the corpus selects everything") {
    val df = scoredDocs((1L, 3L, 10L), (2L, 1L, 10L), (3L, 2L, 10L))
    val out = Mixture.budgetSelect(df, "id", "score", "toks", budget = 1000L)
      .orderBy("id").collect()
    assert(out.length === 3)
    assert(out.head.getLong(3) === 1L)
    assert(out.head.getLong(4) === 30L)
  }

  test("budgetSelectBy: each group ≡ the unkeyed select on its slice") {
    val df = ((1L to 40L).map(i => (i, "g" + (i % 2), i % 5, 10L)))
      .toDF("id", "g", "score", "toks")
    val keyed = Mixture.budgetSelectBy(df, "g", "id", "score", "toks", 90L)
    Seq("g0", "g1").foreach { g =>
      val slice = Mixture.budgetSelect(df.where(col("g") === g),
          "id", "score", "toks", 90L)
        .select("id", "score", "toks", "cut_score", "tokens_used")
        .collect().map(_.toString).sorted.toSeq
      val grp = keyed.where(col("g") === g)
        .select("id", "score", "toks", "cut_score", "tokens_used")
        .collect().map(_.toString).sorted.toSeq
      assert(grp === slice, s"group $g")
    }
  }

  test("budgetSelectBy: a group whose best bucket exceeds the budget selects nothing") {
    val df = Seq((1L, "a", 5L, 100L), (2L, "b", 5L, 10L))
      .toDF("id", "g", "score", "toks")
    val out = Mixture.budgetSelectBy(df, "g", "id", "score", "toks", 50L)
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(2L))
  }

  test("budgetSelect is partition-invariant") {
    val df = scoredDocs((1L to 100L).map(i => (i, i % 7, 5L)): _*)
    val a = Mixture.budgetSelect(df, "id", "score", "toks", 200L)
      .orderBy("id").collect()
    val b = Mixture.budgetSelect(df.repartition(11), "id", "score", "toks", 200L)
      .orderBy("id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("stratifiedSample: proportional exact allocation, every stratum represented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // strata sizes 6 / 3 / 1, totalK 5, N 10:
    // k_A = ⌊30/10⌋ = 3, k_B = ⌊15/10⌋ = 1, k_C = max(1, ⌊5/10⌋) = 1
    val df = ((1L to 6L).map(i => (i, "A")) ++ (11L to 13L).map(i => (i, "B"))
      ++ Seq((21L, "C"))).toDF("doc_id", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      Mixture.stratifiedSample(d, "lang", "doc_id", 5)
        .orderBy("lang", "sample_rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    val out = run(df)
    val perStratum = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perStratum === Map("A" -> 3, "B" -> 1, "C" -> 1))
    assert(out.length === 5)
    // ranks contiguous from 1, counts/allocations carried correctly
    assert(out.filter(_._1 == "A").map(_._3).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall { case (l, _, rk, n_s, k_s) =>
      rk <= k_s && (l match {
        case "A" => n_s == 6 && k_s == 3
        case "B" => n_s == 3 && k_s == 1
        case _ => n_s == 1 && k_s == 1
      })
    })
    // membership is the per-stratum hash-DESC cut — re-derived
    // independently via the column expression
    val expectA = df.where(col("lang") === "A")
      .select(col("doc_id"),
        graft.functions.HashFns.hash61(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h").desc, col("doc_id")).limit(3)
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(_._1 == "A").map(_._2).toSet === expectA)
    assert(out.toSeq === run(df.repartition(7)).toSeq)
  }

  test("negativeSample: never a positive, always a real item, deterministic") {
    import spark.implicits._
    val items = (1L to 10L).toDF("item_id")
    // user 1 owns everything but 7; user 2 owns only 1
    val inter = ((1L to 10L).filter(_ != 7).map(i => (1L, i)) ++
      Seq((2L, 1L))).toDF("u", "item")
    val run = (df: org.apache.spark.sql.DataFrame) =>
      Mixture.negativeSample(df, "u", "item", items, "item_id",
        k = 3, oversample = 3)
        .orderBy("u", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val out = run(inter)
    val pos = inter.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (u, _, item) =>
      assert(!pos.contains((u, item)), s"sampled a positive: $u -> $item")
      assert(item >= 1L && item <= 10L)
    }
    // user 1 can only ever draw item 7 (deduped to one row)
    val u1 = out.filter(_._1 == 1L)
    assert(u1.forall(_._3 == 7L) && u1.size <= 1)
    // user 2 has 9 candidates; 9 slots should find 3 distinct negatives
    val u2 = out.filter(_._1 == 2L)
    assert(u2.map(_._2) === u2.indices.map(i => (i + 1).toLong))
    assert(u2.map(_._3).distinct.size === u2.size && u2.size === 3)
    assert(out === run(inter.repartition(5)))
  }

  test("maxCoverageSelect: greedy argmax, disjoint gains, early stop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // 4 tokens
      (2L, "a b e"),   // 1 new after d1+d3
      (3L, "e f g"),   // ties d4 at 3 → min id wins round 2
      (4L, "x y z"))
      .toDF("doc_id", "text")
    val out = Mixture.maxCoverageSelect(docs, "doc_id", "text",
        k = 4, shingleWidth = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // round 4: only doc 2's "e" remains but it is covered by doc 3 →
    // no candidates, the round is skipped (3 rows, not 4)
    assert(out.toSeq === Seq(
      (1L, 1L, 4L, 4L), (2L, 3L, 3L, 7L), (3L, 4L, 3L, 10L)))
  }

  test("neymanSample: variance-weighted allocation, floor k, exact w") {
    import spark.implicits._
    // A: {0, 10} -> var_n = 2*100 - 100 = 100 -> w = 10
    // B: {5, 5, 5} -> var_n = 0 -> w = 0 -> still gets the min 1 row
    val df = Seq(
      ("A", 1L, 0L), ("A", 2L, 10L),
      ("B", 3L, 5L), ("B", 4L, 5L), ("B", 5L, 5L))
      .toDF("s", "id", "v")
    val out = Mixture.neymanSample(df, "s", "id", "v", totalK = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("w_s"),
        r.getAs[Long]("k_s")))
    val byS = out.groupBy(_._1)
    assert(byS("A").forall(t => t._3 === 10L && t._4 === 4L))
    assert(byS("A").size === 2) // allocation 4 capped by stratum size
    assert(byS("B").forall(t => t._3 === 0L && t._4 === 1L))
    assert(byS("B").size === 1) // zero-variance stratum: exactly 1
  }

  test("targetEncodeLoo: hand case, own-label exclusion") {
    import spark.implicits._
    // A: {100, 200}, B: {300}; mu = 600/3 = 200, m = 20
    val df = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "B", 300L))
      .toDF("id", "cat", "y")
    val enc = Mixture.targetEncodeLoo(df, "id", "cat", "y")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("enc")).toMap
    assert(enc(1L) === (300L - 100L + 20L * 200L) / 21L) // 200
    assert(enc(2L) === (300L - 200L + 20L * 200L) / 21L) // 195
    assert(enc(3L) === (20L * 200L) / 20L)               // pure prior
    // leakage check: two rows in one cat with different targets get
    // DIFFERENT encodings (each sees only the other's label)
    assert(enc(1L) !== enc(2L))
  }

  test("doremiStep: symmetric corpus keeps weights; hard source gains at eta=1") {
    import spark.implicits._
    // identical text per source -> every excess is 0, exp2 factors
    // equal, so the normalized weights reproduce the token shares
    val sym = Seq(
      ("a", 1L, "the cat sat on the mat"),
      ("b", 2L, "the cat sat on the mat"))
      .toDF("src", "doc_id", "text")
    val symOut = Mixture.doremiStep(sym, "doc_id", "src", "text").collect()
      .map(r => r.getAs[String]("src") -> r).toMap
    assert(symOut("a").getAs[Long]("excess_e8") === 0L)
    assert(symOut("b").getAs[Long]("excess_e8") === 0L)
    assert(symOut("a").getAs[Long]("new_ppm") ===
      symOut("a").getAs[Long]("base_ppm"))
    // easy source = one repeated bigram; hard source = all-distinct
    // bigrams -> positive excess -> upweighted relative to its share
    val mix = Seq(
      ("easy", 1L, "a b a b a b a b a b a b a b a b"),
      ("easy", 2L, "a b a b a b a b a b a b a b a b"),
      ("hard", 3L, "q w e r t y u i o p z x c v n m"))
      .toDF("src", "doc_id", "text")
    val out = Mixture.doremiStep(mix, "doc_id", "src", "text").collect()
      .map(r => r.getAs[String]("src") -> r).toMap
    assert(out("hard").getAs[Long]("excess_e8") > 0L)
    assert(out("easy").getAs[Long]("excess_e8") < 0L)
    assert(out("hard").getAs[Long]("new_ppm") >
      out("hard").getAs[Long]("base_ppm"))
    assert(out("easy").getAs[Long]("new_ppm") <
      out("easy").getAs[Long]("base_ppm"))
    // weights stay a distribution (integer floors may shave ppms)
    val tot = out.values.map(_.getAs[Long]("new_ppm")).sum
    assert(tot > 999990L && tot <= 1000000L)
  }

  test("doremiFromSums: folded per-batch sums == batch, bit-identical") {
    import spark.implicits._
    val df = Seq(
      ("easy", 1L, "a b a b a b a b a b a b a b a b"),
      ("easy", 2L, "a b a b a b a b a b a b a b a b"),
      ("hard", 3L, "q w e r t y u i o p z x c v n m"))
      .toDF("src", "doc_id", "text")
    val expected = Mixture.doremiStep(df, "doc_id", "src", "text")
      .orderBy("src").collect().toSeq
    // a foreachBatch monitor scores micro-batches under the FIXED
    // corpus model and folds the additive (nb, se8) sums per source
    val model = TextStats.lmTrain(df, "doc_id", "text")
    val sums = Seq(Seq(1L), Seq(2L, 3L)).flatMap { ids =>
      TextStats.lmScore(df.where(col("doc_id").isin(ids: _*)),
          "doc_id", "text", model, carry = Seq("src"))
        .groupBy("src")
        .agg(org.apache.spark.sql.functions.sum("n_bigrams").as("nb"),
          org.apache.spark.sql.functions.sum("surprisal_e8").as("se8"))
        .as[(String, Long, Long)].collect().toSeq
    }.groupBy(_._1).map { case (s, xs) =>
      (s, xs.map(_._2).sum, xs.map(_._3).sum) }.toSeq
    val streamed = Mixture.doremiFromSums(spark, sums)
      .orderBy("src").collect().toSeq
    assert(streamed === expected)
  }

  test("rake: hand-computed 2x2 IPF weights after two sweeps") {
    import spark.implicits._
    // counts: (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=1; N=6, targets 3e6 per
    // row/col. Hand IPF (every divide truncating):
    // sweep1 row: wa=750000, wb=1500000; col: ax=600000, bx=1200000,
    //   ay=1000000, by=2000000
    // sweep2 row: ax=642857, ay=1071428, bx=1125000, by=1875000;
    //   col: ax=631578, bx=1105263, ay=1090908, by=1909091
    //   (independently replicated in integer arithmetic)
    val rows = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq(("b", "x")) ++ Seq(("b", "y"))
    val out = Mixture.rake(rows.toDF("r", "c"), "r", "c", iters = 2)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(out(("a", "x")) === ((3L, 631578L, 1L)))
    assert(out(("a", "y")) === ((1L, 1090908L, 1L)))
    assert(out(("b", "x")) === ((1L, 1105263L, 1L)))
    assert(out(("b", "y")) === ((1L, 1909091L, 1L)))
    // both margins converge toward 3e6 weighted share: row sums of
    // n*w within 5% of target after two sweeps
    val rowSum = Seq(3L * 631578 + 1L * 1090908,
      1L * 1105263 + 1L * 1909091)
    rowSum.foreach(s0 => assert(math.abs(s0 - 3000000L) < 150000L, s0))
  }

  test("rakedSample: epochs + fractional gate agree with a driver-side" +
    " replay of the same hash rule") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
    val df = rows.toDF("id", "r", "c")
    val w = Mixture.rake(df, "r", "c", iters = 2)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(3))
      .toMap
    val out = Mixture.rakedSample(df, "r", "c", "id", iters = 2)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getLong(6))).toMap
    // driver-side replay: same hash61 gate over the same ids
    val gate = df.select(col("id"), col("r"), col("c"),
        graft.functions.HashFns.hash61(
          concat(lit("rake:"), col("id").cast("string"))).as("h"))
      .collect().map(x => (x.getString(1), x.getString(2),
        x.getLong(3) % 1000000L))
    out.foreach { case ((r, c), (n, wp, epochs, sampled, kept)) =>
      assert(wp === w((r, c)))
      assert(epochs === wp / 1000000L)
      val expSampled = gate.count(g => g._1 == r && g._2 == c &&
        g._3 < wp % 1000000L)
      assert(sampled === expSampled.toLong, s"cell ($r,$c)")
      assert(kept === n * epochs + sampled)
    }
    // the plan covers every cell of the grid
    assert(out.keySet === rows.map(t => (t._2, t._3)).toSet)
  }

  test("rakeFromCounts ≡ rake over the same rows (additive cells" +
    " across micro-batches)") {
    import spark.implicits._
    val rows = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y"))
    val df = rows.toDF("id", "r", "c")
    val batch = Mixture.rake(df, "r", "c", iters = 2)
      .orderBy("r", "c").collect().toSeq
    // two batches contribute overlapping cells — the fold must add
    val (b1, b2) = rows.splitAt(11)
    val folded = Seq(b1, b2).flatMap(_.groupBy(t => (t._2, t._3))
      .map { case ((r, c), xs) => (r, c, xs.size.toLong) })
    val streamed = Mixture.rakeFromCounts(spark, folded, "r", "c",
        iters = 2)
      .orderBy("r", "c").collect().toSeq
    assert(streamed === batch)
  }
}
