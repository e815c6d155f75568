package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within 5% at 100k distinct values") {
    val df = spark.range(100000).select(lit("k").as("k"),
      col("id").cast("string").as("v"))
    val est = Sketch.hllDistinct(df, Seq("k"), col("v"))
      .select(Sketch.hllEstimate(col("hll_est_x10")).as("est"))
      .as[Double].collect().head
    assert(math.abs(est - 100000) / 100000 < 0.05, s"estimate $est")
  }

  test("estimate column is BIGINT (no float in the oracle surface)") {
    val df = spark.range(10).select(lit("k").as("k"),
      col("id").cast("string").as("v"))
    val out = Sketch.hllDistinct(df, Seq("k"), col("v"))
    assert(out.schema("hll_est_x10").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(out.schema("hll_reg_sum").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("sketch is exact-deterministic: identical on any partitioning") {
    val df = spark.range(50000).select(lit("k").as("k"),
      col("id").cast("string").as("v"))
    val a = Sketch.hllDistinct(df, Seq("k"), col("v"))
      .select("hll_reg_sum", "hll_est_x10").collect().head
    val b = Sketch.hllDistinct(df.repartition(17), Seq("k"), col("v"))
      .select("hll_reg_sum", "hll_est_x10").collect().head
    assert(a === b)
  }

  test("register form: merge(regs(A), regs(B)) == regs(A ∪ B), and reg-sum matches hllDistinct") {
    def docs(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit("k").as("k"), col("id").cast("string").as("v"))
    val a = docs(0, 20000); val b = docs(20000, 40000)
    val merged = Sketch.hllMergeRegisters(
      Sketch.hllRegisters(a, Seq("k"), col("v"))
        .union(Sketch.hllRegisters(b, Seq("k"), col("v"))), Seq("k"))
      .select("hll_regs").as[Seq[Byte]].collect().head
    val whole = Sketch.hllRegisters(a.union(b), Seq("k"), col("v"))
      .select("hll_regs").as[Seq[Byte]].collect().head
    assert(merged === whole, "element-wise max must equal the union sketch")
    assert(whole.length === 1024)
    // the collapsed register sum is the exact hll_reg_sum fingerprint
    val viaRegs = Sketch.hllRegisters(a.union(b), Seq("k"), col("v"))
      .select(Sketch.hllRegSum(col("hll_regs")).as("s")).as[Long].collect().head
    val viaScalar = Sketch.hllDistinct(a.union(b), Seq("k"), col("v"))
      .select("hll_reg_sum").as[Long].collect().head
    assert(viaRegs === viaScalar)
  }

  test("register merge is idempotent: merging a sketch with itself is a no-op") {
    val df = spark.range(5000).select(lit("k").as("k"),
      col("id").cast("string").as("v"))
    val regs = Sketch.hllRegisters(df, Seq("k"), col("v"))
    val twice = Sketch.hllMergeRegisters(regs.union(regs), Seq("k"))
      .select("hll_regs").as[Seq[Byte]].collect().head
    val once = regs.select("hll_regs").as[Seq[Byte]].collect().head
    assert(twice === once)
  }

  test("bloom filter: no false negatives, and merge(A, B) == build(A ∪ B)") {
    import graft.functions.HashFns
    def items(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(HashFns.hash61(col("id").cast("string")).as("x"))
    val a = items(0, 3000); val b = items(3000, 6000)
    val whole = Sketch.bloomWords(a.union(b), col("x"), 1 << 16, 4)
      .as[(Int, Long)].collect().toMap
    val merged = Sketch.bloomMerge(Seq(
      Sketch.bloomWords(a, col("x"), 1 << 16, 4),
      Sketch.bloomWords(b, col("x"), 1 << 16, 4)))
      .as[(Int, Long)].collect().toMap
    assert(merged === whole)
    // no false negatives: every inserted element probes positive
    // (probe cells come from the SAME bloomCells definition the build
    // side uses)
    val probes = Sketch.bloomCells(items(0, 6000), Seq(col("x")), col("x"),
        1 << 16, 4)
      .as[(Long, Int, Long)].collect()
    val misses = probes.filter { case (_, widx, mask) =>
      (whole.getOrElse(widx, 0L) & mask) != mask
    }
    assert(misses.isEmpty, s"${misses.length} false negatives")
  }

  test("dense probe (bloomMaybe) ≡ exploded-cells probe; no false negatives") {
    import graft.functions.HashFns
    def items(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(HashFns.hash61(col("id").cast("string")).as("x"))
    val inserted = items(0, 2000); val all = items(0, 4000)
    val words = Sketch.bloomWords(inserted, col("x"), 1 << 16, 4)
    val viaDense = all
      .crossJoin(broadcast(Sketch.bloomDense(words, 1 << 16)))
      .select(col("x"),
        Sketch.bloomMaybe(col("x"), col("bloom_words"), 1 << 16, 4).as("m"))
      .as[(Long, Boolean)].collect().toMap
    // reference probe: the exploded (widx, mask) cells against the
    // sparse word table — the two position families must be identical
    val wmap = words.as[(Int, Long)].collect().toMap
    val viaCells = Sketch.bloomCells(all, Seq(col("x")), col("x"), 1 << 16, 4)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (x, cs) =>
        x -> cs.forall { case (_, w, m) => (wmap.getOrElse(w, 0L) & m) == m }
      }
    assert(viaDense === viaCells)
    inserted.as[Long].collect()
      .foreach(x => assert(viaDense(x), s"false negative for $x"))
  }

  test("count-min: estimates never undercount; merge(A, B) == build(A ++ B)") {
    import graft.functions.HashFns
    // skewed stream: value v appears v+1 times, v in 0..99
    val items = spark.range(100)
      .select(explode(sequence(lit(0), col("id"))).as("rep"), col("id"))
      .select(HashFns.hash61(col("id").cast("string")).as("x"), col("id"))
    val counts = Sketch.cmsCounts(items, col("x"), w = 256, d = 4)
      .as[(Int, Int, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    val exact = (0L until 100L).map(v => v -> (v + 1)).toMap
    // probe every value: min over the 4 cells >= true count
    import graft.functions.{HashFns => HF}
    val est = items.select(col("id"), col("x")).distinct()
      .select(col("id") +: (0 until 4).map(j =>
        (HF.hashAt(col("x"), j) % 256).cast("int").as(s"p$j")): _*)
      .as[(Long, Int, Int, Int, Int)].collect()
    est.foreach { case (v, p0, p1, p2, p3) =>
      val e = Seq((0, p0), (1, p1), (2, p2), (3, p3)).map(counts).min
      assert(e >= exact(v), s"undercount for $v: $e < ${exact(v)}")
    }
    // merge = build on concatenation
    val a = items.where(col("id") < 50); val b = items.where(col("id") >= 50)
    val merged = Sketch.cmsMerge(Seq(
      Sketch.cmsCounts(a, col("x"), 256, 4),
      Sketch.cmsCounts(b, col("x"), 256, 4)))
      .as[(Int, Int, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    assert(merged === counts)
  }

  test("duplicates do not move the sketch; disjoint halves merge to the whole") {
    val half1 = spark.range(30000)
    val half2 = spark.range(30000, 60000)
    def sk(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllDistinct(df, Seq("k"), col("v"))
        .select("hll_reg_sum").as[Long].collect().head
    val whole = sk(half1.union(half2)
      .select(lit("k").as("k"), col("id").cast("string").as("v")))
    val withDups = sk(half1.union(half2).union(half1)
      .select(lit("k").as("k"), col("id").cast("string").as("v")))
    assert(whole === withDups, "re-observed values must not change registers")
  }

  // ---------------------------------------------------------------- //
  // KMV                                                              //
  // ---------------------------------------------------------------- //

  private def kvals(n: Long) = spark.range(n)
    .select(lit("k").as("k"), col("id").cast("string").as("v"))

  test("KMV estimate lands within 20% at 100k distinct (k=256, se≈6%)") {
    val est = Sketch.kmvStats(Sketch.kmvSketch(kvals(100000), Seq("k"), col("v"), 256), 256)
      .select("kmv_est_x10").as[Long].collect().head / 10.0
    assert(math.abs(est - 100000) / 100000 < 0.20, s"estimate $est")
  }

  test("KMV below k is the exact distinct count, and all columns are BIGINT") {
    val out = Sketch.kmvStats(Sketch.kmvSketch(kvals(100), Seq("k"), col("v"), 256), 256)
    val row = out.select("kmv_n", "kmv_kth", "kmv_est_x10")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 === 100L)
    assert(row._3 === 1000L, "not-full sketch must read back exact count ×10")
    Seq("kmv_n", "kmv_kth", "kmv_est_x10").foreach(c =>
      assert(out.schema(c).dataType === org.apache.spark.sql.types.LongType))
  }

  test("KMV merge of disjoint halves equals the whole-corpus sketch; dups are no-ops") {
    def sketch(df: org.apache.spark.sql.DataFrame) =
      Sketch.kmvSketch(df, Seq("k"), col("v"), 64)
    val a = kvals(20000).where(col("v").cast("long") < 10000)
    val b = kvals(20000).where(col("v").cast("long") >= 10000)
    val merged = Sketch.kmvMerge(sketch(a).unionByName(sketch(b)), Seq("k"), 64)
      .select("kmv").as[Seq[Long]].collect().head
    val whole = sketch(kvals(20000)).select("kmv").as[Seq[Long]].collect().head
    assert(merged === whole, "bottom-k of union must equal union of bottom-k's")
    assert(whole.length === 64)
    assert(whole === whole.sorted, "sketch values are ascending")
    // overlapping (duplicate) inputs change nothing: distinct semantics
    val withDups = Sketch.kmvMerge(
      sketch(kvals(20000)).unionByName(sketch(a)), Seq("k"), 64)
      .select("kmv").as[Seq[Long]].collect().head
    assert(withDups === whole)
  }

  test("KMV is partition-invariant") {
    val a = Sketch.kmvSketch(kvals(5000), Seq("k"), col("v"), 32)
      .select("kmv").as[Seq[Long]].collect().head
    val b = Sketch.kmvSketch(kvals(5000).repartition(17), Seq("k"), col("v"), 32)
      .select("kmv").as[Seq[Long]].collect().head
    assert(a === b)
  }

  // ---------------------------------------------------------------- //
  // Mergeable histogram                                              //
  // ---------------------------------------------------------------- //

  test("histogram merge equals single-pass; quantile readback matches exact ranks") {
    // values 0..999 once each: bin width 100 -> 10 bins of 100
    val vals = spark.range(1000).select(col("id").as("v"))
    val whole = Sketch.histogram(vals, col("v"), 100L)
      .as[(Long, Long)].collect().toMap
    assert(whole === (0L until 10L).map(_ -> 100L).toMap)
    val merged = Sketch.histMerge(Seq(
      Sketch.histogram(vals.where(col("v") % 3 === 0), col("v"), 100L),
      Sketch.histogram(vals.where(col("v") % 3 === 1), col("v"), 100L),
      Sketch.histogram(vals.where(col("v") % 3 === 2), col("v"), 100L)))
      .as[(Long, Long)].collect().toMap
    assert(merged === whole, "cell-wise sum must equal the union histogram")
    // p50 of 1000 uniform values: rank 500 -> bin 4 (cum hits 500 there);
    // p90 -> rank 900 -> bin 8; p99 -> rank 990 -> bin 9
    val q = Sketch.histQuantiles(
      Sketch.histogram(vals, col("v"), 100L), 100L, Seq(50, 90, 99))
      .select("pct", "target_rank", "bin", "bin_lo")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(q === Array((50L, 500L, 4L, 400L), (90L, 900L, 8L, 800L),
      (99L, 990L, 9L, 900L)))
  }

  test("histogram quantiles: ceil rank semantics on odd counts") {
    // 7 values in bins 0,0,0,1,1,2,5 — p50 rank ceil(3.5)=4 -> bin 1
    val vals = Seq(0L, 1L, 2L, 10L, 11L, 20L, 50L).toDF("v")
    val q = Sketch.histQuantiles(
      Sketch.histogram(vals, col("v"), 10L), 10L, Seq(50, 100))
      .select("pct", "target_rank", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(q === Array((50L, 4L, 1L), (100L, 7L, 5L)))
  }

  test("keyed CMS: each key's table equals the unkeyed build on that key's slice") {
    import graft.functions.HashFns
    val items = spark.range(3000).select(
      (col("id") % 2).cast("string").as("g"),
      HashFns.hash61((col("id") % 100).cast("string")).as("x"))
    val keyed = Sketch.cmsCountsBy(items, Seq("g"), col("x"), 64, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val perSlice = (0 until 2).flatMap { g =>
      Sketch.cmsCounts(items.where(col("g") === g.toString), col("x"), 64, 4)
        .collect().map(r => (g.toString, r.getInt(0), r.getInt(1), r.getLong(2)))
    }.toSet
    assert(keyed === perSlice)
  }

  test("keyed bloom: each key's filter equals the unkeyed build on that key's slice") {
    import graft.functions.HashFns
    val items = spark.range(4000).select(
      (col("id") % 3).cast("string").as("g"),
      HashFns.hash61(col("id").cast("string")).as("x"))
    val keyed = Sketch.bloomWordsBy(items, Seq("g"), col("x"), 1 << 12, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val perSlice = (0 until 3).flatMap { g =>
      Sketch.bloomWords(items.where(col("g") === g.toString), col("x"), 1 << 12, 4)
        .collect().map(r => (g.toString, r.getInt(0), r.getLong(1)))
    }.toSet
    assert(keyed === perSlice)
    // filters genuinely differ between keys (disjoint element sets)
    assert(keyed.groupBy(_._1).values.map(_.map(t => (t._2, t._3))).toSet.size === 3)
  }

  test("KMV Jaccard: exact when the union fits in k; near-truth when sketched") {
    // A = {0..999}, B = {500..1499}: J = 500/1500 = 1/3
    def set(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit("k").as("k"), col("id").cast("string").as("v"))
    def pair(k: Int) = Sketch.kmvSketch(set(0, 1000), Seq("k"), col("v"), k)
      .select(col("kmv").as("kmv_a"))
      .crossJoin(Sketch.kmvSketch(set(500, 1500), Seq("k"), col("v"), k)
        .select(col("kmv").as("kmv_b")))
    // k=4096 holds the whole 1500-element union: the estimator is EXACT
    val u = Sketch.kmvUnionK(col("kmv_a"), col("kmv_b"), 4096)
    val exact = pair(4096)
      .select(Sketch.kmvMatchCount(u, col("kmv_a"), col("kmv_b")).as("m"),
        size(u).cast("bigint").as("d"))
      .as[(Long, Long)].collect().head
    assert(exact === ((500L, 1500L)))
    // k=64: within sampling error of 1/3 (se ≈ sqrt(J(1-J)/k) ≈ 6%)
    val u64 = Sketch.kmvUnionK(col("kmv_a"), col("kmv_b"), 64)
    val (m, d) = pair(64)
      .select(Sketch.kmvMatchCount(u64, col("kmv_a"), col("kmv_b")).as("m"),
        size(u64).cast("bigint").as("d"))
      .as[(Long, Long)].collect().head
    assert(d === 64L)
    assert(math.abs(m.toDouble / d - 1.0 / 3) < 0.20, s"est ${m.toDouble / d}")
  }

  test("KMV set ops: exact when the union fits in k; near-truth when sketched") {
    // A = {0..999}, B = {500..1499}: |∩|=500, |A∖B|=500, |B∖A|=500, |∪|=1500
    def set(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(lit("k").as("k"), col("id").cast("string").as("v"))
    def pair(k: Int) = Sketch.kmvSketch(set(0, 1000), Seq("k"), col("v"), k)
      .select(col("kmv").as("kmv_a"))
      .crossJoin(Sketch.kmvSketch(set(500, 1500), Seq("k"), col("v"), k)
        .select(col("kmv").as("kmv_b")))
    // k=4096 holds the whole union: counts and estimates are EXACT
    val exact = Sketch.kmvSetOpStats(pair(4096), 4096)
      .select("kmv_match", "kmv_a_only", "kmv_b_only", "u_n",
        "union_est_x10", "inter_est_x10", "a_only_est_x10", "b_only_est_x10")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(exact === ((500L, 500L, 500L, 1500L, 15000L, 5000L, 5000L, 5000L)))
    // k=128: each estimate lands within sampling error of the truth
    val est = Sketch.kmvSetOpStats(pair(128), 128)
      .select("union_est_x10", "inter_est_x10", "a_only_est_x10", "b_only_est_x10")
      .as[(Long, Long, Long, Long)].collect().head
    val (u, i, ao, bo) =
      (est._1 / 10.0, est._2 / 10.0, est._3 / 10.0, est._4 / 10.0)
    assert(math.abs(u - 1500) / 1500.0 < 0.25, s"union $u")
    assert(math.abs(i - 500) / 500.0 < 0.45, s"inter $i")
    assert(math.abs(ao - 500) / 500.0 < 0.45, s"a_only $ao")
    assert(math.abs(bo - 500) / 500.0 < 0.45, s"b_only $bo")
    // the three membership counts tile the union sample exactly
    val parts = Sketch.kmvSetOpStats(pair(128), 128)
      .select("kmv_match", "kmv_a_only", "kmv_b_only", "u_n")
      .as[(Long, Long, Long, Long)].collect().head
    assert(parts._1 + parts._2 + parts._3 === parts._4)
  }

  test("keyed histogram: per-key merge equals single-pass; quantiles are per-key") {
    // two keys, each holding 0..499 once: 5 bins of 100 per key
    val vals = spark.range(1000).select(
      (col("id") % 2).cast("string").as("g"), expr("id div 2").as("v"))
    val whole = Sketch.histogramBy(vals, Seq("g"), col("v"), 100L)
    val merged = Sketch.histMergeBy(Seq(
      Sketch.histogramBy(vals.where(col("v") % 2 === 0), Seq("g"), col("v"), 100L),
      Sketch.histogramBy(vals.where(col("v") % 2 === 1), Seq("g"), col("v"), 100L)),
      Seq("g"))
    assert(merged.collect().toSet === whole.collect().toSet)
    // p50 per key: rank 250 of 500 -> bin 2 (cum 300 ≥ 250), both keys
    val q = Sketch.histQuantilesBy(whole, Seq("g"), 100L, Seq(50))
      .select("g", "pct", "target_rank", "bin", "bin_lo")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(q === Set(("0", 50L, 250L, 2L, 200L), ("1", 50L, 250L, 2L, 200L)))
  }

  test("one-pass HllAgg ≡ the two-step column construction, bit for bit") {
    val df = spark.range(50000).select((col("id") % 3).cast("string").as("g"),
      col("id").cast("string").as("v"))
    val twoStep = Sketch.hllDistinct(df, Seq("g"), col("v"))
      .select("g", "hll_reg_sum").as[(String, Long)].collect().toMap
    val onePass = df
      .select(col("g"), graft.functions.HashFns.hash61(col("v")).as("hx"))
      .groupBy("g").agg(Sketch.hllAgg(col("hx")).as("s"))
      .as[(String, Long)].collect().toMap
    assert(onePass === twoStep)
  }

  test("HllAgg skips NULL hash inputs (no fold as h=0)") {
    val df = spark.range(30000).select((col("id") % 3).cast("string").as("g"),
      col("id").cast("string").as("v"))
    def agg(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("g").agg(Sketch.hllAgg(col("hx")).as("s"))
      .as[(String, Long)].collect().toMap
    val clean = agg(df
      .select(col("g"), graft.functions.HashFns.hash61(col("v")).as("hx")))
    // inject NULL hashes on a third of the rows, plus all-NULL extra rows
    val withNulls = df
      .select(col("g"),
        when(col("v").cast("long") % 5 === 0, lit(null).cast("long"))
          .otherwise(graft.functions.HashFns.hash61(col("v"))).as("hx"))
      .union(df.limit(500).select(col("g"), lit(null).cast("long").as("hx")))
    val cleanSubset = agg(df.where(col("v").cast("long") % 5 =!= 0)
      .select(col("g"), graft.functions.HashFns.hash61(col("v")).as("hx")))
    // NULL rows contribute nothing: result equals the NULL-free subset...
    assert(agg(withNulls) === cleanSubset)
    // ...and matches the two-step column construction on that subset
    val twoStep = Sketch.hllDistinct(
      df.where(col("v").cast("long") % 5 =!= 0), Seq("g"), col("v"))
      .select("g", "hll_reg_sum").as[(String, Long)].collect().toMap
    assert(cleanSubset === twoStep)
    // sanity: the injected NULLs did change the input (different from clean)
    assert(agg(withNulls) !== clean)
  }

  test("HllAgg is partition-invariant and idempotent under duplicates") {
    val df = spark.range(20000).select(lit("k").as("g"),
      (col("id") % 5000).cast("string").as("v"))
    def run(d: org.apache.spark.sql.DataFrame) = d
      .select(col("g"), graft.functions.HashFns.hash61(col("v")).as("hx"))
      .groupBy("g").agg(Sketch.hllAgg(col("hx")).as("s"))
      .select("s").as[Long].collect().head
    val a = run(df)
    assert(a === run(df.repartition(17)))
    // 4× duplication of every value must not move a max-fold
    assert(a === run(df.union(df).union(df).union(df)))
  }

  /** Skewed corpus for the top-k summary: item i (0..49) appears 60−i
    * times, occurrences scattered over 3 shards by repetition index.
    */
  private def topkRows = spark.range(50)
    .select(col("id").as("i"),
      explode(sequence(lit(1L), lit(60L) - col("id"))).as("rep"))
    .select(concat(lit("w"), lpad(col("i").cast("string"), 2, "0")).as("item"),
      pmod(col("rep"), lit(3)).as("shard"))

  test("top-k summary: merged bounds sandwich the exact count") {
    val counts = topkRows.groupBy("shard", "item").agg(count(lit(1)).as("cnt"))
    val summ = Sketch.topkSummary(counts, Seq.empty, "shard", "item", "cnt", 8)
    val bounds = Sketch.topkMerge(summ, Seq.empty, "shard", "item", "cnt")
    val exact = topkRows.groupBy("item").agg(count(lit(1)).as("n"))
    val rows = bounds.join(exact, "item")
      .select("item", "est_lo", "est_hi", "n")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (it, lo, hi, n) =>
      assert(lo <= n && n <= hi, s"$it: [$lo, $hi] vs exact $n")
    }
    // the global top item is in every shard's top-8, so its bound is tight
    val top = rows.minBy { case (it, _, _, _) => it }
    assert(top._1 === "w00" && top._2 === 60L && top._2 === top._4)
  }

  test("top-k summary: kPrime ≥ distinct items makes every bound exact") {
    val counts = topkRows.groupBy("shard", "item").agg(count(lit(1)).as("cnt"))
    val summ = Sketch.topkSummary(counts, Seq.empty, "shard", "item", "cnt", 100)
    val bounds = Sketch.topkMerge(summ, Seq.empty, "shard", "item", "cnt")
    val exact = topkRows.groupBy("item").agg(count(lit(1)).as("n"))
    val rows = bounds.join(exact, "item")
      .select("est_lo", "est_hi", "n").as[(Long, Long, Long)].collect()
    assert(rows.length === 50)
    rows.foreach { case (lo, hi, n) => assert(lo === n && hi === n) }
  }

  test("keyed top-k summary: each key's bounds equal the unkeyed build on its slice") {
    val keyed = topkRows.withColumn("g",
      when(col("item") < "w25", lit("a")).otherwise(lit("b")))
    val kc = keyed.groupBy("g", "shard", "item").agg(count(lit(1)).as("cnt"))
    val kb = Sketch.topkMerge(
      Sketch.topkSummary(kc, Seq("g"), "shard", "item", "cnt", 8),
      Seq("g"), "shard", "item", "cnt")
    Seq("a", "b").foreach { g =>
      val slice = keyed.where(col("g") === g)
        .groupBy("shard", "item").agg(count(lit(1)).as("cnt"))
      val ub = Sketch.topkMerge(
        Sketch.topkSummary(slice, Seq.empty, "shard", "item", "cnt", 8),
        Seq.empty, "shard", "item", "cnt")
        .select("item", "est_lo", "est_hi").collect().toSet
      val ks = kb.where(col("g") === g)
        .select("item", "est_lo", "est_hi").collect().toSet
      assert(ks === ub, s"key $g")
    }
  }
}
