package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: per-column null/distinct/min-max over mixed types, one pass") {
    val df = Seq(
      (Some(3L), Some("b"), Some(1.50)),
      (Some(1L), None, Some(2.25)),
      (Some(3L), Some("a"), None),
      (None, Some("a"), Some(0.75))
    ).toDF("k", "s", "x")
      .select(col("k"), col("s"), col("x").cast("decimal(18,2)").as("x"))
    val rows = Profile.profile(df, Seq("k", "s", "x"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("k") === (("k", 3L, 1L, 2L, "1", "3")))
    assert(rows("s") === (("s", 3L, 1L, 2L, "a", "b")))
    assert(rows("x") === (("x", 3L, 1L, 3L, "0.75", "2.25")))
    // output is ordered by col_name
    assert(Profile.profile(df, Seq("x", "k", "s"))
      .select("col_name").as[String].collect().toSeq === Seq("k", "s", "x"))
  }

  test("profile: all-null and no-null columns behave") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("a", "b")
    val rows = Profile.profile(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("a") === (("a", 2L, 0L, 2L, "1", "2")))
    assert(rows("b")._2 === 0L)       // n_non_null
    assert(rows("b")._3 === 2L)       // n_null
    assert(rows("b")._4 === 0L)       // n_distinct
    assert(rows("b")._5 == null && rows("b")._6 == null)
  }

  test("outlierFlags: MAD resists the outlier that would drag a stddev gate") {
    import spark.implicits._
    // 9 well-behaved values + one wild outlier; mean/stddev would let
    // the outlier inflate the threshold — median/MAD must not
    val df = ((1L to 9L).map(i => (i, "g", 100.0 + i)) :+ (10L, "g", 100000.0))
      .toDF("id", "g", "v")
    val out = Profile.outlierFlags(df, "id", "g", "v", k = 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(10L) === true, "the wild value must flag")
    (1L to 9L).foreach(i => assert(out(i) === false, s"row $i must pass"))
  }

  test("outlierFlags: constant group (MAD 0) flags only deviants; deterministic") {
    import spark.implicits._
    val df = (Seq.fill(5)(7.0) :+ 8.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "c", v) }.toDF("id", "g", "v")
    val out = Profile.outlierFlags(df, "id", "g", "v", 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    // med = 7, MAD = 0 → any deviation flags, equality does not
    assert(out(5L) === true)
    assert((0L to 4L).forall(!out(_)))
    val rep = Profile.outlierFlags(df.repartition(3), "id", "g", "v", 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(rep === out)
  }

  test("skewReport: hand-computed counts, shares, and rank order") {
    import spark.implicits._
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .map(Tuple1(_)).toDF("k")
    val out = Profile.skewReport(df, "k", k = 2).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("hot", 6L, 600L, 1L), ("warm", 3L, 300L, 2L)))
  }

  test("skewReport counts NULL keys under <null> and is partition-invariant") {
    import spark.implicits._
    val df = (Seq.fill(4)(Some("x")) ++ Seq.fill(2)(Option.empty[String]))
      .map(Tuple1(_)).toDF("k")
    val out = Profile.skewReport(df, "k", 5).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("x", 4L), ("<null>", 2L)))
    val rep = Profile.skewReport(df.repartition(7), "k", 5).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep.toSeq === out.toSeq)
  }

  test("psiDrift: a group matching the corpus shape scores far below a skewed one") {
    // "flat" is 90% of the corpus, so the global shape IS (almost)
    // flat's shape; the small "skew" group piles everything on bin 0
    val rows =
      (0 until 90).map(i => ("flat", (i % 3) * 10L)) ++
        (0 until 10).map(_ => ("skew", 0L))
    val df = rows.toDF("src", "v")
    val out = Profile.psiDrift(df, "src", "v", binWidth = 10)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byG = out.map(t => t._1 -> t).toMap
    assert(byG("flat")._2 === 90L && byG("flat")._3 === 3L)
    assert(byG("skew")._4 > 10L * byG("flat")._4,
      s"skewed group must dominate: $out")
    // partition invariance
    val b = Profile.psiDrift(df.repartition(7), "src", "v", 10)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === b.toSeq)
  }

  test("wasserstein1: hand-computed CDF gap; distance scales with shift width") {
    // corpus = a (mass at bin 0) + b (mass at bin 2): global CDF is
    // 500000 ppm at bins 0,1 and 1000000 at bin 2. a's CDF is 1e6
    // everywhere -> terms |1e6-5e5|,|1e6-5e5|,0 = 1000000 ppm; b's
    // CDF is 0,0,1e6 -> same by symmetry.
    val df = ((0 until 10).map(_ => ("a", 5L)) ++
      (0 until 10).map(_ => ("b", 25L))).toDF("src", "v")
    val out = Profile.wasserstein1(df, "src", "v", binWidth = 10)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(("a", 10L, 2L, 1000000L, 10000000L),
      ("b", 10L, 2L, 1000000L, 10000000L)))
    // a ONE-bin shift ("c" at bin 1 vs "a" at bin 0) must score half
    // of the TWO-bin shift above — the how-far property PSI lacks
    val df2 = ((0 until 10).map(_ => ("a", 5L)) ++
      (0 until 10).map(_ => ("c", 15L))).toDF("src", "v")
    val near = Profile.wasserstein1(df2, "src", "v", 10)
      .orderBy("src").collect().map(r => r.getLong(3))
    assert(near.toSeq === Seq(500000L, 500000L))
    // partition invariance
    val b = Profile.wasserstein1(df.repartition(7), "src", "v", 10)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === b.toSeq)
  }

  test("benfordReport: hand-computed digit counts; zero-count digits kept") {
    val df = Seq(10L, 11L, 199L, 2L, 25L, 9L).toDF("v")
    val out = Profile.benfordReport(df, "v").orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length === 9)
    val byD = out.map(t => t._1 -> t).toMap
    assert(byD(1L)._2 === 3L && byD(1L)._3 === 500000L)
    assert(byD(2L)._2 === 2L && byD(2L)._3 === 333333L)
    assert(byD(9L)._2 === 1L && byD(9L)._3 === 166666L)
    assert(byD(5L)._2 === 0L && byD(5L)._3 === 0L)
    assert(byD(1L)._5 === math.abs(500000L - 301030L))
    // an exactly-Benford 18-digit boundary: first digit of 10^18
    val big = Seq(1000000000000000000L).toDF("v")
    assert(Profile.benfordReport(big, "v")
      .where(col("digit") === 1).head().getLong(1) === 1L)
  }

  test("calibrationReport: hand-binned accuracy; cap bin collects the tail") {
    val scored = Seq(
      ("a", "a", 0L), ("a", "b", 1L),             // bin 0: 1/2
      ("a", "a", 10L), ("a", "a", 11L),           // bin 5: 2/2
      ("a", "b", 99L), ("a", "a", 1000L))         // cap bin 10: 1/2
      .toDF("truth", "pred", "conf")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.calibrationReport(d, "truth", "pred", "conf", 2L, 10L)
        .orderBy("bin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    val out = run(scored)
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 1L, 500L),
      (5L, 10L, 2L, 2L, 1000L),
      (10L, 20L, 2L, 1L, 500L)))
    assert(out.toSeq === run(scored.repartition(4)).toSeq)
  }

  test("scd2Intervals: runs collapse, half-open chaining, is_current") {
    val ev = Seq(
      (1L, "A", "2024-01-01 10:00:00", 1L),
      (1L, "A", "2024-01-01 10:01:00", 2L),
      (1L, "B", "2024-01-01 10:02:00", 3L),
      (1L, "A", "2024-01-01 10:03:00", 4L))
      .toDF("k", "v", "tss", "id")
      .select(col("k"), col("v"), col("tss").cast("timestamp").as("t"),
        col("id"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.scd2Intervals(d, "k", "v", "t", "id")
        .orderBy("valid_from").collect()
        .map(r => (r.getString(1), r.getTimestamp(2).toString,
          Option(r.getTimestamp(3)).map(_.toString).orNull, r.getBoolean(4)))
    val out = run(ev)
    assert(out.toSeq === Seq(
      ("A", "2024-01-01 10:00:00.0", "2024-01-01 10:02:00.0", false),
      ("B", "2024-01-01 10:02:00.0", "2024-01-01 10:03:00.0", false),
      ("A", "2024-01-01 10:03:00.0", null, true)))
    assert(out.toSeq === run(ev.repartition(3)).toSeq)
  }

  test("winsorizedStats: exact ceil-rank bounds, both tails clip, means exact") {
    // group a: $1..$8 one each at p25/p75: ceil-ranks 2 and 6 ->
    // bounds 200/600 cents; 100->200, 700/800->600
    val a = (1 to 8).map(v => ("a", v.toDouble))
    // group b: $1..$20 at p25/p75: ranks 5 and 15 -> bounds 500/1500
    val b = (1 to 20).map(v => ("b", v.toDouble))
    val df = (a ++ b).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.winsorizedStats(d, "g", "v", loPct = 25, hiPct = 75)
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
    val out = run(df)
    // a: raw mean 450; winsorized sum 3600+100-100-200=3400 -> 425
    assert(out(0) === ("a", 8L, 200L, 600L, 450L, 425L, 3L))
    // b: raw mean 1050; clip 1..4 up to 5 (+100+200+300+400... wait:
    // +400+300+200+100=+1000), 16..20 down to 15 (-100-200-300-400-500
    // =-1500): 21000+1000-1500=20500 -> 1025; 9 rows clipped
    assert(out(1) === ("b", 20L, 500L, 1500L, 1050L, 1025L, 9L))
    assert(out.toSeq === run(df.repartition(5)).toSeq)
  }

  test("ksDrift: hand-computed pairwise max CDF gap, smallest-bin tiebreak") {
    val df = Seq(("A", 5L), ("A", 15L), ("B", 5L), ("B", 25L),
      ("C", 25L), ("C", 26L)).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.ksDrift(d, "g", "v", binWidth = 10L)
        .orderBy("group_a", "group_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
    val out = run(df)
    // CDFs over bins {0,1,2}: A=.5/1/1, B=.5/.5/1, C=0/0/1 (ppm) —
    // (B,C) ties at bins 0 and 1, the smaller bin wins
    assert(out.toSeq === Seq(
      ("A", "B", 2L, 2L, 500000L, 1L),
      ("A", "C", 2L, 2L, 1000000L, 1L),
      ("B", "C", 2L, 2L, 500000L, 0L)))
    assert(out.toSeq === run(df.repartition(4)).toSeq)
  }

  test("datasetCard: hand-counted volume, dup rate, vocab and language spread") {
    val docs = Seq(
      ("s1", "hello world", "en", 11L),
      ("s1", "hello world", "en", 11L), // exact dup
      ("s1", "foo bar baz", "fr", 11L),
      ("s2", "a b a", "de", 5L))
      .toDF("source", "text", "lang", "n_chars")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.datasetCard(d, "source", "text", "lang", "n_chars")
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getString(9), r.getLong(10)))
    val out = run(docs)
    assert(out.toSeq === Seq(
      ("s1", 3L, 33L, 11L, 7L, 5L, 2L, 333L, 2L, "en", 666L),
      ("s2", 1L, 5L, 5L, 3L, 2L, 1L, 0L, 1L, "de", 1000L)))
    assert(out.toSeq === run(docs.repartition(3)).toSeq)
  }

  test("pitJoin: each fact sees the version valid AT ITS ts, never a later one") {
    val dims = Profile.scd2Intervals(Seq(
        (1L, "A", "2024-01-01 10:00:00", 1L),
        (1L, "B", "2024-01-01 10:20:00", 3L),
        (2L, "C", "2024-01-01 10:05:00", 5L))
      .toDF("k", "v", "tss", "id")
      .select(col("k"), col("v"), col("tss").cast("timestamp").as("t"),
        col("id")), "k", "v", "t", "id")
    val facts = Seq(
      (10L, 1L, "2024-01-01 09:50:00"), // before any version -> null
      (12L, 1L, "2024-01-01 10:00:00"), // boundary: valid_from inclusive
      (14L, 1L, "2024-01-01 10:19:00"),
      (16L, 1L, "2024-01-01 10:20:00"), // boundary: valid_to exclusive
      (18L, 2L, "2024-01-01 11:00:00"),
      (20L, 3L, "2024-01-01 10:00:00")) // unknown key -> null
      .toDF("fid", "k", "tss")
      .select(col("fid"), col("k"), col("tss").cast("timestamp").as("t"))
    def run(f: org.apache.spark.sql.DataFrame) =
      Profile.pitJoin(f, "k", "t", dims, "k")
        .orderBy("fid").collect()
        .map(r => (r.getLong(0), Option(r.getAs[String]("dim_v")).orNull))
    val out = run(facts)
    assert(out.toSeq === Seq((10L, null), (12L, "A"), (14L, "A"),
      (16L, "B"), (18L, "C"), (20L, null)))
    // a fact matches at most ONE interval: row count preserved
    assert(out.length === 6)
    assert(out.toSeq === run(facts.repartition(5)).toSeq)
  }

  test("fleissKappa: perfect split scores 1000; hand case scores -200") {
    val perfect = Seq((1L, "x", "x", "x"), (2L, "y", "y", "y"))
      .toDF("id", "r1", "r2", "r3")
    val p = Profile.fleissKappa(perfect, "id", Seq("r1", "r2", "r3"))
      .head()
    assert((p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3),
      p.getLong(4)) === ((2L, 2L, 12L, 18L, 1000L)))
    // item2 has a dissenter: A=8, S=26 -> 1000*(144-156)/60 = -200
    val mixed = Seq((1L, "x", "x", "x"), (2L, "x", "x", "y"))
      .toDF("id", "r1", "r2", "r3")
    val m = Profile.fleissKappa(mixed, "id", Seq("r1", "r2", "r3")).head()
    assert(m.getLong(4) === -200L)
  }

  test("rowChecks + uniquenessCheck: hand-counted pass rates and flags") {
    val df = Seq((1L, 10.0, "A"), (2L, -5.0, "A"), (2L, 7.0, "B"),
      (4L, 3.0, "Z")).toDF("id", "amt", "tag")
    val checks = Seq(
      "amt_positive" -> "amt > 0",
      "tag_known" -> "tag IN ('A', 'B')")
    val out = Profile.rowChecks(df, checks)
      .unionByName(Profile.uniquenessCheck(df, Seq("id"), "id_unique"))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("amt_positive", 4L, 3L, 750L, false),
      ("id_unique", 4L, 3L, 750L, false),
      ("tag_known", 4L, 3L, 750L, false)))
    val clean = Profile.rowChecks(df.where(col("amt") > 0),
      Seq("amt_positive" -> "amt > 0")).collect()
    assert(clean.head.getBoolean(4) === true)
  }

  test("joinAmplification: exact per-key products, shares, rank order") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L).toDF("k") // 9 has no right
    val right = Seq(1L, 1L, 2L, 3L, 3L, 3L, 8L).toDF("k")
    val out = Profile.joinAmplification(left, "k", right, "k", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // products: key1 3*2=6, key2 2*1=2, key3 1*3=3; total 11
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, 6L, 545L, 1L),
      (3L, 1L, 3L, 3L, 272L, 2L)))
    val all = Profile.joinAmplification(left.repartition(5), "k", right, "k", 10)
      .orderBy("rank").collect()
    assert(all.length === 3, "keys absent from one side emit nothing")
  }

  test("snapshotDiff: added/removed/changed/unchanged classes, null-safe") {
    val a = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("k", "s", "v")
    val b = Seq((2L, "y", 20), (3L, "zz", 30), (4L, "w", 40)).toDF("k", "s", "v")
    val out = Profile.snapshotDiff(a, b, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
    // null-safe compare: null vs null is unchanged, null vs value changed
    val an = Seq((1L, Option.empty[String]), (2L, Option("p"))).toDF("k", "s")
    val bn = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val nout = Profile.snapshotDiff(an, bn, Seq("k"), Seq("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(nout.toSeq === Seq((1L, "unchanged"), (2L, "changed")))
  }

  test("refIntegrity: orphans and unreferenced parents are both counted") {
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "orphan"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk") // 3 is never referenced
    val out = Profile.refIntegrity(Seq(
        ("child->parent", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      ("child->parent", 4L, 1L, 250L, 3L, 2L, 666L)))
  }

  test("classificationReport: hand-computed per-class PRF, absent classes kept") {
    import spark.implicits._
    val rows = Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"), ("C", "B"))
      .toDF("truth", "pred")
    val out = Profile.classificationReport(rows, "truth", "pred")
      .orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      ("A", 2L, 1L, 1L, 1000L, 500L, 666L),
      ("B", 2L, 4L, 2L, 500L, 1000L, 666L),
      ("C", 1L, 0L, 0L, 0L, 0L, 0L)))
    // prediction-only class gets a row too
    val out2 = Profile.classificationReport(
        Seq(("A", "Z")).toDF("truth", "pred"), "truth", "pred")
      .orderBy("label").collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out2.toSeq === Seq(("A", 1L, 0L, 0L), ("Z", 0L, 1L, 0L)))
  }

  test("jsDivergence: identical distributions 0, disjoint near 1 bit, symmetric grid") {
    import spark.implicits._
    // long texts: at tiny token totals the +1 Laplace smoothing
    // dominates and even disjoint vocabularies measure small — 100
    // repeats puts the smoothed mass below 1% so the disjoint pair
    // reads near its true 1 bit
    val docs = Seq(
      (1L, "A", "x y z " * 100), (2L, "B", "x y z " * 100), // identical
      (3L, "C", "p q r " * 100))                            // disjoint
      .toDF("doc_id", "lang", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.jsDivergence(d, "lang", "text")
        .orderBy("lang_a", "lang_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out = run(docs)
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq(("A", "B"), ("A", "C"), ("B", "C")))
    val ab = out.find(r => (r._1, r._2) == ("A", "B")).get
    val ac = out.find(r => (r._1, r._2) == ("A", "C")).get
    // identical word distributions: p = q at every word ⇒ every
    // eighth-bit term is EXACTLY zero
    assert(ab._4 === 0L)
    // disjoint vocabularies: JSD → 1 bit, up to Laplace smoothing and
    // the ±1.5% Mitchell band
    assert(ac._4 > 900000L && ac._4 <= 1020000L, s"disjoint jsd=${ac._4}")
    assert(ac._3 === 6L)   // union vocabulary {x,y,z,p,q,r}
    assert(out.toSeq === run(docs.repartition(5)).toSeq)
  }

  test("heavyChangers: rate deltas ranked by magnitude, hand-computed") {
    import spark.implicits._
    val a = Seq((1L, "a a b")).toDF("doc_id", "text")
    val b = Seq((2L, "a c c")).toDF("doc_id", "text")
    val out = Profile.heavyChangers(a, b, "text", k = 3)
      .orderBy("rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, "c", 0L, 2L, 0L, 666666L, -666666L),
      (2L, "a", 2L, 1L, 666666L, 333333L, 333333L),
      (3L, "b", 1L, 0L, 333333L, 0L, 333333L)))
  }

  test("giniIndex: 0 for uniform, (n-1)/n extreme for one-holder concentration") {
    import spark.implicits._
    val uniform = Seq(32L, 32L, 32L, 32L).toDF("v")
    val g0 = Profile.giniIndex(uniform, "v", binWidth = 32).collect().head
    assert(g0.getLong(0) === 4L && g0.getLong(2) === 0L)
    val extreme = Seq(0L, 0L, 0L, 320L).toDF("v")
    val g1 = Profile.giniIndex(extreme, "v", binWidth = 32).collect().head
    assert(g1.getLong(2) === 750L)   // max for n=4: (n−1)/n
    // partition invariance
    val big = spark.range(0, 500).selectExpr("(id % 97) * 3 AS v")
    val x = Profile.giniIndex(big, "v").collect().head.getLong(2)
    val y = Profile.giniIndex(big.repartition(7), "v").collect().head.getLong(2)
    assert(x === y)
  }

  test("cohensKappa: chance-level 0, perfect 1000, inverse -1000") {
    import spark.implicits._
    def kappa(pairs: Seq[(String, String)]): Long =
      Profile.cohensKappa(pairs.toDF("a", "b"), "a", "b")
        .collect().head.getLong(2)
    // observed = expected agreement -> exactly 0
    assert(kappa(Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "A"))) === 0L)
    assert(kappa(Seq(("A", "A"), ("B", "B"), ("C", "C"))) === 1000L)
    assert(kappa(Seq(("A", "B"), ("B", "A"))) === -1000L)
  }

  test("krippendorffAlpha: hand coincidence case, perfect, systematic") {
    import spark.implicits._
    def alpha(pairs: Seq[(String, String)]) =
      Profile.krippendorffAlpha(pairs.toDF("a", "b"), "a", "b")
        .collect().head
    // n_units 5, disagree 2, pooled A 6 / B 4: De = 100 - 52 = 48,
    // alpha = 1 - 9*4/48 = 0.25
    val h = alpha(Seq(("A", "A"), ("B", "B"), ("A", "B"),
      ("B", "A"), ("A", "A")))
    assert((h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3)) ===
      ((5L, 2L, 10L, 250000L)))
    assert(alpha(Seq(("A", "A"), ("B", "B"), ("C", "C")))
      .getLong(3) === 1000000L)
    // systematic disagreement: 1 - 5*6/18 = -2/3
    assert(alpha(Seq(("X", "Y"), ("X", "Y"), ("X", "Y")))
      .getLong(3) === -666666L)
  }

  test("cronbachAlpha: perfect scale 1e6, anti-correlated negative, T=0") {
    import spark.implicits._
    // identical items: alpha exactly 1
    val perfect = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 4L, 4L)).toDF("a", "b", "c")
    assert(Profile.cronbachAlpha(perfect, Seq("a", "b", "c"))
      .collect().head.getLong(2) === 1000000L)
    // anti-correlated two-item scale: S=20, T=4 -> 2*(1 - 5) = -8
    val anti = Seq((2L, 0L), (0L, 1L), (2L, 0L), (0L, 1L)).toDF("a", "b")
    assert(Profile.cronbachAlpha(anti, Seq("a", "b"))
      .collect().head.getLong(2) === -8000000L)
    // constant totals: T = 0 guards to 0
    val const = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    assert(Profile.cronbachAlpha(const, Seq("a", "b"))
      .collect().head.getLong(2) === 0L)
  }

  test("tCloseness: hand variational distance incl. zero cells") {
    import spark.implicits._
    val df = Seq(("X", "a"), ("X", "a"), ("Y", "a"), ("Y", "b"))
      .toDF("q", "sv")
    // corpus p = (3/4, 1/4); both classes sit at distance 1/4; the
    // X/b zero cell MUST contribute its |0 - 1/4| term
    val out = Profile.tCloseness(df, Seq("q"), "sv")
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("X", 2L, 250000L, false), ("Y", 2L, 250000L, false)))
    // identical class distribution -> t = 0; skewed threshold flips
    val flagged = Profile.tCloseness(df, Seq("q"), "sv",
        tPpm = 200000L)
      .collect().map(_.getBoolean(3))
    assert(flagged.forall(identity))
  }

  test("looGroupImpact: hand means and signed removal shifts") {
    import spark.implicits._
    val df = Seq(("A", 10L), ("A", 20L), ("B", 30L)).toDF("g", "v")
    val out = Profile.looGroupImpact(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // corpus mean 20; drop A -> 30 (delta +10); drop B -> 15 (delta -5)
    assert(out("A") === ((2L, 15000L, 20000L, 30000L, 10000L)))
    assert(out("B") === ((1L, 30000L, 20000L, 15000L, -5000L)))
  }

  test("bestGiniSplit: perfect split, noisy split, tie to smallest v") {
    import spark.implicits._
    def run(rows: Seq[(Long, Boolean)]) =
      Profile.bestGiniSplit(rows.toDF("x", "y"), "x", "y")
        .collect().head
    // perfect separation at x <= 1
    val perfect = run(Seq.fill(4)((1L, true)) ++ Seq.fill(4)((2L, false)))
    assert(perfect.getAs[Long]("threshold") === 1L)
    assert(perfect.getAs[Long]("split_gini_x1e6") === 0L)
    assert(perfect.getAs[Long]("root_gini_x1e6") === 500000L)
    assert(perfect.getAs[Long]("gain_x1e6") === 500000L)
    // noisy: g = 2e6*(3*1*4 + 1*3*4)/(4*4*8) = 375000
    val noisy = run(
      Seq.fill(3)((1L, true)) ++ Seq((1L, false)) ++
        Seq((2L, true)) ++ Seq.fill(3)((2L, false)))
    assert(noisy.getAs[Long]("threshold") === 1L)
    assert(noisy.getAs[Long]("split_gini_x1e6") === 375000L)
    assert(noisy.getAs[Long]("gain_x1e6") === 125000L)
    // label independent of x: every split equal -> smallest v wins
    val tie = run(Seq((1L, true), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, false)))
    assert(tie.getAs[Long]("threshold") === 1L)
    assert(tie.getAs[Long]("gain_x1e6") === 0L)
  }

  test("woeIvFromCounts ≡ batch woeIv over accumulated counts") {
    import spark.implicits._
    val batches = Seq(
      Seq(("a", "x", true), ("a", "y", false), ("b", "x", true)),
      Seq(("a", "x", false), ("b", "y", true), ("b", "y", false)),
      Seq(("a", "y", true), ("b", "x", false)))
    // fold (feature, value) counts as a foreachBatch monitor would
    val acc = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)]
    batches.foreach(_.foreach { case (f, g, y) =>
      Seq(("f", f), ("g", g)).foreach { k =>
        val (p, ng) = acc.getOrElse(k, (0L, 0L))
        acc(k) = if (y) (p + 1, ng) else (p, ng + 1)
      }
    })
    val streamed = Profile.woeIvFromCounts(spark,
        acc.toSeq.map { case ((f, v), (p, ng)) => (f, v, p, ng) })
      .orderBy("feature", "value").collect().map(_.toSeq).toSeq
    val batch = Profile.woeIv(
        batches.flatten.toDF("f", "g", "y"), "y", Seq("f", "g"))
      .orderBy("feature", "value").collect().map(_.toSeq).toSeq
    assert(streamed === batch && batch.nonEmpty)
  }

  test("woeIv: exact power-of-two WOE, antisymmetry, null-feature zero") {
    import spark.implicits._
    // f: a -> 3 pos / 1 neg, b -> 1 pos / 3 neg (P=N=4):
    // q(a) = (4*5)<<20 / (2*5) = 2 << 20 -> woe exactly +8 e8 (1 bit);
    // b is the mirror -> -8. g constant -> ratio 1 -> woe 0, iv 0.
    val rows = Seq(
      ("a", "c", true), ("a", "c", true), ("a", "c", true),
      ("a", "c", false),
      ("b", "c", true),
      ("b", "c", false), ("b", "c", false), ("b", "c", false))
    val df = rows.toDF("f", "g", "y")
    val out = Profile.woeIv(df, "y", Seq("f", "g")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("woe_e8"), r.getAs[Long]("dp_ppm"),
          r.getAs[Long]("iv_x1000"))).toMap
    assert(out(("f", "a")) === ((8L, 500000L, 1000L)))
    assert(out(("f", "b")) === ((-8L, -500000L, 1000L)))
    assert(out(("g", "c")) === ((0L, 0L, 0L)))
  }

  test("isotonicCalibration: PAVA pooling of violators, monotone output, exact pools") {
    // bins → (n, pos): 0→(4,1)=0.25, 1→(4,3)=0.75, 2→(4,2)=0.50,
    // 3→(4,4)=1.0. Bins 1,2 violate; PAVA pools them to 5/8 = 0.625
    def mk(bin: Long, n: Int, pos: Int) =
      (1 to n).map(i => (bin, i <= pos))
    val df = (mk(0L, 4, 1) ++ mk(1L, 4, 3) ++ mk(2L, 4, 2) ++
      mk(3L, 4, 4)).toDF("bin", "ok")
    val out = Profile.isotonicCalibration(df, "bin", "ok")
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("raw_ppm")).toSeq ===
      Seq(250000L, 750000L, 500000L, 1000000L))
    assert(out.map(_.getAs[Long]("iso_ppm")).toSeq ===
      Seq(250000L, 625000L, 625000L, 1000000L))
    // already-monotone input is returned unchanged
    val mono = (mk(0L, 4, 1) ++ mk(1L, 4, 2) ++ mk(2L, 4, 4))
      .toDF("bin", "ok")
    val out2 = Profile.isotonicCalibration(mono, "bin", "ok")
      .orderBy("bin").collect()
    assert(out2.forall(r =>
      r.getAs[Long]("iso_ppm") === r.getAs[Long]("raw_ppm")))
  }

  test("cumSqrtFStrata: hand-computed sqrt-frequency cuts") {
    // bins (width 10): 0→100 rows (isq 10000), 1→1 (1000), 2→1 (1000),
    // 3→4 (2000). T = 14000; strata=2 cut at cumprev·2 div 14000:
    // bin0 cumprev 0 → s0; bin1 cumprev 10000 → (20000 div 14000)=1;
    // bins 2,3 also s1 → stratum 0 = the single heavy bin.
    val df = ((1 to 100).map(_ => 5L) ++ Seq(15L, 25L) ++
      (1 to 4).map(_ => 35L)).toDF("v")
    val out = Profile.cumSqrtFStrata(df, "v", binWidth = 10L, strata = 2)
      .orderBy("stratum").collect()
    assert(out.length === 2)
    val s0 = out.head
    assert(s0.getAs[Long]("n_bins") === 1L)
    assert(s0.getAs[Long]("lo_value") === 0L)
    assert(s0.getAs[Long]("hi_value") === 9L)
    assert(s0.getAs[Long]("n_rows") === 100L)
    val s1 = out(1)
    assert(s1.getAs[Long]("n_bins") === 3L)
    assert(s1.getAs[Long]("n_rows") === 6L)
    assert(s1.getAs[Long]("lo_value") === 10L)
    assert(s1.getAs[Long]("hi_value") === 39L)
  }

  test("fairnessReport: exact DI ratio, parity diff, four-fifths flag") {
    // ref "en": 10 rows 8 selected (0.8); "de": 10 rows 6 selected
    // (0.6 → DI 750, flagged); "fr": 10 rows 8 selected (DI 1000)
    def mk(g: String, n: Int, sel: Int) =
      (1 to n).map(i => (g, i <= sel))
    val df = (mk("en", 10, 8) ++ mk("de", 10, 6) ++ mk("fr", 10, 8))
      .toDF("lang", "ok")
    val out = Profile.fairnessReport(df, "lang", col("ok"), "en")
      .orderBy("lang").collect()
    val de = out.head
    assert(de.getAs[Long]("rate_ppm") === 600000L)
    assert(de.getAs[Long]("parity_diff_ppm") === -200000L)
    assert(de.getAs[Long]("di_x1000") === 750L)
    assert(de.getAs[Boolean]("below_four_fifths"))
    val en = out(1)
    assert(en.getAs[Long]("di_x1000") === 1000L)
    assert(!en.getAs[Boolean]("below_four_fifths"))
    assert(!out(2).getAs[Boolean]("below_four_fifths"))
  }

  test("kAnonymity: class sizes, per-k thresholds, l-diversity, disclosure ppm") {
    // classes: (a,1)→sz 3 ldiv 2, (a,2)→sz 1 ldiv 1, (b,1)→sz 2 ldiv 1
    val df = Seq(
      ("a", 1L, "x"), ("a", 1L, "x"), ("a", 1L, "y"),
      ("a", 2L, "x"),
      ("b", 1L, "z"), ("b", 1L, "z"))
      .toDF("qa", "qb", "sv")
    val out = Profile.kAnonymity(df, Seq("qa", "qb"), "sv",
        ks = Seq(2L, 3L))
      .orderBy("k").collect()
    assert(out.length === 2)
    val k2 = out.head
    assert(k2.getAs[Long]("k") === 2L)
    assert(k2.getAs[Long]("classes_below") === 1L) // only (a,2)
    assert(k2.getAs[Long]("rows_below") === 1L)
    assert(k2.getAs[Long]("rows_below_ppm") === 166666L) // 1/6
    assert(k2.getAs[Long]("n_classes") === 3L)
    assert(k2.getAs[Long]("n_rows") === 6L)
    assert(k2.getAs[Long]("k_anonymity") === 1L)
    assert(k2.getAs[Long]("l_diversity") === 1L)
    // l=1 classes: (a,2) sz 1 + (b,1) sz 2 → 3/6 rows
    assert(k2.getAs[Long]("l1_rows_ppm") === 500000L)
    val k3 = out(1)
    assert(k3.getAs[Long]("classes_below") === 2L) // (a,2) + (b,1)
    assert(k3.getAs[Long]("rows_below") === 3L)
    assert(k3.getAs[Long]("rows_below_ppm") === 500000L)
  }

  test("concentration: hand-computed HHI/Simpson/effective-N; 1-group edge") {
    val df = Seq("a", "a", "a", "b").toDF("g")
    val r = Profile.concentration(df, "g", "dim1").collect()(0)
    // counts 3,1: n=4 m2=10 m11=6 mx=3
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("hhi_ppm") === 625000L)    // 1e6*10/16
    assert(r.getAs[Long]("simpson_ppm") === 500000L) // 1e6*6/12
    assert(r.getAs[Long]("eff_n_x1000") === 1600L)   // 1000*16/10
    assert(r.getAs[Long]("top_share_ppm") === 750000L)
    // single row: Simpson's n(n-1) denominator guards to 1, HHI = 1
    val one = Profile.concentration(Seq("x").toDF("g"), "g", "d").collect()(0)
    assert(one.getAs[Long]("hhi_ppm") === 1000000L)
    assert(one.getAs[Long]("simpson_ppm") === 0L)
    // uniform k groups: effective N = k exactly
    val u = Profile.concentration(
      Seq("a", "b", "c", "a", "b", "c").toDF("g"), "g", "d").collect()(0)
    assert(u.getAs[Long]("eff_n_x1000") === 3000L)
  }

  test("concentrationFromCounts: folded micro-batch counts == batch") {
    val batch1 = Seq("a", "a", "b")
    val batch2 = Seq("a", "b", "c", "c")
    val expected = Profile.concentration(
      (batch1 ++ batch2).toDF("g"), "g", "live").collect().toSeq
    val folded = (batch1 ++ batch2).groupBy(identity)
      .map { case (g, xs) => (g, xs.size.toLong) }.toSeq
    val streamed = Profile.concentrationFromCounts(spark, folded, "live")
      .collect().toSeq
    assert(streamed === expected)
  }

  test("theilDecomposition: equal-mean groups, hand within via the e256 log") {
    import org.apache.spark.sql.functions.col
    // A: two equal units -> zero within; B: 50k/150k around the same
    // 100k mean -> between = 0 on both sides (group means == global)
    val df = Seq(("A", 100000L), ("A", 100000L),
      ("B", 50000L), ("B", 150000L)).toDF("g", "v")
    val out = Profile.theilDecomposition(df, "g", col("v")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("A").getAs[Long]("pop_share_ppm") === 500000L)
    assert(out("A").getAs[Long]("val_share_ppm") === 500000L)
    assert(out("A").getAs[Long]("within_me256") === 0L)
    assert(out("A").getAs[Long]("between_me256") === 0L)
    assert(out("A").getAs[Long]("mean_lr_e256") === 0L)
    assert(out("B").getAs[Long]("between_me256") === 0L)
    // hand e256 walk: lr(50k vs 100k) = -256 (exact octave),
    // lr(150k vs 100k) = +128 (Mitchell midpoint of the octave),
    // tw = 50000*(-256) + 150000*128 = 6.4e6,
    // within = 1000*6.4e6 div 200000 = 32000
    assert(out("B").getAs[Long]("within_me256") === 32000L)
  }
}
