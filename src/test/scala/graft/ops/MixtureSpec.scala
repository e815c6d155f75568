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
}
