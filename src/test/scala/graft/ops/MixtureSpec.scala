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
}
