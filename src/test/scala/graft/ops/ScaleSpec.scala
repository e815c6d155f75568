package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches the plain join result") {
    // 90% of big rows share one hot key
    val big = spark.range(2000)
      .select(when(col("id") % 10 === 0, col("id") % 5).otherwise(lit(1L)).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("sk", "label")
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy("label").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Scale.saltedJoin(big, small, "k", "sk", saltFactor = 8)
      .groupBy("label").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("two-phase aggregation matches single-phase on a skewed key") {
    val df = spark.range(5000)
      .select(when(col("id") % 100 === 0, col("id") % 7).otherwise(lit(3L)).as("k"),
        col("id").as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
    val twoPhase = Scale.twoPhaseAgg(df, "k", saltFactor = 8)(
      partials = Seq(count(lit(1)).as("pn"), sum("v").as("pt")),
      finals = Seq(sum("pn").as("n"), sum("pt").as("total")))
    assert(direct.exceptAll(twoPhase).count() === 0)
    assert(twoPhase.exceptAll(direct).count() === 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")   // force non-broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val a = s.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = s.range(1000).select(col("id").as("k2"), (col("id") * 3).as("vb"))
    Scale.writeBucketed(a, "bucketed_a", "k", 4)
    Scale.writeBucketed(b, "bucketed_b", "k2", 4)
    val joined = Scale.bucketedJoin(s, "bucketed_a", "bucketed_b", "k", "k2")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === 1000)
    s.sql("DROP TABLE IF EXISTS bucketed_a")
    s.sql("DROP TABLE IF EXISTS bucketed_b")
  }

  test("sequence packing: greedy per-shard cut at the token budget") {
    import spark.implicits._
    // shards=1 → one ordered run; token counts 3,3,3,3 with budget 5:
    // tokens-before = 0,3,6,9 → packs 0,0,1,1 (boundary doc overflows
    // its pack, never starts underfull)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i"), (4L, "j k l"))
      .toDF("doc_id", "text")
    val out = Packing.packBySequenceBudget(docs, "doc_id", "text",
        budgetTokens = 5, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }
}
