package graft.ops

import graft.SparkSpec
import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The profile-store loop: every sketch is a plain integer DataFrame,
  * so a day's profile persists as parquet and tomorrow's build merges
  * INTO the reloaded table without rescanning history. These tests pin
  * the two facts that loop depends on: (1) the parquet roundtrip is
  * lossless for every sketch family, (2) reload-then-merge is
  * bit-identical to a direct build over the union multiset — i.e. the
  * store adds no approximation of its own.
  */
class SketchPersistSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-sketch-store").toString

  /** Two overlapping "days" keyed by id parity: values 0..999 and
    * 700..1699 as strings — overlap exercises dedup-on-merge.
    */
  private def day(lo: Int, hi: Int) = spark.range(lo, hi).select(
    (col("id") % 2).cast("string").as("g"), col("id").cast("string").as("v"))
  private lazy val dayA = day(0, 1000)
  private lazy val dayB = day(700, 1700)
  private lazy val union = day(0, 1000).unionByName(day(700, 1700))

  private def roundtrip(df: DataFrame): DataFrame = {
    val dir = tmp()
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("HLL register store: reload + merge ≡ direct build on the union") {
    val stored = roundtrip(Sketch.hllRegisters(dayA, Seq("g"), col("v")))
    val merged = Sketch.hllMergeRegisters(
      stored.unionByName(Sketch.hllRegisters(dayB, Seq("g"), col("v"))), Seq("g"))
    val direct = Sketch.hllRegisters(union, Seq("g"), col("v"))
    val m = merged.select("g", "hll_regs").as[(String, Seq[Int])].collect().toMap
    val d = direct.select("g", "hll_regs").as[(String, Seq[Int])].collect().toMap
    assert(m === d)
  }

  test("KMV store: reload + merge ≡ direct sketch on the union") {
    val k = 64
    val stored = roundtrip(Sketch.kmvSketch(dayA, Seq("g"), col("v"), k))
    val merged = Sketch.kmvMerge(
      stored.unionByName(Sketch.kmvSketch(dayB, Seq("g"), col("v"), k)),
      Seq("g"), k)
    val direct = Sketch.kmvSketch(union, Seq("g"), col("v"), k)
    val m = Sketch.kmvStats(merged, k)
      .select("g", "kmv_n", "kmv_kth", "kmv_est_x10")
      .as[(String, Long, Long, Long)].collect().map { case (g, a, b, c) => g -> ((a, b, c)) }.toMap
    val d = Sketch.kmvStats(direct, k)
      .select("g", "kmv_n", "kmv_kth", "kmv_est_x10")
      .as[(String, Long, Long, Long)].collect().map { case (g, a, b, c) => g -> ((a, b, c)) }.toMap
    assert(m === d)
    // and the sketch arrays themselves survive the roundtrip exactly
    assert(merged.select("g", "kmv").as[(String, Seq[Long])].collect().toMap ===
      direct.select("g", "kmv").as[(String, Seq[Long])].collect().toMap)
  }

  test("bloom word store: reload + OR-merge ≡ direct filter on the union") {
    val (mBits, k) = (1 << 12, 4)
    def words(df: DataFrame) =
      Sketch.bloomWords(df, HashFns.hash61(col("v")), mBits, k)
    val stored = roundtrip(words(dayA))
    val merged = Sketch.bloomMerge(Seq(stored, words(dayB)))
    val direct = words(union)
    assert(merged.as[(Long, Long)].collect().toMap ===
      direct.as[(Long, Long)].collect().toMap)
  }

  test("histogram store: reload + cell-wise-sum merge ≡ direct histogram") {
    def hist(df: DataFrame) =
      Sketch.histogramBy(df, Seq("g"), col("v").cast("bigint"), 100L)
    val stored = roundtrip(hist(dayA))
    val merged = Sketch.histMergeBy(Seq(stored, hist(dayB)), Seq("g"))
    assert(merged.collect().toSet === hist(union).collect().toSet)
  }

  test("top-k summary store: reloaded shard summaries merge to the same bounds") {
    // shards play the role of days: summaries persist, merge later
    val counts = union.withColumn("shard", col("v").cast("bigint") % 3)
      .groupBy("g", "shard", "v").agg(count(lit(1)).as("cnt"))
    val summ = Sketch.topkSummary(counts, Seq("g"), "shard", "v", "cnt", 8)
    val direct = Sketch.topkMerge(summ, Seq("g"), "shard", "v", "cnt")
      .collect().toSet
    val reloaded = Sketch.topkMerge(roundtrip(summ), Seq("g"), "shard", "v", "cnt")
      .collect().toSet
    assert(reloaded === direct)
  }
}
