package graft.plans

import graft.SparkSpec
import graft.functions.HashFns
import graft.ops.Sketch
import org.apache.spark.sql.functions._

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, mod: Int) = spark.range(n).select(
    (col("id") % 2).cast("string").as("g"),
    HashFns.hash61((col("id") % mod).cast("string")).as("hx"))

  test("one-pass KmvAggregate ≡ the relational kmvSketch, bit for bit") {
    val k = 64
    val df = spark.range(20000).select((col("id") % 2).cast("string").as("g"),
      (col("id") % 5000).cast("string").as("v"))
    // the INDEPENDENT row_number-window construction (kmvSketch itself
    // now routes through the aggregate, so comparing against it would
    // be a tautology)
    val relational = Sketch.kmvFromHashesRanked(
      df.select(col("g"), HashFns.hash61(col("v")).as("h")).distinct(),
      Seq("g"), col("h"), k)
      .select("g", "kmv").as[(String, Seq[Long])].collect().toMap
    val onePass = df.select(col("g"), HashFns.hash61(col("v")).as("hx"))
      .groupBy("g").agg(KmvAgg.kmv_sketch(col("hx"), k).as("kmv"))
      .select("g", "kmv").as[(String, Seq[Long])].collect().toMap
    assert(onePass === relational)
  }

  test("partition-invariant; duplicates are no-ops; below-k is the exact distinct set") {
    val k = 256
    val base = hashed(10000, 100) // 100 distinct < k, each duplicated 100×
    val out = base.groupBy("g").agg(KmvAgg.kmv_sketch(col("hx"), k).as("kmv"))
      .select("g", "kmv").as[(String, Seq[Long])].collect().toMap
    val rep = base.repartition(23)
      .groupBy("g").agg(KmvAgg.kmv_sketch(col("hx"), k).as("kmv"))
      .select("g", "kmv").as[(String, Seq[Long])].collect().toMap
    assert(out === rep)
    out.values.foreach { kmv =>
      assert(kmv.length === 50, "below k: sketch IS the distinct hash set")
      assert(kmv === kmv.sorted, "ascending layout")
    }
  }

  test("feeds kmvStats unchanged; partial aggregation appears in the plan") {
    val k = 16
    val sk = hashed(50000, 50000)
      .groupBy("g").agg(KmvAgg.kmv_sketch(col("hx"), k).as("kmv"))
    val stats = Sketch.kmvStats(sk, k)
      .select("g", "kmv_n", "kmv_kth", "kmv_est_x10")
      .as[(String, Long, Long, Long)].collect()
    stats.foreach { case (_, n, kth, est) =>
      assert(n === k.toLong && kth > 0L && est > 0L)
    }
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv"),
      s"map-side partial aggregation missing:\n$plan")
  }
}
