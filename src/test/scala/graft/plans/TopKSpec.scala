package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top_k aggregate keeps the k best with deterministic tie-breaks") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 30.0, 2L), ("a", 20.0, 3L), ("a", 30.0, 4L),
      ("b", 5.0, 5L)).toDF("key", "score", "id")
    val out = df.groupBy("key")
      .agg(TopK.top_k(struct(col("score"), col("id")), 2).as("top"))
      .collect().map(r => r.getAs[String]("key") ->
        r.getSeq[Row](1).map(t => (t.getDouble(0), t.getLong(1)))).toMap
    // score desc, tie on id asc: (30.0, 2) ranks before (30.0, 4)
    assert(out("a") === Seq((30.0, 2L), (30.0, 4L)))
    assert(out("b") === Seq((5.0, 5L)))
  }

  test("topKPerKey matches the row_number window pattern on real data") {
    val orders = Tables.orders(spark, sf)
    val viaWindow = {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      orders.withColumn("rn", row_number().over(w).cast("bigint"))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }
    val viaTopK = TopK.topKPerKey(orders, Seq("o_custkey"),
        col("o_totalprice"), Seq(col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    assert(viaTopK.count() === viaWindow.count())
    assert(viaWindow.exceptAll(viaTopK).count() === 0)
    assert(viaTopK.exceptAll(viaWindow).count() === 0)
  }

  test("partial aggregation appears in the plan (map-side top-k)") {
    val plan = TopK.topKPerKey(Tables.orders(spark, sf), Seq("o_custkey"),
      col("o_totalprice"), Seq(col("o_orderkey")), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_top_k"),
      s"expected map-side partial aggregation in:\n$plan")
  }

  test("serialization round-trip across shuffles under many partitions") {
    val df = spark.range(1000)
      .select((col("id") % 7).as("key"), col("id").cast("double").as("score"),
        col("id").as("tie"))
      .repartition(16)
    val out = TopK.topKPerKey(df, Seq("key"), col("score"), Seq(col("tie")), 2)
    val top = out.where(col("key") === 0).orderBy("rn")
      .select("score").as[Double].collect()
    assert(top.toSeq === Seq(994.0, 987.0))
  }
}
