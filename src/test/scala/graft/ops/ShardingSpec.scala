package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(100).select(col("id").as("doc_id"))

  test("shard manifest is a total permutation: dense 1..n positions per shard") {
    val m = Sharding.shardManifest(ids, "doc_id", nShards = 8)
    assert(m.count() === 100)
    assert(m.select("doc_id").distinct().count() === 100)
    // every shard's positions are exactly 1..count(shard)
    val bad = m.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("np"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n") || col("np") =!= col("n"))
    assert(bad.count() === 0)
    assert(m.select("shard").distinct().count() > 1, "hash must spread shards")
  }

  test("shard manifest is deterministic and partitioning-independent") {
    val a = Sharding.shardManifest(ids, "doc_id", nShards = 8).collect().toSet
    val b = Sharding.shardManifest(ids.repartition(13), "doc_id", nShards = 8)
      .collect().toSet
    assert(a === b)
  }

  test("different seeds give different permutations") {
    val a = Sharding.shardManifest(ids, "doc_id", nShards = 8, seed = "42")
    val b = Sharding.shardManifest(ids, "doc_id", nShards = 8, seed = "7")
    assert(a.join(b, Seq("doc_id", "shard", "pos")).count() < 100)
  }
}
