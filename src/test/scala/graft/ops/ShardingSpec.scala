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

  test("weighted interleave holds the stride-schedule prefix invariant") {
    // 30 docs per source, weights 2:1 — at every prefix of every
    // shard's order, na/wa and nb/wb differ by at most 1/wa + 1/wb
    // (each source is within one stride of the merged virtual clock).
    val (wa, wb) = (2.0, 1.0)
    val docs = spark.range(60).select(col("id").as("doc_id"),
      when(col("id") < 30, "a").otherwise("b").as("source"))
    val m = Sharding.weightedInterleave(docs, "doc_id", "source",
        Map("a" -> wa, "b" -> wb), nShards = 2)
      .select("shard", "pos", "source")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(m.length === 60)
    m.groupBy(_._1).values.foreach { shard =>
      val totalA = shard.count(_._3 == "a")
      val totalB = shard.count(_._3 == "b")
      var (na, nb) = (0, 0)
      shard.sortBy(_._2).foreach { case (_, _, src) =>
        if (src == "a") na += 1 else nb += 1
        // the stride bound holds while BOTH sources still have supply
        // in this shard; after one drains, the other runs out its tail
        if (na < totalA && nb < totalB)
          assert(math.abs(na / wa - nb / wb) <= 1 / wa + 1 / wb + 1e-9,
            s"stride invariant broken at prefix ($na a, $nb b)")
      }
    }
    // the full order is still a dense permutation per shard
    m.groupBy(_._1).values.foreach { shard =>
      assert(shard.map(_._2).sorted.toSeq === (1L to shard.length).toSeq)
    }
  }
}
