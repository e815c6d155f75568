package graft.ops

import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle for training-data ordering (kpipe has
  * no analog; standard LLM-pipeline practice — e.g. the shard/shuffle
  * step every dataloader assumes happened upstream).
  */
object Sharding {

  /** Assign every row a (shard, pos): shard by one keyed hash, order
    * within the shard by a second independent hash (ties — 61-bit hash
    * collisions — broken by id, so the manifest is total). The result
    * is a reproducible corpus-wide random permutation expressed as
    * "shard file + offset", which is how training jobs consume it: each
    * shard is written as one file and read sequentially by the loader.
    *
    * Scale shape: one hash shuffle to co-locate each shard, then a
    * per-shard sort; `nShards` scales with the corpus (shard size is
    * the knob — e.g. ~1 GB/shard ⇒ 10⁵ shards at 100 TB), so no
    * reducer ever sorts more than one shard. `row_number` over the
    * sorted shard is a running counter, not a buffered window. The
    * write-path twin — `repartition(shard).sortWithinPartitions(ord)`
    * — produces files in exactly this order; the manifest form here is
    * the oracle-checkable one.
    */
  def shardManifest(df: DataFrame, idCol: String,
                    nShards: Int, seed: String = "42"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val idStr = col(idCol).cast("string")
    val w = Window.partitionBy("shard").orderBy(col("__ord"), col(idCol))
    df.select(col(idCol),
        pmod(HashFns.hash61(concat(lit(s"shard$seed:"), idStr)),
          lit(nShards.toLong)).cast("int").as("shard"),
        HashFns.hash61(concat(lit(s"ord$seed:"), idStr)).as("__ord"))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .drop("__ord")
  }
}
