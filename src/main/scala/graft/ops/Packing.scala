package graft.ops

import graft.functions.{HashFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed token-budget packs (the batches a trainer concatenates into
  * context-length sequences).
  *
  * Deterministic spec: documents are sharded by a stable hash of their
  * id, ordered by id within the shard, and cut greedily — a document
  * whose preceding cumulative token count has crossed a multiple of
  * `budgetTokens` starts the next pack (`pack_id = floor(tokens-before /
  * budget)`). The boundary-crossing document stays in the earlier pack
  * (packs may slightly overflow, never underfill), which keeps the
  * assignment a pure function of (id, token counts).
  *
  * Scale shape: the running sum is a window partitioned by the hash
  * shard — `shards` controls reducer parallelism, so no global-order
  * single-reducer window ever appears; the token count itself is a
  * map-only codegen'd projection. The hash family is the md5-derived
  * oracle-parity one, so pack assignments are DuckDB-verifiable.
  */
object Packing {

  def packBySequenceBudget(df: DataFrame, idCol: String, textCol: String,
                           budgetTokens: Long, shards: Int = 64): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(idCol)
    df.select(col(idCol),
        HashFns.hash61(col(idCol).cast("string")).%(shards).as("shard"),
        TextFns.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("pack_id",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / budgetTokens))
  }
}
