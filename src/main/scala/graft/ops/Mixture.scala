package graft.ops

import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling — the "data mixing" stage of a
  * training-data pipeline: keep each source/language/domain at its own
  * target rate so the final mixture matches a recipe, without a shuffle
  * and without RNG state.
  *
  * Membership is decided per row by `hash61(salt ++ id) % 1000 < rate`,
  * so the same row is kept or dropped identically on every run, on any
  * partitioning, at any scale — reproducibility a `rand()`-based sample
  * cannot give. The per-group rates join in via a BROADCAST of the tiny
  * weights table; the whole operator is one map-only projection over
  * the corpus scan (no shuffle exchange in the plan).
  */
object Mixture {

  /** Filter `df` down to a deterministic per-group sample.
    *
    * @param rates          per-mille keep rate by `groupCol` value
    * @param defaultPerMille rate for group values absent from `rates`
    * @return input rows that pass, plus their `sample_key` (hash % 1000)
    */
  def sampleByRates(df: DataFrame, idCol: String, groupCol: String,
                    rates: Map[String, Int], defaultPerMille: Int,
                    salt: String = "mix:"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val weights = rates.toSeq.toDF("__g", "__pm")
    df.join(broadcast(weights), df(groupCol) === col("__g"), "left")
      .withColumn("sample_key",
        HashFns.hash61(concat(lit(salt), col(idCol).cast("string"))) % 1000)
      .where(col("sample_key") < coalesce(col("__pm"), lit(defaultPerMille)))
      .drop("__g", "__pm")
  }
}
