package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateful streaming operators — capabilities beyond the reference
  * (kpipe explicitly has no windows/state, `README.md:203-208`) that a
  * training-data stream pipeline needs. All state is watermark-bounded:
  * unbounded streaming state is the #1 way a 100 TB stream job dies.
  */
object Stateful {

  /** Streaming exact dedup with bounded state:
    * `dropDuplicatesWithinWatermark` keeps a key only until the
    * watermark passes it.
    */
  def dedupWithinWatermark(df: DataFrame, eventTimeCol: String, delay: String,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked tumbling-window aggregation — the streaming form of
    * the batch `q19_time_bucket_agg` (same expressions, same results on
    * the same rows).
    */
  def windowedAgg(df: DataFrame, eventTimeCol: String, delay: String,
                  windowDuration: String, keyCols: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowDuration) +: keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
}
