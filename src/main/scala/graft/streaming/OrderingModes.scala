package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Execution/ordering modes (SURVEY §2.5) re-expressed on Spark's
  * partition-parallel model:
  *
  *  - PARALLEL: the default — one task per source partition; no
  *    per-record threading exists or is needed.
  *  - SEQUENTIAL: one record at a time over the whole stream
  *    (`coalesce(1)` + in-partition sort) — rarely needed, per-partition
  *    order is free.
  *  - KEY_ORDERED: serial per key, parallel across keys
  *    (`KeyOrderedDispatcher.java:66-474`): `repartition(key)` lands all
  *    rows of a key in one task, `sortWithinPartitions(partition,
  *    offset)` pins Kafka delivery order inside the micro-batch, and a
  *    per-partition sequential walk applies the side effect. No
  *    distinct-key cap exists because no per-key queue exists; the
  *    reference's 10 000-key cap and eviction machinery have no analog.
  *
  * Cross-batch ordering holds for keys whose partition assignment is
  * stable — the same caveat the reference documents
  * (`docs/GUARANTEES.md:62-66`).
  */
object OrderingModes {

  sealed trait ProcessingMode
  case object Parallel extends ProcessingMode
  case object Sequential extends ProcessingMode
  final case class KeyOrdered(keyCol: String = "key") extends ProcessingMode

  /** Arrange a (micro-)batch for the mode; the caller then walks
    * partitions with [[walk]].
    */
  def arrange(df: DataFrame, mode: ProcessingMode): DataFrame = mode match {
    case Parallel => df
    case Sequential =>
      df.coalesce(1).sortWithinPartitions(col("partition"), col("offset"))
    case KeyOrdered(key) =>
      df.repartition(col(key))
        .sortWithinPartitions(col(key), col("partition"), col("offset"))
  }

  /** Sequential per-partition side-effect walk: within a partition rows
    * arrive in the arranged order, so per-key serialization (KEY_ORDERED)
    * or global order (SEQUENTIAL) holds by construction.
    */
  def walk(df: DataFrame, mode: ProcessingMode)(f: Row => Unit): Unit =
    arrange(df, mode).foreachPartition { rows: Iterator[Row] => rows.foreach(f) }
}
