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

  /** Watermarked stream-stream interval join: left rows match right
    * rows with the same key whose event time falls in
    * [leftTs, leftTs + within]. Both sides carry watermarks so the
    * join state is bounded — Spark drops buffered rows once the
    * watermark passes the interval, the only way a stream-stream join
    * survives at scale.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, leftTsCol: String, rightTsCol: String,
                   delay: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, delay).as("l")
    val r = right.withWatermark(rightTsCol, delay).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
        col(s"r.$rightTsCol") <= col(s"l.$leftTsCol") + expr(s"INTERVAL $within"))
  }

  // ------------------------------------------------------------------ //
  // Custom keyed state (flatMapGroupsWithState)                        //
  // ------------------------------------------------------------------ //

  final case class SessionEvent(user: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(count: Long, total: Double, lastTs: Long)
  final case class SessionUpdate(user: Long, events: Long, total: Double, closed: Boolean)

  /** Inactivity-gap sessionization over a typed event stream — the
    * `KeyValueGroupedDataset.flatMapGroupsWithState` shape: per-key
    * mutable state with an EVENT-TIME inactivity timeout (the
    * watermark drives session close, so behavior is deterministic and
    * replayable; processing-time timeouts would re-trigger forever in
    * tests and drift in production). Emits a running update per batch
    * and a final `closed=true` row when the watermark passes the gap,
    * then clears the state — bounded-state discipline: every key's
    * state has a scheduled death.
    */
  def sessionize(ds: org.apache.spark.sql.Dataset[SessionEvent],
                 gapMs: Long, watermarkDelay: String = "1 second")
      : org.apache.spark.sql.Dataset[SessionUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(user, s.count, s.total, closed = true))
          } else {
            val evs = events.toSeq
            val prev = state.getOption.getOrElse(SessionState(0, 0.0, 0L))
            val next = SessionState(
              prev.count + evs.size,
              prev.total + evs.map(_.value).sum,
              evs.map(_.ts.getTime).foldLeft(prev.lastTs)(math.max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + gapMs)
            Iterator(SessionUpdate(user, next.count, next.total, closed = false))
          }
      }
  }
}
