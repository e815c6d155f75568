package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** W3C trace-context propagation (`lib/kpipe-tracing/.../Tracer.java:
  * 31-111` capability): extract `traceparent` from Kafka headers on
  * consume, inject on produce/DLQ. Pure column expressions — no tracing
  * SDK needed for the wire contract; an OTel-backed exporter can hang
  * off the extracted ids.
  *
  * traceparent format: `00-{32 hex trace-id}-{16 hex span-id}-{2 hex flags}`.
  */
object Tracing {

  val TraceparentHeader = "traceparent"

  /** Extract the traceparent header value (string, null if absent).
    * `get` (0-based) rather than `element_at`: null-safe on empty
    * arrays under ANSI mode.
    */
  def extractTraceparent(headers: Column): Column =
    get(
      transform(
        filter(headers, h => h.getField("key") === TraceparentHeader),
        h => h.getField("value").cast("string")),
      lit(0))

  /** Parsed components for span correlation. */
  def traceId(traceparent: Column): Column =
    regexp_extract(traceparent, "^[0-9a-f]{2}-([0-9a-f]{32})-", 1)
  def parentSpanId(traceparent: Column): Column =
    regexp_extract(traceparent, "^[0-9a-f]{2}-[0-9a-f]{32}-([0-9a-f]{16})-", 1)

  /** New deterministic child traceparent: same trace-id, new span-id
    * derived from (trace-id, partition, offset) — unique per record,
    * reproducible across batch retries (an at-least-once retry re-emits
    * the same span rather than forking the trace).
    */
  def childTraceparent(traceparent: Column, partition: Column, offset: Column): Column = {
    val tid = traceId(traceparent)
    val spanId = substring(md5(concat_ws("-", tid, partition.cast("string"),
      offset.cast("string"))), 1, 16)
    when(traceparent.isNotNull,
      concat(lit("00-"), tid, lit("-"), spanId, lit("-01")))
      .otherwise(lit(null).cast("string"))
  }

  /** Headers column with the traceparent replaced/appended for produce
    * (`KPipeProducer` injects trace headers on send).
    */
  def injectTraceparent(headers: Column, traceparent: Column): Column = {
    val without = filter(
      coalesce(headers, array().cast("array<struct<key:string,value:binary>>")),
      h => h.getField("key") =!= TraceparentHeader)
    when(traceparent.isNotNull,
      concat(without, array(struct(
        lit(TraceparentHeader).as("key"),
        traceparent.cast("binary").as("value")))))
      .otherwise(without)
  }
}
