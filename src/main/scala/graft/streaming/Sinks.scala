package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink terminals (SURVEY §2.4). The micro-batch is the unit of
  * batching and the delivery guarantee: offsets go to the checkpoint
  * WAL before the batch body runs, the commit marker lands after — so
  * a sink that throws fails the batch and the batch retries whole
  * (at-least-once; exactly-once per sink when the body is idempotent
  * on `batchId`).
  */
object Sinks {

  type RowSink = DataFrame => Unit

  /** `toConsole` (`Stream.java:312-323`). */
  def console(ds: Dataset[_]): DataStreamWriter[_] =
    ds.writeStream.format("console")

  /** `toCustom(MessageSink<T>)` — `foreachBatch` is the preferred
    * per-micro-batch form (`docs/SINKS.md`); per-row `ForeachWriter`
    * exists for strict per-record sinks.
    */
  def custom(ds: Dataset[Row], checkpoint: String)(sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[Row] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: Dataset[Row], id: Long) => sink(df.toDF(), id))

  /** `KafkaMessageSink` — produce processed values to another topic
    * (`lib/kpipe-producer/.../sink/KafkaMessageSink.java:28-109`).
    * Expects `key`/`value` (binary or string) and optional `headers`
    * columns; inject trace context first via `Tracing.injectTraceparent`.
    * Requires the spark-sql-kafka connector at deploy time (not in this
    * distribution — the builder is config-complete and the row shape is
    * tested via the DLQ/record specs).
    */
  def kafka(ds: Dataset[Row], bootstrapServers: String, topic: String,
            checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("includeHeaders", "true")
      .option("checkpointLocation", checkpoint)

  /** `toMulti` — best-effort fan-out (`CompositeMessageSink.java:11-33`,
    * failure matrix `docs/GUARANTEES.md:56`): every sink is attempted,
    * a throwing sink is logged and suppressed, the batch still commits,
    * the DLQ is NOT invoked. The batch is persisted once so N sinks
    * don't recompute the lineage N times.
    *
    * Returns the per-sink failures of the last batch for observability.
    */
  final class MultiSink(sinks: Seq[(String, RowSink)]) extends Serializable {
    private val log = org.slf4j.LoggerFactory.getLogger(getClass)
    @volatile var lastFailures: Map[String, String] = Map.empty

    def apply(df: DataFrame, batchId: Long): Unit = {
      df.persist()
      try {
        val failures = sinks.flatMap { case (name, sink) =>
          try { sink(df); None }
          catch {
            case e: Exception =>
              log.warn(s"multi-sink '$name' failed on batch $batchId (suppressed): ${e.getMessage}")
              Some(name -> e.getMessage)
          }
        }
        lastFailures = failures.toMap
      } finally df.unpersist()
    }
  }

  def multi(sinks: (String, RowSink)*): MultiSink = new MultiSink(sinks)

  /** At-least-once-per-sink alternative: run N independent queries on
    * the same source, one checkpoint each — the reference's own advice
    * for when best-effort isn't enough (`docs/SINKS.md:61-65`).
    */
  def independentQueries(ds: Dataset[Row], checkpointRoot: String,
                         sinks: (String, RowSink)*): Seq[StreamingQuery] =
    sinks.map { case (name, sink) =>
      ds.writeStream
        .option("checkpointLocation", s"$checkpointRoot/$name")
        .foreachBatch((df: Dataset[Row], _: Long) => sink(df.toDF()))
        .queryName(name)
        .start()
    }

  /** `toBatch(BatchSink, BatchPolicy)` (`Stream.java:332-358`,
    * `BatchPolicy.java:11-31`): the flush unit is the micro-batch, so
    * maxSize maps to source admission (`maxOffsetsPerTrigger`) and
    * maxAge to the processing-time trigger.
    */
  final case class BatchPolicy(maxSize: Long = 500, maxAgeMs: Long = 2000) {
    def trigger: Trigger = Trigger.ProcessingTime(maxAgeMs)
    def sourceOptions: Map[String, String] =
      Map("maxOffsetsPerTrigger" -> maxSize.toString)
  }

  /** Per-record outcome of a batch sink (`BatchResult.java:28-70`). */
  sealed trait RecordOutcome
  case object Ok extends RecordOutcome
  final case class Failed(reason: String) extends RecordOutcome

  /** Batch sink with per-record outcomes and the coverage contract
    * (`BatchPipelineWrapper.java:167-255`): the sink reports an outcome
    * per input row; rows it does not account for become synthetic
    * failures (→ DLQ branch), so a buggy sink cannot silently drop
    * records. Runs inside foreachBatch; rows flow per partition, never
    * to the driver, and are flushed to the sink in `maxChunk`-row
    * chunks — peak executor buffering is maxChunk rows, so a skewed
    * 10 M-row partition never materializes as one Vector (the reference
    * flushes at `maxSize` the same way). Outcome indices are relative
    * to the chunk the sink was called with.
    */
  def batchWithOutcomes(batch: DataFrame,
                        sink: Seq[Row] => Map[Int, RecordOutcome],
                        onFailure: (Row, String) => Unit,
                        maxChunk: Int = 500): Unit = {
    batch.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(maxChunk).foreach { chunk =>
        val outcomes = sink(chunk)
        chunk.indices.foreach { i =>
          outcomes.get(i) match {
            case Some(Ok) => ()
            case Some(Failed(reason)) => onFailure(chunk(i), reason)
            case None => onFailure(chunk(i),
              "batch sink did not account for record (coverage contract)")
          }
        }
      }
    }
  }

  /** `BatchSink.ofVoid` — whole-batch success-on-return / all-fail-on-
    * throw (`BatchSink.java:62-73`).
    */
  def ofVoid(consumer: Seq[Row] => Unit): Seq[Row] => Map[Int, RecordOutcome] =
    rows => {
      consumer(rows)
      rows.indices.map(_ -> (Ok: RecordOutcome)).toMap
    }

  /** Retry helper for transient sink failures inside a batch body
    * (`RecordProcessor.java:264-301` fixed-backoff semantics; attempts
    * recompute from the immutable batch, the "retry from raw bytes"
    * property for free).
    */
  def withRetry[T](maxRetries: Int, backoffMs: Long = 500)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
