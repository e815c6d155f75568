package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import scala.jdk.CollectionConverters._

/** Observability surface with the reference's metric names
  * (`ConsumerMetricKeys.java:10-49`, `docs/OBSERVABILITY.md:20-55`):
  * `observe()` named metrics per micro-batch + a listener that folds
  * them into the kpipe snapshot map.
  */
object Metrics {

  val MessagesReceived = "messagesReceived"
  val MessagesProcessed = "messagesProcessed"
  val ProcessingErrors = "processingErrors"
  val PipelinePassed = "pipeline.passed"
  val PipelineFiltered = "pipeline.filtered"
  val PipelineFailed = "pipeline.failed"
  val DlqSent = "dlqSent"

  /** `peekResult`-style passed/filtered/failed counters
    * (`Stream.java:228-240`): `errorCol` non-null = failed,
    * `filteredCol` true = filtered, rest passed. Pure observation —
    * rows flow through unchanged.
    */
  def observeResults[T](ds: Dataset[T], name: String,
                        errorCol: org.apache.spark.sql.Column,
                        filteredCol: org.apache.spark.sql.Column): Dataset[T] =
    ds.observe(name,
      count(lit(1)).as(MessagesReceived),
      count(when(errorCol.isNull && !filteredCol, 1)).as(PipelinePassed),
      count(when(filteredCol, 1)).as(PipelineFiltered),
      count(when(errorCol.isNotNull, 1)).as(PipelineFailed))

  /** Listener accumulating observed metrics into a cumulative snapshot —
    * the `Handle.metrics()` analog (`KPipeConsumer.java:754-782`).
    */
  final class SnapshotListener(observationName: String) extends StreamingQueryListener {
    private val counters = new ConcurrentHashMap[String, Long]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val obs = e.progress.observedMetrics.asScala.get(observationName)
      obs.foreach { row =>
        row.schema.fieldNames.foreach { f =>
          val v = row.getAs[Any](f) match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case _ => 0L
          }
          counters.merge(f, v, (a, b) => a + b)
        }
      }
    }

    def snapshot: Map[String, Long] = counters.asScala.toMap
    def add(key: String, delta: Long): Unit = counters.merge(key, delta, (a, b) => a + b)
  }
}

/** `Handle` lifecycle wrapper (`lib/kpipe-api/.../Handle.java:1-72`) over
  * `StreamingQuery`: health = running and the breaker not OPEN.
  */
final class Handle(val query: StreamingQuery,
                   breaker: Option[CircuitBreaker] = None,
                   listener: Option[Metrics.SnapshotListener] = None) {
  def isHealthy: Boolean =
    query.isActive && !breaker.exists(b => b.currentState == b.Open)
  def metrics: Map[String, Long] = listener.map(_.snapshot).getOrElse(Map.empty)
  def awaitShutdown(): Unit = query.awaitTermination()
  def shutdownGracefully(timeoutMs: Long = 5000): Boolean = {
    // stop() waits for the in-flight micro-batch; checkpoint state is
    // already durable, so no explicit drain phase exists
    query.stop()
    query.awaitTermination(timeoutMs)
  }
  def close(): Unit = query.stop()
}
