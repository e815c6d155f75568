package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The Kafka record shape and source construction.
  *
  * Rows carry the exact columns Spark's Kafka source emits
  * (`spark.readStream.format("kafka")`, `includeHeaders=true`), which is
  * also the shape every operator in this package keys on. The test seam
  * is a `MemoryStream[KafkaRecord]` producing the same schema — the
  * analog of the reference's `withConsumer(Supplier<Consumer>)` seam
  * (`KPipeConsumerBuilder.java:362-365`) and its `TestStream` kit.
  */
object KafkaShape {

  /** Typed row mirroring the Kafka source schema. */
  final case class Header(key: String, value: Array[Byte])
  final case class KafkaRecord(
      key: Array[Byte],
      value: Array[Byte],
      topic: String,
      partition: Int,
      offset: Long,
      timestamp: java.sql.Timestamp,
      timestampType: Int,
      headers: Seq[Header])

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** Source configuration — kpipe's consumer-wide settings mapped to
    * Kafka-source options. Backpressure is admission control per
    * micro-batch (`maxOffsetsPerTrigger`), replacing the reference's
    * in-flight watermark machinery (`BackpressureController.java:24-136`).
    */
  final case class SourceConfig(
      topics: Seq[String],
      bootstrapServers: String = "localhost:9092",
      maxOffsetsPerTrigger: Option[Long] = None,   // backpressure high-watermark analog
      minOffsetsPerTrigger: Option[Long] = None,
      maxTriggerDelayMs: Option[Long] = None,
      startingOffsets: String = "latest",
      failOnDataLoss: Boolean = true,
      includeHeaders: Boolean = true) {

    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString,
      "includeHeaders" -> includeHeaders.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      minOffsetsPerTrigger.map("minOffsetsPerTrigger" -> _.toString) ++
      maxTriggerDelayMs.map(ms => "maxTriggerDelay" -> s"${ms}ms")
  }

  /** Build the streaming source. Requires the spark-sql-kafka connector
    * on the classpath at deploy time; tests drive the same downstream
    * plan through `MemoryStream[KafkaRecord]` instead.
    */
  def source(spark: SparkSession, config: SourceConfig): DataFrame =
    config.options.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Per-topic route split for `KPipe.multi`
    * (`MultiBuilder.java:209-314`): one source, one filtered branch per
    * routed topic; unrouted topics simply match no branch
    * (drop-and-commit comes free from the micro-batch barrier).
    */
  def routes(stream: DataFrame, topicPipelines: Map[String, DataFrame => DataFrame])
      : Map[String, DataFrame] = {
    import org.apache.spark.sql.functions.col
    topicPipelines.map { case (topic, pipeline) =>
      topic -> pipeline(stream.filter(col("topic") === topic))
    }
  }
}
