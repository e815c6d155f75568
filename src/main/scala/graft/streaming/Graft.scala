package graft.streaming

import graft.formats._
import graft.ops.Pipeline
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fluent entry points — the `KPipe.json/avro/protobuf/bytes/custom/
  * multi` surface (`lib/kpipe-api/.../KPipe.java:47-272`) over a
  * Kafka-shaped DataFrame (from [[KafkaShape.source]] in production,
  * `MemoryStream[KafkaRecord]` in tests; batch DataFrames with the same
  * columns work identically — batch and streaming share the operator
  * layer).
  *
  * Each factory decodes `value` into a typed `res = struct(value,
  * error)` Result column and returns a [[graft.ops.Pipeline]]; the
  * failed branch routes to [[Dlq]], terminal sinks live in [[Sinks]].
  */
object Graft {

  /** JSON payloads (`KPipe.json`). */
  def json(records: DataFrame, schemaDdl: String): Pipeline =
    Pipeline(Json.decodeResultDF(records, col("value").cast("string"), schemaDdl, "res"))

  /** Static-schema Avro (`KPipe.avro`). */
  def avro(records: DataFrame, schemaJson: String): Pipeline =
    withResult(records, AvroCodec.from_avro(col("value"), schemaJson),
      "avro decode failed")

  /** Schema-registry Avro (`KPipe.avro` SR mode): per-record schema-id
    * dispatch with schema evolution to the reader schema.
    */
  def avroSR(records: DataFrame, readerSchemaJson: String,
             resolver: SchemaResolver): Pipeline =
    withResult(records,
      ConfluentAvro.from_avro_sr(col("value"), readerSchemaJson, resolver),
      "avro SR decode failed")

  /** Static-descriptor protobuf (`KPipe.protobuf`). */
  def protobuf(records: DataFrame, desc: ProtoCodec.MessageDescriptor): Pipeline =
    withResult(records, ProtoCodec.from_protobuf(col("value"), desc),
      "protobuf decode failed")

  /** Schema-registry protobuf: `.proto` source compiled to descriptors,
    * message-index dispatch.
    */
  def protobufSR(records: DataFrame, protoSource: String): Pipeline = {
    val compiled = ProtoParser.compile(protoSource)
    withResult(records,
      ProtoCodec.from_protobuf_sr(col("value"), compiled.byIndexPath),
      "protobuf SR decode failed")
  }

  /** Raw passthrough (`KPipe.bytes`). */
  def bytes(records: DataFrame): Pipeline =
    Pipeline(records.withColumn("res",
      struct(col("value").as("value"), lit(null).cast("string").as("error"))))

  /** User codec (`KPipe.custom`): any `binary → T` column decoder;
    * null output on non-null input counts as a decode failure.
    */
  def custom(records: DataFrame, decoder: Column => Column): Pipeline =
    withResult(records, decoder(col("value")), "custom decode failed")

  /** CBOR value decode ([[graft.formats.CborCodec]], RFC 8949 core) to
    * the deterministic JSON rendering, then the given schema through
    * the JSON path — CBOR topics get the same Result-column error
    * capture as JSON ones (a null rendering = out-of-subset/poison
    * bytes = error row, never a crash).
    */
  def cbor(records: DataFrame, schemaDdl: String): Pipeline = {
    val render = udf((b: Array[Byte]) =>
      graft.formats.CborCodec.toJson(graft.formats.CborCodec.decode(b)))
    json(records.withColumn("value",
      encode(coalesce(render(col("value")), lit("not valid CBOR")), "UTF-8")),
      schemaDdl)
  }

  /** Fixed wire-prefix strip before decode (`Stream.skipBytes`);
    * compose as `Graft.avro(Graft.skipBytes(df, 5), schema)`.
    */
  def skipBytes(records: DataFrame, n: Int): DataFrame =
    records.withColumn("value", ConfluentEnvelope.skipBytes(col("value"), n))

  /** Heterogeneous per-topic routes (`KPipe.multi`): one source, one
    * configured pipeline per topic.
    */
  def multi(records: DataFrame, routes: Map[String, DataFrame => DataFrame])
      : Map[String, DataFrame] =
    KafkaShape.routes(records, routes)

  /** Decode once into an intermediate attribute, then build the Result
    * struct — the decode expressions are CodegenFallback (no
    * subexpression elimination), so referencing them twice would run
    * the decode twice per record (see Json.decodeResultDF).
    */
  private def withResult(records: DataFrame, decoded: Column, diag: String): Pipeline = {
    val p = col("__decoded")
    Pipeline(records
      .withColumn("__decoded", graft.formats.DecodeBarrier(decoded))
      .withColumn("res", struct(
        p.as("value"),
        when(col("value").isNotNull && p.isNull, lit(diag))
          .otherwise(lit(null).cast("string")).as("error")))
      .drop("__decoded"))
  }
}
