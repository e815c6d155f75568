package graft.streaming

import graft.SparkSpec
import graft.formats._
import graft.streaming.KafkaShape.{Header, KafkaRecord}
import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The fluent entry surface: every KPipe factory decodes into the
  * Result column over the same Kafka-shaped rows, batch or streaming.
  */
class GraftSpec extends SparkSpec {
  import spark.implicits._

  private def rec(topic: String, value: Array[Byte]): KafkaRecord =
    KafkaRecord("k".getBytes, value, topic, 0, 0L,
      new java.sql.Timestamp(1723400000000L), 0, Seq(Header("h", "v".getBytes)))

  test("json entry: decode + pipeline chain + filtered/failed routing") {
    val df = Seq(
      rec("t", """{"k": 5}""".getBytes),
      rec("t", """{"k": 1}""".getBytes),
      rec("t", "bad".getBytes)).toDF()
    val out = Graft.json(df, "k BIGINT")
      .filter(col("res.error").isNotNull || col("res.value.k") > 2)
      .toDF
    val (passed, failed) = Dlq.split(out, col("res.error"))
    assert(passed.select("res.value.k").as[Long].collect().toSeq === Seq(5L))
    assert(failed.count() === 1)
  }

  test("avro entry: static schema decode") {
    val schemaJson =
      """{"type":"record","name":"E","fields":[{"name":"id","type":"long"}]}"""
    val schema = new Schema.Parser().parse(schemaJson)
    val r = new GenericData.Record(schema); r.put("id", 42L)
    // 0x80 = truncated varint — a lone 0x01 would be a VALID encoding
    // of {id: -1} (Avro binary has no framing)
    val df = Seq(rec("t", AvroCodec.serialize(r, schema)),
      rec("t", Array[Byte](0x80.toByte))).toDF()
    val out = Graft.avro(df, schemaJson).toDF
    val rows = out.select(col("res.value.id"), col("res.error")).collect()
    assert(rows(0).getAs[Long]("id") === 42L && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getAs[String]("error").contains("avro"))
  }

  test("avroSR entry: enveloped records with resolver dispatch") {
    val schemaJson =
      """{"type":"record","name":"E","fields":[{"name":"id","type":"long"}]}"""
    val schema = new Schema.Parser().parse(schemaJson)
    val r = new GenericData.Record(schema); r.put("id", 7L)
    val enveloped = ConfluentEnvelope.wrap(31, AvroCodec.serialize(r, schema))
    val df = Seq(rec("t", enveloped)).toDF()
    val resolver = MapSchemaResolver(Map(31 -> schemaJson))
    val out = Graft.avroSR(df, schemaJson, resolver).toDF
    assert(out.select("res.value.id").as[Long].collect().head === 7L)
  }

  test("protobufSR entry: .proto source text end-to-end") {
    import ProtoCodec.Writer._
    val proto = """syntax = "proto3"; message P { int64 n = 1; }"""
    val body = varintField(1, 99L)
    val bytes = ConfluentEnvelope.wrap(5,
      ConfluentEnvelope.writeMessageIndexes(List(0)) ++ body)
    val out = Graft.protobufSR(Seq(rec("t", bytes)).toDF(), proto).toDF
    assert(out.select("res.value.n").as[Long].collect().head === 99L)
  }

  test("cbor entry: RFC 8949 records decode through the JSON path; poison errors") {
    import graft.formats.CborCodec
    import graft.formats.CborCodec._
    val good = CborCodec.encode(CMap(Vector(
      CText("k") -> CInt(5), CText("who") -> CText("iot-7"))))
    val small = CborCodec.encode(CMap(Vector(CText("k") -> CInt(1))))
    val df = Seq(rec("t", good), rec("t", small),
      rec("t", Array[Byte](0xFF.toByte, 0x00))).toDF()
    val out = Graft.cbor(df, "k BIGINT, who STRING")
      .filter(col("res.error").isNotNull || col("res.value.k") > 2)
      .toDF
    val (passed, failed) = Dlq.split(out, col("res.error"))
    val p = passed.select("res.value.k", "res.value.who").collect()
    assert(p.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((5L, "iot-7")))
    assert(failed.count() === 1)
  }

  test("bytes entry: passthrough, never fails") {
    val df = Seq(rec("t", Array[Byte](1, 2, 3))).toDF()
    val out = Graft.bytes(df).toDF
    assert(out.select("res.value").as[Array[Byte]].collect().head.toSeq === Seq[Byte](1, 2, 3))
    assert(out.where(col("res.error").isNotNull).count() === 0)
  }

  test("skipBytes + custom decoder composition") {
    val df = Seq(rec("t", Array[Byte](9, 9, 9) ++ "{\"k\":1}".getBytes)).toDF()
    val out = Graft.json(Graft.skipBytes(df, 3), "k BIGINT").toDF
    assert(out.select("res.value.k").as[Long].collect().head === 1L)
  }

  test("multi: per-topic heterogeneous pipelines") {
    val df = Seq(
      rec("json-topic", """{"k":1}""".getBytes),
      rec("raw-topic", Array[Byte](7))).toDF()
    val routes = Graft.multi(df, Map(
      "json-topic" -> (d => Graft.json(d, "k BIGINT").toDF),
      "raw-topic" -> (d => Graft.bytes(d).toDF)))
    assert(routes("json-topic").select("res.value.k").as[Long].collect().toSeq === Seq(1L))
    assert(routes("raw-topic").count() === 1)
  }
}
