package graft.formats

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.spark.sql.functions._

/** Golden-byte Confluent wire-compatibility vectors.
  *
  * The reference proves wire compat by serializing with Confluent's OWN
  * serializers against a mock registry and decoding the result
  * (`lib/kpipe-format-protobuf-confluent/src/test/java/io/github/eschizoid/
  * kpipe/format/protobuf/confluent/ProtobufConfluentWireCompatTest.java:67-105`).
  * Those serializer jars are not on this classpath, so the exact byte
  * streams Confluent's `KafkaProtobufSerializer` / `KafkaAvroSerializer`
  * produce for the same records are committed here as hard-coded
  * literals, derived from the public wire format:
  *
  *  - both: magic `0x00` + 4-byte big-endian schema id;
  *  - protobuf: zig-zag-varint message-index list (single `0x00` is the
  *    documented shorthand for `[0]`), then `message.toByteArray()`;
  *  - Avro: the Avro binary body directly.
  *
  * Earlier suites only round-tripped our encoder against our decoder —
  * self-consistent, so a shared envelope bug in both directions would
  * pass. Against fixed literals it cannot: decode is checked field by
  * field and re-encode must be byte-identical.
  */
class WireCompatSpec extends SparkSpec {
  import spark.implicits._

  // same two-message file as the reference test's twoMessageFile()
  private val catalogProto =
    """syntax = "proto3";
      |package com.kpipe.catalog;
      |message Customer {
      |  int64 id = 1;
      |  string name = 2;
      |}
      |message Order {
      |  int64 order_id = 1;
      |}
      |""".stripMargin

  private lazy val compiled = ProtoParser.compile(catalogProto)

  private val mariano = Array(0x4D, 0x61, 0x72, 0x69, 0x61, 0x6E, 0x6F) // "Mariano"

  /** KafkaProtobufSerializer output for Customer{id=42,name="Mariano"},
    * schema id 1: envelope, `[0]` index shorthand, proto3 body
    * (`08 2A` = field 1 varint 42; `12 07 …` = field 2 len-7 string).
    */
  private val customerWire: Array[Byte] =
    (Array(0x00, 0x00, 0x00, 0x00, 0x01,
      0x00,
      0x08, 0x2A,
      0x12, 0x07) ++ mariano).map(_.toByte)

  /** KafkaProtobufSerializer output for Order{order_id=7}, schema id 2.
    * Order is the SECOND top-level message, so the index list is not
    * shorthand: zig-zag count 1 (`0x02`) + zig-zag index 1 (`0x02`).
    */
  private val orderWire: Array[Byte] =
    Array(0x00, 0x00, 0x00, 0x00, 0x02,
      0x02, 0x02,
      0x08, 0x07).map(_.toByte)

  private val avroCustomerJson =
    """{"type":"record","name":"Customer","namespace":"com.kpipe.catalog",
      |"fields":[{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
      .stripMargin

  /** KafkaAvroSerializer output for {id:42,name:"Mariano"}, schema id 1:
    * envelope + Avro binary (`0x54` = zig-zag varint 42; `0x0E` =
    * zig-zag length 7 + UTF-8 bytes).
    */
  private val avroCustomerWire: Array[Byte] =
    (Array(0x00, 0x00, 0x00, 0x00, 0x01,
      0x54,
      0x0E) ++ mariano).map(_.toByte)

  test("protobuf: first-message Confluent bytes decode (index shorthand) and re-encode byte-identically") {
    val customer = compiled.byName("Customer")
    assert(ConfluentEnvelope.readSchemaId(customerWire) === Some(1))
    val (path, consumed) = ConfluentEnvelope.readMessageIndexes(customerWire)
    assert(path === List(0))
    assert(consumed === 1)
    val body = java.util.Arrays.copyOfRange(
      customerWire, ConfluentEnvelope.PrefixLength + consumed, customerWire.length)
    val row = ProtoCodec.decode(body, customer)
    assert(row.getLong(0) === 42L)
    assert(row.getUTF8String(1).toString === "Mariano")
    val reencoded = ConfluentEnvelope.wrap(1,
      ConfluentEnvelope.writeMessageIndexes(path) ++ ProtoCodec.encode(row, customer))
    assert(reencoded.sameElements(customerWire),
      s"re-encode diverged: ${reencoded.map("%02X".format(_)).mkString(" ")}")
  }

  test("protobuf: second-message Confluent bytes (non-zero index) decode and re-encode byte-identically") {
    val order = compiled.byName("Order")
    assert(ConfluentEnvelope.readSchemaId(orderWire) === Some(2))
    val (path, consumed) = ConfluentEnvelope.readMessageIndexes(orderWire)
    assert(path === List(1))
    assert(consumed === 2)
    val body = java.util.Arrays.copyOfRange(
      orderWire, ConfluentEnvelope.PrefixLength + consumed, orderWire.length)
    val row = ProtoCodec.decode(body, order)
    assert(row.getLong(0) === 7L)
    val reencoded = ConfluentEnvelope.wrap(2,
      ConfluentEnvelope.writeMessageIndexes(path) ++ ProtoCodec.encode(row, order))
    assert(reencoded.sameElements(orderWire),
      s"re-encode diverged: ${reencoded.map("%02X".format(_)).mkString(" ")}")
  }

  test("protobuf: column-level SR decode dispatches the golden bytes") {
    val customer = compiled.byName("Customer")
    val out = Seq(customerWire).toDF("value")
      .select(ProtoCodec.from_protobuf_sr(col("value"),
        Map(List(0) -> customer)).as("c"))
      .select(col("c.id"), col("c.name"))
      .as[(Long, String)].head()
    assert(out === ((42L, "Mariano")))
  }

  test("avro: Confluent bytes decode and re-encode byte-identically") {
    val schema = new Schema.Parser().parse(avroCustomerJson)
    assert(ConfluentEnvelope.readSchemaId(avroCustomerWire) === Some(1))
    val body = java.util.Arrays.copyOfRange(
      avroCustomerWire, ConfluentEnvelope.PrefixLength, avroCustomerWire.length)
    val rec = AvroCodec.deserialize(body, schema, schema)
    assert(rec.get("id") === 42L)
    assert(rec.get("name").toString === "Mariano")
    val reencoded = ConfluentEnvelope.wrap(1, AvroCodec.serialize(rec, schema))
    assert(reencoded.sameElements(avroCustomerWire),
      s"re-encode diverged: ${reencoded.map("%02X".format(_)).mkString(" ")}")
  }

  test("avro: column-level SR decode resolves the golden bytes by schema id") {
    val out = Seq(avroCustomerWire).toDF("value")
      .select(ConfluentAvro.from_avro_sr(col("value"), avroCustomerJson,
        MapSchemaResolver(Map(1 -> avroCustomerJson))).as("c"))
      .select(col("c.id"), col("c.name"))
      .as[(Long, String)].head()
    assert(out === ((42L, "Mariano")))
  }

  // ------------------------------------------------------------------ //
  // oneof golden vectors                                                //
  // ------------------------------------------------------------------ //

  private val eventProto =
    """syntax = "proto3";
      |message Event {
      |  int64 id = 1;
      |  oneof payload {
      |    string note = 2;
      |    int64 amount = 3;
      |  }
      |}
      |""".stripMargin
  private lazy val eventDesc = ProtoParser.compile(eventProto).byName("Event")

  /** KafkaProtobufSerializer output for Event{id=5, note="hi"}, schema
    * id 9: envelope, `[0]` shorthand, `08 05` (field 1 varint 5),
    * `12 02 68 69` (field 2 len-2 "hi").
    */
  private val eventNoteWire: Array[Byte] =
    Array(0x00, 0x00, 0x00, 0x00, 0x09,
      0x00,
      0x08, 0x05,
      0x12, 0x02, 0x68, 0x69).map(_.toByte)

  /** Event{id=5, amount=0}: the set branch carries the TYPE DEFAULT —
    * protobuf still emits `18 00` (field 3 varint 0) because oneof
    * members have presence semantics; that byte pair is exactly what
    * distinguishes "amount set to 0" from "nothing set".
    */
  private val eventAmountZeroWire: Array[Byte] =
    Array(0x00, 0x00, 0x00, 0x00, 0x09,
      0x00,
      0x08, 0x05,
      0x18, 0x00).map(_.toByte)

  test("protobuf oneof: set-branch bytes decode with the which tag and re-encode byte-identically") {
    val body = java.util.Arrays.copyOfRange(
      eventNoteWire, ConfluentEnvelope.PrefixLength + 1, eventNoteWire.length)
    val row = ProtoCodec.decode(body, eventDesc)
    assert(row.getLong(0) === 5L)
    assert(row.getUTF8String(1).toString === "hi")          // note: the set branch
    assert(row.isNullAt(2), "unset oneof member must be null, not the proto3 default")
    assert(row.getUTF8String(3).toString === "note")        // which_payload
    val reencoded = ConfluentEnvelope.wrap(9,
      ConfluentEnvelope.writeMessageIndexes(List(0)) ++ ProtoCodec.encode(row, eventDesc))
    assert(reencoded.sameElements(eventNoteWire),
      s"re-encode diverged: ${reencoded.map("%02X".format(_)).mkString(" ")}")
  }

  test("protobuf oneof: branch set to the default value keeps presence through the round trip") {
    val body = java.util.Arrays.copyOfRange(
      eventAmountZeroWire, ConfluentEnvelope.PrefixLength + 1, eventAmountZeroWire.length)
    val row = ProtoCodec.decode(body, eventDesc)
    assert(row.isNullAt(1))
    assert(row.getLong(2) === 0L)                           // set, AT the default
    assert(row.getUTF8String(3).toString === "amount")
    // re-encode must keep the 18 00 bytes a plain singular field would
    // canonically omit — dropping them would flip which_payload to null
    // on the next decode
    val reencoded = ConfluentEnvelope.wrap(9,
      ConfluentEnvelope.writeMessageIndexes(List(0)) ++ ProtoCodec.encode(row, eventDesc))
    assert(reencoded.sameElements(eventAmountZeroWire),
      s"re-encode diverged: ${reencoded.map("%02X".format(_)).mkString(" ")}")
  }

  test("protobuf oneof: no branch set → null members, null which tag") {
    val row = ProtoCodec.decode(Array[Byte](0x08, 0x05), eventDesc)
    assert(row.getLong(0) === 5L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("protobuf oneof: last branch on the wire wins") {
    // note="hi" then amount=7: proto3 keeps only the LAST member seen
    val bytes = Array[Byte](0x12, 0x02, 0x68, 0x69, 0x18, 0x07)
    val row = ProtoCodec.decode(bytes, eventDesc)
    assert(row.isNullAt(1))
    assert(row.getLong(2) === 7L)
    assert(row.getUTF8String(3).toString === "amount")
  }

  test("message-index shorthand: [0] encodes as the single 0x00 byte") {
    assert(ConfluentEnvelope.writeMessageIndexes(List(0)).sameElements(Array[Byte](0x00)))
    // and a non-[0] list never uses the shorthand
    assert(ConfluentEnvelope.writeMessageIndexes(List(1)).sameElements(Array[Byte](0x02, 0x02)))
  }
}
