package graft.formats

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Round-trip + edge-case tests for the custom Avro expressions against
  * the A1 Customer fixture shape (FIXTURES.md: nested record, nullable
  * union, array, map).
  */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  val customerSchemaJson: String =
    """{
      |  "type": "record", "name": "Customer", "namespace": "com.kpipe.customer",
      |  "fields": [
      |    {"name": "id", "type": "long"},
      |    {"name": "name", "type": "string"},
      |    {"name": "email", "type": ["null", "string"], "default": null},
      |    {"name": "active", "type": "boolean", "default": true},
      |    {"name": "registrationDate", "type": "long"},
      |    {"name": "address", "type": ["null", {"type": "record", "name": "Address",
      |      "fields": [
      |        {"name": "street", "type": "string"}, {"name": "city", "type": "string"},
      |        {"name": "zipCode", "type": "string"}, {"name": "country", "type": "string"}]}],
      |      "default": null},
      |    {"name": "tags", "type": {"type": "array", "items": "string"}, "default": []},
      |    {"name": "preferences", "type": {"type": "map", "values": "string"}, "default": {}}
      |  ]
      |}""".stripMargin

  private lazy val avroSchema = new Schema.Parser().parse(customerSchemaJson)

  private def customerBytes(id: Long, name: String, email: Option[String],
                            city: Option[String], tags: Seq[String],
                            prefs: Map[String, String]): Array[Byte] = {
    val rec = new GenericData.Record(avroSchema)
    rec.put("id", id)
    rec.put("name", name)
    rec.put("email", email.orNull)
    rec.put("active", true)
    rec.put("registrationDate", 1723400000000L)
    city.foreach { c =>
      val addrSchema = avroSchema.getField("address").schema().getTypes.asScala
        .find(_.getType == Schema.Type.RECORD).get
      val addr = new GenericData.Record(addrSchema)
      addr.put("street", "1 Main St"); addr.put("city", c)
      addr.put("zipCode", "00000"); addr.put("country", "US")
      rec.put("address", addr)
    }
    rec.put("tags", tags.asJava)
    rec.put("preferences", prefs.asJava)
    AvroCodec.serialize(rec, avroSchema)
  }

  test("sparkType maps the fixture schema to the documented StructType") {
    val st = AvroCodec.sparkType(avroSchema).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq === Seq("id", "name", "email", "active",
      "registrationDate", "address", "tags", "preferences"))
    assert(st("email").nullable)
    assert(!st("id").nullable)
  }

  test("decode: full record with nested address, tags, preferences") {
    val bytes = customerBytes(7L, "Ada", Some("ada@example.com"), Some("Lisbon"),
      Seq("vip", "eu"), Map("lang" -> "pt"))
    val row = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), customerSchemaJson).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[Long]("id") === 7L)
    assert(row.getAs[String]("name") === "Ada")
    assert(row.getAs[String]("email") === "ada@example.com")
    assert(row.getAs[Row]("address").getAs[String]("city") === "Lisbon")
    assert(row.getAs[Seq[String]]("tags") === Seq("vip", "eu"))
    assert(row.getAs[Map[String, String]]("preferences") === Map("lang" -> "pt"))
  }

  test("decode: null union branches decode to null columns") {
    val bytes = customerBytes(1L, "Bo", None, None, Nil, Map.empty)
    val row = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), customerSchemaJson).as("c"))
      .select("c.*").collect().head
    assert(row.isNullAt(row.fieldIndex("email")))
    assert(row.isNullAt(row.fieldIndex("address")))
  }

  test("decode: malformed bytes → null, row survives (Result convention)") {
    val good = customerBytes(2L, "Cy", None, None, Nil, Map.empty)
    val rows = Seq(good, Array[Byte](1, 2, 3)).toDF("value")
      .select(AvroCodec.from_avro(col("value"), customerSchemaJson).as("c"))
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Row]("c") != null)
    assert(rows(1).getAs[Row]("c") == null)
  }

  test("encode round-trips through decode") {
    val bytes = customerBytes(9L, "Eve", Some("e@x"), Some("Oslo"), Seq("t1"), Map("k" -> "v"))
    val df = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), customerSchemaJson).as("c"))
      .select(AvroCodec.to_avro(col("c"), customerSchemaJson).as("re"))
      .select(AvroCodec.from_avro(col("re"), customerSchemaJson).as("c2"))
      .select("c2.*")
    val row = df.collect().head
    assert(row.getAs[Long]("id") === 9L)
    assert(row.getAs[Row]("address").getAs[String]("city") === "Oslo")
    assert(row.getAs[Map[String, String]]("preferences") === Map("k" -> "v"))
  }

  test("SR mode: per-record schema-id dispatch with schema evolution") {
    // writer v1 lacks the email field; writer v2 = reader schema
    val v1Json = customerSchemaJson.replace(
      """{"name": "email", "type": ["null", "string"], "default": null},""", "")
    val v1 = new Schema.Parser().parse(v1Json)
    val recV1 = new GenericData.Record(v1)
    recV1.put("id", 5L); recV1.put("name", "Old"); recV1.put("active", false)
    recV1.put("registrationDate", 1L)
    recV1.put("tags", Seq.empty[String].asJava)
    recV1.put("preferences", Map.empty[String, String].asJava)
    val v1Bytes = ConfluentEnvelope.wrap(101, AvroCodec.serialize(recV1, v1))
    val v2Bytes = ConfluentEnvelope.wrap(102,
      customerBytes(6L, "New", Some("n@x"), None, Nil, Map.empty))

    val resolver = new CachedSchemaResolver(MapSchemaResolver(Map(
      101 -> v1Json, 102 -> customerSchemaJson)))
    val rows = Seq(v1Bytes, v2Bytes, Array[Byte](9, 9)).toDF("value")
      .select(ConfluentAvro.from_avro_sr(col("value"), customerSchemaJson, resolver).as("c"))
      .collect()
    // v1 record: email resolves to reader default null
    assert(rows(0).getAs[Row]("c").getAs[Long]("id") === 5L)
    assert(rows(0).getAs[Row]("c").isNullAt(2))
    assert(rows(1).getAs[Row]("c").getAs[String]("email") === "n@x")
    assert(rows(2).getAs[Row]("c") == null)   // no envelope → null
  }

  test("logical types: timestamp-millis/micros, date, decimal round through") {
    val schemaJson =
      """{"type":"record","name":"L","fields":[
        |{"name":"ts_ms","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"ts_us","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"amt","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}}
        |]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    val st = AvroCodec.sparkType(schema).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st("ts_ms").dataType.typeName === "timestamp")
    assert(st("ts_us").dataType.typeName === "timestamp")
    assert(st("d").dataType.typeName === "date")
    assert(st("amt").dataType.typeName === "decimal(10,2)")

    val rec = new GenericData.Record(schema)
    rec.put("ts_ms", 1723400000123L)                      // ms
    rec.put("ts_us", 1723400000123456L)                   // µs
    rec.put("d", 19900)                                   // days since epoch
    rec.put("amt", java.nio.ByteBuffer.wrap(BigInt(123456).toByteArray))  // 1234.56
    val bytes = AvroCodec.serialize(rec, schema)
    val row = Seq(bytes).toDF("value")
      .select(AvroCodec.from_avro(col("value"), schemaJson).as("r"))
      .select("r.*").collect().head
    assert(row.getAs[java.sql.Timestamp]("ts_ms").getTime === 1723400000123L)
    assert(row.getAs[java.sql.Timestamp]("ts_us").getTime === 1723400000123L)  // ms precision of getTime
    assert(row.getAs[java.sql.Date]("d").toLocalDate ===
      java.time.LocalDate.ofEpochDay(19900))
    assert(row.getAs[java.math.BigDecimal]("amt") ===
      new java.math.BigDecimal("1234.56"))
  }

  test("cached resolver counts hits and misses, caches by id") {
    val resolver = new CachedSchemaResolver(MapSchemaResolver(Map(1 -> "\"int\"")))
    assert(resolver.lookupById(1) === "\"int\"")
    assert(resolver.lookupById(1) === "\"int\"")
    assert(resolver.lookupById(2) === null)
    assert(resolver.hits === 1)
    assert(resolver.misses === 2)   // first id-1 lookup + id-2
    assert(resolver.size === 1)
  }

  test("registry response schema-field unwrap handles escapes") {
    val r = HttpSchemaResolver("http://unused")
    assert(r.unwrapSchemaField("""{"schema": "\"int\""}""") === "\"int\"")
    assert(r.unwrapSchemaField("""{"id": 1, "schema": "{\"type\": \"record\"}"}""")
      === """{"type": "record"}""")
    assert(r.unwrapSchemaField("""{"nope": 1}""") === null)
  }
}
