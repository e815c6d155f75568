package graft.formats

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Wire-format decode tests against the A2 Customer fixture shape
  * (proto3: nested message, repeated string, map<string,string>; two
  * top-level messages so the Confluent message-index list is
  * non-trivial).
  */
class ProtoCodecSpec extends SparkSpec {
  import ProtoCodec._
  import spark.implicits._

  // message Address { string street=1; string city=2; string zip=3; string country=4; }
  val addressDesc: MessageDescriptor = MessageDescriptor("Address", Seq(
    FieldDescriptor(1, "street", PString),
    FieldDescriptor(2, "city", PString),
    FieldDescriptor(3, "zip", PString),
    FieldDescriptor(4, "country", PString)))

  // message Customer { int64 id=1; string name=2; string email=3;
  //   bool active=4; Address address=5; repeated string tags=6;
  //   map<string,string> preferences=7; double score=8; sint64 delta=9;
  //   repeated int32 codes=10 (packed); }
  val customerDesc: MessageDescriptor = MessageDescriptor("Customer", Seq(
    FieldDescriptor(1, "id", PInt64),
    FieldDescriptor(2, "name", PString),
    FieldDescriptor(3, "email", PString),
    FieldDescriptor(4, "active", PBool),
    FieldDescriptor(5, "address", PMessage(addressDesc)),
    FieldDescriptor(6, "tags", PString, repeated = true),
    FieldDescriptor(7, "preferences", PMap(PString, PString)),
    FieldDescriptor(8, "score", PDouble),
    FieldDescriptor(9, "delta", PSInt64),
    FieldDescriptor(10, "codes", PInt32, repeated = true)))

  import Writer._

  private def addressBytes(city: String): Array[Byte] =
    stringField(1, "1 Main St") ++ stringField(2, city) ++
      stringField(3, "00000") ++ stringField(4, "US")

  private def customerBytes: Array[Byte] =
    varintField(1, 42L) ++
      stringField(2, "Ada") ++
      stringField(3, "ada@x") ++
      boolField(4, true) ++
      messageField(5, addressBytes("Lisbon")) ++
      stringField(6, "vip") ++ stringField(6, "eu") ++
      mapEntry(7, stringField(1, "lang"), stringField(2, "pt")) ++
      doubleField(8, 2.5) ++
      sintField(9, -7L) ++
      bytesField(10, ConfluentEnvelope.writeVarint(1) ++
        ConfluentEnvelope.writeVarint(2) ++ ConfluentEnvelope.writeVarint(3))

  test("decode full message: scalars, nested, repeated, map, packed") {
    val row = Seq(customerBytes).toDF("value")
      .select(from_protobuf(col("value"), customerDesc).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[Long]("id") === 42L)
    assert(row.getAs[String]("name") === "Ada")
    assert(row.getAs[Boolean]("active") === true)
    assert(row.getAs[Row]("address").getAs[String]("city") === "Lisbon")
    assert(row.getAs[Seq[String]]("tags") === Seq("vip", "eu"))
    assert(row.getAs[Map[String, String]]("preferences") === Map("lang" -> "pt"))
    assert(row.getAs[Double]("score") === 2.5)
    assert(row.getAs[Long]("delta") === -7L)
    assert(row.getAs[Seq[Int]]("codes") === Seq(1, 2, 3))
  }

  test("proto3 defaults: absent fields decode to zero values") {
    val minimal = varintField(1, 1L)
    val row = Seq(minimal).toDF("value")
      .select(from_protobuf(col("value"), customerDesc).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[String]("name") === "")
    assert(row.getAs[Boolean]("active") === false)
    assert(row.getAs[Row]("address") == null)
    assert(row.getAs[Seq[String]]("tags") === Seq.empty)
    assert(row.getAs[Map[String, String]]("preferences") === Map.empty)
    assert(row.getAs[Double]("score") === 0.0)
  }

  test("unknown fields are skipped (forward compatibility)") {
    val withUnknown = customerBytes ++ varintField(99, 123L) ++
      stringField(100, "future") ++ doubleField(101, 9.9)
    val row = Seq(withUnknown).toDF("value")
      .select(from_protobuf(col("value"), customerDesc).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[Long]("id") === 42L)
    assert(row.getAs[Seq[String]]("tags") === Seq("vip", "eu"))
  }

  test("malformed bytes → null (Result convention)") {
    val rows = Seq(Array[Byte](0x0A, 0x7F), customerBytes).toDF("value")
      .select(from_protobuf(col("value"), customerDesc).as("c"))
      .collect()
    assert(rows(0).getAs[Row]("c") == null)
    assert(rows(1).getAs[Row]("c") != null)
  }

  test("encode: canonical round trip — encode(decode(bytes)) == bytes, defaults omitted") {
    // the fixture is written in field order with no default values, so
    // canonical re-encode must be byte-identical
    val out = Seq(customerBytes).toDF("value")
      .select(to_protobuf(from_protobuf(col("value"), customerDesc), customerDesc).as("pb"))
      .collect().head.getAs[Array[Byte]]("pb")
    assert(out.toSeq === customerBytes.toSeq)
    // a message of nothing but proto3 defaults re-encodes to just the
    // non-default field (canonical emission omits defaults)
    val minimal = varintField(1, 1L)
    val outMin = Seq(minimal).toDF("value")
      .select(to_protobuf(from_protobuf(col("value"), customerDesc), customerDesc).as("pb"))
      .collect().head.getAs[Array[Byte]]("pb")
    assert(outMin.toSeq === minimal.toSeq)
  }

  test("Confluent envelope: shorthand index selects message [0]") {
    val enveloped = ConfluentEnvelope.wrap(55, Array[Byte](0) ++ customerBytes)
    val row = Seq(enveloped).toDF("value")
      .select(from_protobuf_sr(col("value"),
        Map(List(0) -> customerDesc, List(1) -> addressDesc)).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[Long]("id") === 42L)
  }

  test("Confluent envelope: explicit index path dispatch + bad envelope → null") {
    // index list [1] → Address (the second top-level message)
    val idx = ConfluentEnvelope.writeMessageIndexes(List(1))
    val enveloped = ConfluentEnvelope.wrap(55, idx ++ addressBytes("Oslo"))
    val out = Seq(enveloped, Array[Byte](1, 2, 3, 4, 5, 6)).toDF("value")
      .select(from_protobuf_sr(col("value"),
        Map(List(0) -> addressDesc, List(1) -> addressDesc)).as("c"))
      .collect()
    assert(out(0).getAs[Row]("c").getAs[String]("city") === "Oslo")
    assert(out(1).getAs[Row]("c") == null)
  }
}
