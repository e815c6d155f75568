package graft.formats

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Compile the A2 customer.proto shape from source text and decode real
  * wire bytes with the compiled descriptors — the full SR-protobuf path
  * (source text → descriptor → message-index dispatch → decode).
  */
class ProtoParserSpec extends SparkSpec {
  import ProtoCodec._
  import spark.implicits._

  val customerProto: String =
    """// mirror of the reference test fixture (two top-level messages)
      |syntax = "proto3";
      |package com.kpipe.customer;
      |option java_multiple_files = true;
      |
      |message Customer {
      |  int64 id = 1;
      |  string name = 2;
      |  string email = 3;
      |  bool active = 4;
      |  Address address = 5;          // forward reference
      |  repeated string tags = 6;
      |  map<string, string> preferences = 7;
      |  reserved 8, 9;
      |}
      |
      |message Address {
      |  string street = 1;
      |  string city = 2;
      |  string zip_code = 3;
      |  string country = 4;
      |}
      |""".stripMargin

  test("compiles two top-level messages with resolved cross-reference") {
    val c = ProtoParser.compile(customerProto)
    assert(c.topLevel.map(_.name) === List("Customer", "Address"))
    val cust = c.byName("Customer")
    assert(cust.fields.map(_.name) ===
      Seq("id", "name", "email", "active", "address", "tags", "preferences"))
    assert(cust.byNumber(5).ptype.isInstanceOf[PMessage])
    assert(cust.byNumber(7).ptype === PMap(PString, PString))
    assert(c.byIndexPath(List(0)).name === "Customer")
    assert(c.byIndexPath(List(1)).name === "Address")
  }

  test("nested messages get nested index paths") {
    val src =
      """syntax = "proto3";
        |message Outer {
        |  message Inner { int32 x = 1; }
        |  Inner inner = 1;
        |}
        |""".stripMargin
    val c = ProtoParser.compile(src)
    assert(c.byIndexPath(List(0)).name === "Outer")
    assert(c.byIndexPath(List(0, 0)).name === "Inner")
  }

  test("enums decode as int; oneof members carry the oneof tag and a which column") {
    val src =
      """syntax = "proto3";
        |message M {
        |  enum Color { RED = 0; BLUE = 1; }
        |  Color color = 1;
        |  oneof payload { string s = 2; int64 n = 3; }
        |}
        |""".stripMargin
    val c = ProtoParser.compile(src)
    val m = c.byName("M")
    assert(m.byNumber(1).ptype === PEnum)
    assert(m.byNumber(1).oneofName === None)
    assert(m.byNumber(2).ptype === PString)
    assert(m.byNumber(2).oneofName === Some("payload"))
    assert(m.byNumber(3).ptype === PInt64)
    assert(m.byNumber(3).oneofName === Some("payload"))
    assert(m.oneofs === Seq("payload"))
    assert(m.sparkType.fieldNames.toSeq === Seq("color", "s", "n", "which_payload"))
  }

  test("oneof inside a NESTED message decodes with its own which column") {
    import Writer._
    val src =
      """syntax = "proto3";
        |message Outer {
        |  message Inner {
        |    oneof val { int64 n = 1; string s = 2; }
        |  }
        |  Inner inner = 1;
        |  int32 tag = 2;
        |}
        |""".stripMargin
    val c = ProtoParser.compile(src)
    val outer = c.byName("Outer")
    assert(c.byName("Inner").sparkType.fieldNames.toSeq
      === Seq("n", "s", "which_val"))
    // Inner{s="x"} nested in Outer{tag=9}
    val bytes = messageField(1, stringField(2, "x")) ++ varintField(2, 9L)
    val row = ProtoCodec.decode(bytes, outer)
    val inner = row.getStruct(0, 3)
    assert(inner.isNullAt(0))
    assert(inner.getUTF8String(1).toString === "x")
    assert(inner.getUTF8String(2).toString === "s")
    assert(row.getInt(1) === 9)
  }

  test("end-to-end: source text → descriptor → envelope dispatch → decode") {
    import Writer._
    val compiled = ProtoParser.compile(customerProto)
    val addressBody = stringField(1, "1 Main") ++ stringField(2, "Kyiv") ++
      stringField(3, "01001") ++ stringField(4, "UA")
    val customerBody = varintField(1, 3L) ++ stringField(2, "Lev") ++
      messageField(5, addressBody) ++ stringField(6, "t1") ++
      mapEntry(7, stringField(1, "k"), stringField(2, "v"))
    val bytes = ConfluentEnvelope.wrap(77,
      ConfluentEnvelope.writeMessageIndexes(List(0)) ++ customerBody)

    val row = Seq(bytes).toDF("value")
      .select(from_protobuf_sr(col("value"), compiled.byIndexPath).as("c"))
      .select("c.*").collect().head
    assert(row.getAs[Long]("id") === 3L)
    assert(row.getAs[Row]("address").getAs[String]("city") === "Kyiv")
    assert(row.getAs[Map[String, String]]("preferences") === Map("k" -> "v"))
  }

  test("syntax errors carry a diagnostic") {
    val e = intercept[IllegalArgumentException](
      ProtoParser.compile("message M { int32 x }"))
    assert(e.getMessage.contains("expected"))
  }
}
