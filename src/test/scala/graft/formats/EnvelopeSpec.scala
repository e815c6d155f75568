package graft.formats

import graft.SparkSpec

/** Property tests for the Confluent envelope math — the same edge cases
  * as the reference's `AvroFormatEnvelopeEdgeCasesTest` /
  * `ProtobufFormatEdgeCasesTest` (wrong magic, truncation, varint
  * round-trips, shorthand index list).
  */
class EnvelopeSpec extends SparkSpec {
  import ConfluentEnvelope._

  // seeded sampling stands in for the jqwik/scalacheck property layer
  // (the scalatest-scalacheck bridge isn't on the offline classpath)
  private val rnd = new scala.util.Random(42)

  test("schema-id round-trips through the 5-byte prefix") {
    for (_ <- 1 to 200) {
      val id = rnd.nextInt(Int.MaxValue)
      val wrapped = wrap(id, Array[Byte](1, 2, 3))
      assert(readSchemaId(wrapped) === Some(id))
      assert(wrapped.length === 8)
    }
  }

  test("wrong magic byte / truncated prefix / null are rejected") {
    assert(readSchemaId(Array[Byte](1, 0, 0, 0, 1)) === None)
    assert(readSchemaId(Array[Byte](0, 0, 0)) === None)
    assert(readSchemaId(null) === None)
    assert(readSchemaId(Array.empty[Byte]) === None)
  }

  test("zigzag round-trips") {
    for (_ <- 1 to 500) {
      val n = rnd.nextLong()
      assert(zigzagDecode(zigzagEncode(n)) === n)
    }
    assert(zigzagEncode(0L) === 0L)
    assert(zigzagEncode(-1L) === 1L)
    assert(zigzagEncode(1L) === 2L)
  }

  test("varint round-trips") {
    for (_ <- 1 to 500) {
      val n = rnd.nextLong().abs
      val bytes = writeVarint(n)
      val (v, used) = readVarint(bytes, 0)
      assert(v === n)
      assert(used === bytes.length)
    }
  }

  test("truncated varint throws") {
    intercept[IllegalArgumentException] {
      readVarint(Array[Byte](0x80.toByte, 0x80.toByte), 0)
    }
  }

  test("message-index list: 0x00 shorthand means [0]") {
    val bytes = wrap(7, Array[Byte](0) ++ Array[Byte](9, 9))
    val (idx, used) = readMessageIndexes(bytes)
    assert(idx === List(0))
    assert(used === 1)
  }

  test("message-index list round-trips") {
    for (_ <- 1 to 200) {
      val idx = List.fill(1 + rnd.nextInt(4))(rnd.nextInt(100))
      val encoded = writeMessageIndexes(idx)
      val wrapped = wrap(1, encoded ++ Array[Byte](42))
      val (decoded, used) = readMessageIndexes(wrapped)
      assert(decoded === idx)
      assert(used === encoded.length)
    }
  }

  test("implausible message-index count throws") {
    // zigzag(-1) = 1 → count -1
    val bad = wrap(1, writeVarint(1L))
    intercept[IllegalArgumentException](readMessageIndexes(bad))
  }

  test("column-level envelope check + schema id + body extraction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      wrap(42, "hello".getBytes("UTF-8")),
      wrap(16909060, Array[Byte](1)),   // id 0x01020304
      Array[Byte](1, 2, 3),             // wrong magic
      Array[Byte](0, 0)                 // too short
    ).toDF("value")
    val out = rows.select(
      ConfluentEnvelope.hasEnvelope(col("value")).as("has"),
      ConfluentEnvelope.schemaId(col("value")).as("id"),
      ConfluentEnvelope.avroBody(col("value")).as("body"))
      .collect()
    assert(out(0).getBoolean(0) && out(0).getLong(1) === 42L)
    assert(new String(out(0).getAs[Array[Byte]](2), "UTF-8") === "hello")
    assert(out(1).getBoolean(0) && out(1).getLong(1) === 16909060L)
    assert(!out(2).getBoolean(0))
    assert(!out(3).getBoolean(0))
  }

  test("skipBytes column matches byte-level semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(Array[Byte](9, 9, 9, 1, 2)).toDF("value")
    val out = rows.select(ConfluentEnvelope.skipBytes(col("value"), 3).as("b"))
      .as[Array[Byte]].collect().head
    assert(out.toSeq === Seq[Byte](1, 2))
  }
}
