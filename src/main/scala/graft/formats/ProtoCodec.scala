package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Protobuf (proto3) payload codec built directly on the wire format —
  * the protobuf-java runtime is not on this Spark distribution's
  * classpath, so the decoder implements the wire grammar itself
  * (varint / zigzag / fixed32 / fixed64 / length-delimited), driven by
  * a descriptor the caller declares.
  *
  * Capability mirror of the reference's `DynamicMessage`-against-
  * `Descriptor` decode (`lib/kpipe-format-protobuf/.../
  * ProtobufFormat.java:157-174`): fields are matched by number, unknown
  * fields are skipped (proto3 semantics), absent scalar fields read as
  * proto3 defaults, `repeated` collects in wire order (packed or not),
  * and `map<K,V>` entries decode via their synthetic key/value message.
  *
  * Supported field types cover the reference's canonical Customer
  * fixture (`FIXTURES.md` A2): scalars, strings/bytes, nested messages,
  * repeated, maps.
  */
object ProtoCodec {

  // ------------------------------------------------------------------ //
  // Descriptor model (what a compiled .proto reduces to for decoding)  //
  // ------------------------------------------------------------------ //

  sealed trait PType { def sparkType: DataType }
  case object PInt32 extends PType { val sparkType: DataType = IntegerType }
  case object PInt64 extends PType { val sparkType: DataType = LongType }
  case object PSInt32 extends PType { val sparkType: DataType = IntegerType }
  case object PSInt64 extends PType { val sparkType: DataType = LongType }
  case object PBool extends PType { val sparkType: DataType = BooleanType }
  case object PEnum extends PType { val sparkType: DataType = IntegerType }
  case object PFixed32 extends PType { val sparkType: DataType = IntegerType }
  case object PFixed64 extends PType { val sparkType: DataType = LongType }
  case object PFloat extends PType { val sparkType: DataType = FloatType }
  case object PDouble extends PType { val sparkType: DataType = DoubleType }
  case object PString extends PType { val sparkType: DataType = StringType }
  case object PBytes extends PType { val sparkType: DataType = BinaryType }
  final case class PMessage(descriptor: MessageDescriptor) extends PType {
    def sparkType: DataType = descriptor.sparkType
  }
  final case class PMap(key: PType, value: PType) extends PType {
    def sparkType: DataType = MapType(key.sparkType, value.sparkType)
  }

  /** `oneofName`: set when the field is a member of a proto3 `oneof`
    * block. Members are ordinary fields on the wire; the descriptor
    * tag drives which-branch tracking during decode and
    * emit-even-at-default presence semantics during encode.
    */
  final case class FieldDescriptor(number: Int, name: String, ptype: PType,
                                   repeated: Boolean = false,
                                   oneofName: Option[String] = None)

  /** The Spark row type carries one extra `which_<oneof>` STRING
    * column per oneof, AFTER the declared fields: the set member's
    * field name, or null when no member was present — the
    * which-branch-was-set signal proto3 accessors expose but a
    * flattened column layout loses (members themselves are null
    * unless they are the set branch).
    */
  final case class MessageDescriptor(name: String, fields: Seq[FieldDescriptor]) {
    lazy val oneofs: Seq[String] = fields.flatMap(_.oneofName).distinct
    lazy val sparkType: StructType = StructType(fields.map { f =>
      val dt = f.ptype match {
        case m: PMap => m.sparkType
        case t if f.repeated => ArrayType(t.sparkType, containsNull = false)
        case t => t.sparkType
      }
      StructField(f.name, dt, nullable = true)
    } ++ oneofs.map(o => StructField(s"which_$o", StringType, nullable = true)))
    lazy val byNumber: Map[Int, FieldDescriptor] = fields.map(f => f.number -> f).toMap
  }

  // ------------------------------------------------------------------ //
  // Wire decode                                                        //
  // ------------------------------------------------------------------ //

  private final class Reader(bytes: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      val (v, n) = ConfluentEnvelope.readVarint(bytes, pos)
      if (pos + n > end) throw new IllegalArgumentException("varint crosses field boundary")
      pos += n; v
    }
    def readFixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8) |
        ((bytes(pos + 2) & 0xFF) << 16) | ((bytes(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      var v = 0L
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readBytes(len: Int): (Int, Int) = {
      if (len < 0 || pos + len > end) throw new IllegalArgumentException("truncated bytes")
      val r = (pos, pos + len); pos += len; r
    }
  }

  /** Decode one message body in [start, end) against a descriptor. */
  private def decodeMessage(bytes: Array[Byte], start: Int, end: Int,
                            desc: MessageDescriptor): InternalRow = {
    val r = new Reader(bytes, start, end)
    val values = mutable.Map.empty[Int, Any]
    val repeats = mutable.Map.empty[Int, mutable.ArrayBuffer[Any]]
    val maps = mutable.Map.empty[Int, mutable.ArrayBuffer[(Any, Any)]]
    // oneof name → field number of the LAST member seen on the wire
    // (proto3: later members override earlier ones, across branches)
    val oneofSet = mutable.Map.empty[String, Int]

    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNo = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      desc.byNumber.get(fieldNo) match {
        case None => skip(r, wireType)
        case Some(f) =>
          f.oneofName.foreach(o => oneofSet(o) = fieldNo)
          f.ptype match {
          case PMap(kt, vt) =>
            requireWireType(wireType, 2, f)
            val len = r.readVarint().toInt
            val (s, e) = r.readBytes(len)
            maps.getOrElseUpdate(fieldNo, mutable.ArrayBuffer.empty) +=
              decodeMapEntry(bytes, s, e, kt, vt)
          case PMessage(md) =>
            requireWireType(wireType, 2, f)
            val len = r.readVarint().toInt
            val (s, e) = r.readBytes(len)
            val row = decodeMessage(bytes, s, e, md)
            if (f.repeated) repeats.getOrElseUpdate(fieldNo, mutable.ArrayBuffer.empty) += row
            else values(fieldNo) = row
          case scalar =>
            if (f.repeated && wireType == 2 && isPackable(scalar)) {
              // packed repeated scalars
              val len = r.readVarint().toInt
              val (s, e) = r.readBytes(len)
              val inner = new Reader(bytes, s, e)
              val buf = repeats.getOrElseUpdate(fieldNo, mutable.ArrayBuffer.empty)
              while (inner.hasMore) buf += readScalar(inner, bytes, scalar)
            } else {
              requireWireType(wireType, expectedWireType(scalar), f)
              val v = readScalar(r, bytes, scalar)
              if (f.repeated) repeats.getOrElseUpdate(fieldNo, mutable.ArrayBuffer.empty) += v
              else values(fieldNo) = v
            }
        }
      }
    }

    InternalRow.fromSeq(desc.fields.map { f =>
      f.oneofName match {
        // a oneof member is null unless it is the SET branch — the
        // proto3-default fill would erase exactly the presence signal
        // oneof exists to carry
        case Some(o) =>
          if (oneofSet.get(o).contains(f.number)) values.getOrElse(f.number, null)
          else null
        case None => f.ptype match {
          case _: PMap =>
            val entries = maps.getOrElse(f.number, mutable.ArrayBuffer.empty)
            new ArrayBasedMapData(
              new GenericArrayData(entries.map(_._1).toArray),
              new GenericArrayData(entries.map(_._2).toArray))
          case _ if f.repeated =>
            new GenericArrayData(repeats.getOrElse(f.number, mutable.ArrayBuffer.empty).toArray)
          case _: PMessage => values.getOrElse(f.number, null)
          case t => values.getOrElse(f.number, default(t))   // proto3 default
        }
      }
    }.toSeq ++ desc.oneofs.map(o => oneofSet.get(o)
      .map(n => UTF8String.fromString(desc.byNumber(n).name)).orNull))
  }

  /** Wire type a scalar field must arrive with (proto3 spec). A
    * mismatch means the bytes were not written by this descriptor —
    * reject rather than silently mis-decode.
    */
  private def expectedWireType(t: PType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PBool | PEnum => 0
    case PFixed64 | PDouble => 1
    case PString | PBytes => 2
    case PFixed32 | PFloat => 5
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }

  private def requireWireType(actual: Int, expected: Int, f: FieldDescriptor): Unit =
    if (actual != expected) throw new IllegalArgumentException(
      s"field ${f.name} (#${f.number}): wire type $actual, expected $expected")

  private def isPackable(t: PType): Boolean = t match {
    case PString | PBytes | _: PMessage | _: PMap => false
    case _ => true
  }

  private def readScalar(r: Reader, bytes: Array[Byte], t: PType): Any = t match {
    case PInt32 | PEnum => r.readVarint().toInt
    case PInt64 => r.readVarint()
    case PSInt32 => ConfluentEnvelope.zigzagDecode(r.readVarint()).toInt
    case PSInt64 => ConfluentEnvelope.zigzagDecode(r.readVarint())
    case PBool => r.readVarint() != 0
    case PFixed32 => r.readFixed32()
    case PFixed64 => r.readFixed64()
    case PFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case PDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case PString =>
      val len = r.readVarint().toInt
      val (s, e) = r.readBytes(len)
      UTF8String.fromBytes(bytes, s, e - s)
    case PBytes =>
      val len = r.readVarint().toInt
      val (s, e) = r.readBytes(len)
      java.util.Arrays.copyOfRange(bytes, s, e)
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }

  private def decodeMapEntry(bytes: Array[Byte], start: Int, end: Int,
                             kt: PType, vt: PType): (Any, Any) = {
    val r = new Reader(bytes, start, end)
    var k: Any = default(kt)
    var v: Any = defaultForMapValue(vt)
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3).toInt match {
        case 1 => k = readScalar(r, bytes, kt)
        case 2 => vt match {
          case PMessage(md) =>
            val len = r.readVarint().toInt
            val (s, e) = r.readBytes(len)
            v = decodeMessage(bytes, s, e, md)
          case t => v = readScalar(r, bytes, t)
        }
        case _ => skip(r, (tag & 7).toInt)
      }
    }
    (k, v)
  }

  private def default(t: PType): Any = t match {
    case PInt32 | PSInt32 | PEnum | PFixed32 => 0
    case PInt64 | PSInt64 | PFixed64 => 0L
    case PBool => false
    case PFloat => 0.0f
    case PDouble => 0.0
    case PString => UTF8String.EMPTY_UTF8
    case PBytes => Array.empty[Byte]
    case _ => null
  }

  private def defaultForMapValue(t: PType): Any = t match {
    case _: PMessage => null
    case other => default(other)
  }

  private def skip(r: Reader, wireType: Int): Unit = wireType match {
    case 0 => r.readVarint()
    case 1 => r.readFixed64()
    case 2 => val len = r.readVarint().toInt; r.readBytes(len)
    case 5 => r.readFixed32()
    case other => throw new IllegalArgumentException(s"unsupported wire type $other")
  }

  /** Public byte-level decode (tests, SR dispatch). */
  def decode(bytes: Array[Byte], desc: MessageDescriptor): InternalRow =
    decodeMessage(bytes, 0, bytes.length, desc)

  // ------------------------------------------------------------------ //
  // Wire encode                                                        //
  // ------------------------------------------------------------------ //

  /** Encode a Catalyst row against a descriptor — the inverse of
    * [[decode]], with canonical proto3 emission: singular scalar fields
    * holding the proto3 default (0 / "" / false / empty bytes) are
    * omitted, packable repeated scalars are packed, null fields are
    * absent. Mirrors the reference's serializer path
    * (`lib/kpipe-format-protobuf/.../ProtobufFormat.java:125-143`).
    *
    * proto3 semantics to note at the column layer: absence and default
    * are indistinguishable, so `null` struct fields decode back as the
    * type's default, not null — the round-trip law is
    * `decode(encode(x)) == withProto3Defaults(x)`. Exception: oneof
    * members carry presence — a non-null member is emitted even at the
    * default value, a null member is absent, and the trailing
    * `which_<oneof>` columns are recomputed on decode (ignored by
    * encode).
    */
  def encode(row: InternalRow, desc: MessageDescriptor): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeMessage(out, row, desc)
    out.toByteArray
  }

  private def writeMessage(out: java.io.ByteArrayOutputStream, row: InternalRow,
                           desc: MessageDescriptor): Unit = {
    val struct = desc.sparkType
    desc.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val dt = struct(i).dataType
        f.ptype match {
          case PMap(kt, vt) =>
            val m = row.getMap(i)
            val MapType(kDt, vDt, _) = dt: @unchecked
            var j = 0
            while (j < m.numElements()) {
              val entry = new java.io.ByteArrayOutputStream()
              writeScalarOrMessageField(entry, 1, kt, m.keyArray().get(j, kDt))
              writeScalarOrMessageField(entry, 2, vt, m.valueArray().get(j, vDt))
              out.write(Writer.bytesField(f.number, entry.toByteArray))
              j += 1
            }
          case t if f.repeated =>
            val arr = row.getArray(i)
            val ArrayType(elemDt, _) = dt: @unchecked
            if (arr.numElements() > 0) {
              if (isPackable(t)) {
                val packed = new java.io.ByteArrayOutputStream()
                var j = 0
                while (j < arr.numElements()) {
                  packed.write(rawScalar(t, arr.get(j, elemDt))); j += 1
                }
                out.write(Writer.bytesField(f.number, packed.toByteArray))
              } else {
                var j = 0
                while (j < arr.numElements()) {
                  writeScalarOrMessageField(out, f.number, t, arr.get(j, elemDt)); j += 1
                }
              }
            }
          case PMessage(md) =>
            out.write(Writer.bytesField(f.number,
              encode(row.getStruct(i, md.fields.size), md)))
          case scalar =>
            val v = row.get(i, dt)
            // oneof members have presence semantics: a set branch is
            // emitted even at the type's default value (that emission
            // IS how the wire distinguishes "set to default" from
            // "unset"); plain singular fields keep canonical omission
            if (f.oneofName.isDefined || !isProto3Default(scalar, v))
              writeScalarOrMessageField(out, f.number, scalar, v)
        }
      }
    }
  }

  /** One tagged field write for a scalar or nested-message value. */
  private def writeScalarOrMessageField(out: java.io.ByteArrayOutputStream,
                                        fieldNo: Int, t: PType, v: Any): Unit = t match {
    case PMessage(md) =>
      out.write(Writer.bytesField(fieldNo, encode(v.asInstanceOf[InternalRow], md)))
    case PString =>
      out.write(Writer.bytesField(fieldNo, v.asInstanceOf[UTF8String].getBytes))
    case PBytes =>
      out.write(Writer.bytesField(fieldNo, v.asInstanceOf[Array[Byte]]))
    case scalar =>
      out.write(Writer.tag(fieldNo, expectedWireType(scalar)))
      out.write(rawScalar(scalar, v))
  }

  /** Un-tagged scalar wire bytes (also the packed-element form). */
  private def rawScalar(t: PType, v: Any): Array[Byte] = t match {
    case PInt32 | PEnum => ConfluentEnvelope.writeVarint(v.asInstanceOf[Int].toLong)
    case PInt64 => ConfluentEnvelope.writeVarint(v.asInstanceOf[Long])
    case PSInt32 => ConfluentEnvelope.writeVarint(
      ConfluentEnvelope.zigzagEncode(v.asInstanceOf[Int].toLong))
    case PSInt64 => ConfluentEnvelope.writeVarint(
      ConfluentEnvelope.zigzagEncode(v.asInstanceOf[Long]))
    case PBool => ConfluentEnvelope.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case PFixed32 => le4(v.asInstanceOf[Int])
    case PFixed64 => le8(v.asInstanceOf[Long])
    case PFloat => le4(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case PDouble => le8(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case PString =>
      val b = v.asInstanceOf[UTF8String].getBytes
      ConfluentEnvelope.writeVarint(b.length.toLong) ++ b
    case PBytes =>
      val b = v.asInstanceOf[Array[Byte]]
      ConfluentEnvelope.writeVarint(b.length.toLong) ++ b
    case other => throw new IllegalArgumentException(s"not a scalar: $other")
  }

  private def le4(v: Int): Array[Byte] =
    Array(v & 0xFF, (v >>> 8) & 0xFF, (v >>> 16) & 0xFF, (v >>> 24) & 0xFF).map(_.toByte)
  private def le8(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xFF).toByte).toArray

  private def isProto3Default(t: PType, v: Any): Boolean = t match {
    case PInt32 | PSInt32 | PEnum | PFixed32 => v.asInstanceOf[Int] == 0
    case PInt64 | PSInt64 | PFixed64 => v.asInstanceOf[Long] == 0L
    case PBool => !v.asInstanceOf[Boolean]
    case PFloat => v.asInstanceOf[Float] == 0.0f
    case PDouble => v.asInstanceOf[Double] == 0.0
    case PString => v.asInstanceOf[UTF8String].numBytes() == 0
    case PBytes => v.asInstanceOf[Array[Byte]].isEmpty
    case _ => false
  }

  // ------------------------------------------------------------------ //
  // Wire-primitive writer (encode internals + test fixtures)           //
  // ------------------------------------------------------------------ //

  /** Minimal field writer used by [[encode]] and test fixtures. */
  object Writer {
    def tag(fieldNo: Int, wireType: Int): Array[Byte] =
      ConfluentEnvelope.writeVarint((fieldNo.toLong << 3) | wireType)
    def varintField(fieldNo: Int, v: Long): Array[Byte] =
      tag(fieldNo, 0) ++ ConfluentEnvelope.writeVarint(v)
    def sintField(fieldNo: Int, v: Long): Array[Byte] =
      tag(fieldNo, 0) ++ ConfluentEnvelope.writeVarint(ConfluentEnvelope.zigzagEncode(v))
    def boolField(fieldNo: Int, v: Boolean): Array[Byte] =
      varintField(fieldNo, if (v) 1 else 0)
    def doubleField(fieldNo: Int, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      tag(fieldNo, 1) ++ (0 until 8).map(i => ((bits >>> (8 * i)) & 0xFF).toByte)
    }
    def bytesField(fieldNo: Int, v: Array[Byte]): Array[Byte] =
      tag(fieldNo, 2) ++ ConfluentEnvelope.writeVarint(v.length.toLong) ++ v
    def stringField(fieldNo: Int, v: String): Array[Byte] =
      bytesField(fieldNo, v.getBytes("UTF-8"))
    def messageField(fieldNo: Int, body: Array[Byte]): Array[Byte] =
      bytesField(fieldNo, body)
    def mapEntry(fieldNo: Int, key: Array[Byte], value: Array[Byte]): Array[Byte] =
      messageField(fieldNo, key ++ value)
  }

  // ------------------------------------------------------------------ //
  // Column API                                                         //
  // ------------------------------------------------------------------ //

  /** Decode a binary column against a message descriptor; malformed →
    * null (Result split upstream, as with JSON/Avro).
    */
  def from_protobuf(data: Column, desc: MessageDescriptor): Column =
    GraftBridge.column(ProtoDecodeExpression(GraftBridge.expression(data), desc))

  /** Decode a Confluent-enveloped protobuf column: validates the
    * envelope, reads the zig-zag varint message-index list, selects the
    * message type from `messagesByIndexPath`, decodes the remainder.
    */
  def from_protobuf_sr(data: Column,
                       messagesByIndexPath: Map[List[Int], MessageDescriptor]): Column =
    GraftBridge.column(ConfluentProtoDecodeExpression(
      GraftBridge.expression(data), messagesByIndexPath))

  /** Encode a struct column to proto3 wire bytes against a descriptor —
    * sink-side parity with [[AvroCodec.to_avro]] / JSON encode.
    */
  def to_protobuf(data: Column, desc: MessageDescriptor): Column =
    GraftBridge.column(ProtoEncodeExpression(GraftBridge.expression(data), desc))
}

/** `binary → struct` proto3 decode against a declared descriptor. */
case class ProtoDecodeExpression(child: Expression, desc: ProtoCodec.MessageDescriptor)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = desc.sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_protobuf"

  override def nullSafeEval(input: Any): Any =
    try ProtoCodec.decode(input.asInstanceOf[Array[Byte]], desc)
    catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): ProtoDecodeExpression =
    copy(child = newChild)
}

/** `struct → binary` proto3 encode against a declared descriptor. The
  * input struct's shape must match the descriptor's Spark type.
  */
case class ProtoEncodeExpression(child: Expression, desc: ProtoCodec.MessageDescriptor)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, desc.sparkType, ignoreNullability = true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName input ${child.dataType.catalogString} does not match " +
        s"descriptor type ${desc.sparkType.catalogString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_to_protobuf"

  override def nullSafeEval(input: Any): Any =
    ProtoCodec.encode(input.asInstanceOf[InternalRow], desc)

  override protected def withNewChildInternal(newChild: Expression): ProtoEncodeExpression =
    copy(child = newChild)
}

/** Confluent-envelope protobuf decode with message-index dispatch.
  * All candidate message types must share one Spark schema row type
  * per index path; the expression's output type is the type of the
  * `[0]` (default) message.
  */
case class ConfluentProtoDecodeExpression(
    child: Expression,
    messagesByIndexPath: Map[List[Int], ProtoCodec.MessageDescriptor])
    extends UnaryExpression with CodegenFallback {

  require(messagesByIndexPath.contains(List(0)),
    "messagesByIndexPath must contain the default path [0]")

  override def dataType: DataType = messagesByIndexPath(List(0)).sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_protobuf_sr"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (ConfluentEnvelope.readSchemaId(bytes).isEmpty) return null
    try {
      val (path, consumed) = ConfluentEnvelope.readMessageIndexes(bytes)
      messagesByIndexPath.get(path) match {
        case None => null
        case Some(desc) =>
          val start = ConfluentEnvelope.PrefixLength + consumed
          ProtoCodec.decode(java.util.Arrays.copyOfRange(bytes, start, bytes.length), desc)
      }
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentProtoDecodeExpression =
    copy(child = newChild)
}
