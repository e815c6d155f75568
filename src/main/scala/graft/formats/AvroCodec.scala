package graft.formats

import java.io.ByteArrayOutputStream

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Static-schema Avro decode/encode as custom Catalyst expressions over
  * the plain Avro runtime (`avro-1.12.1` on the Spark classpath; the
  * spark-avro connector module is not in this distribution, so the
  * expression is built directly — which is also the base the
  * schema-registry per-record dispatch needs, SURVEY §7 hard-part 1).
  *
  * Capability mirror of the reference's static mode
  * (`lib/kpipe-format-avro/.../AvroFormat.java:157-179`): one fixed
  * schema both sides, malformed input → null (the Result/error split
  * happens at the column layer, like JSON).
  *
  * Supported Avro types: records (nested), nullable unions
  * `[null, T]`, arrays, string-keyed maps, enums/fixed (as string/
  * binary), all primitives, and the common logical types
  * (timestamp-millis/micros, date, decimal).
  */
object AvroCodec {

  /** Avro schema (JSON text) → Spark DataType. */
  def sparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (schema.getLogicalType != null && schema.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG => schema.getLogicalType match {
      case lt if lt != null && lt.getName == "timestamp-millis" => TimestampType
      case lt if lt != null && lt.getName == "timestamp-micros" => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES => schema.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.FIXED => BinaryType
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.map { f =>
        StructField(f.name(), sparkType(f.schema()), nullable = isNullable(f.schema()))
      }.toArray)
    case Schema.Type.ARRAY =>
      ArrayType(sparkType(nonNull(schema.getElementType)),
        containsNull = isNullable(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, sparkType(nonNull(schema.getValueType)),
        valueContainsNull = isNullable(schema.getValueType))
    case Schema.Type.UNION => sparkType(nonNull(schema))
    case Schema.Type.NULL => NullType
    case t => throw new IllegalArgumentException(s"unsupported Avro type $t")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Strip the null branch of a `[null, T]`-style union. */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (branches.size == 1) branches.head
      else throw new IllegalArgumentException(
        s"general unions are not supported (only [null, T]): $s")
    }

  /** Avro runtime value → Catalyst value, driven by the Avro schema. */
  def toCatalyst(value: Any, schema: Schema): Any = {
    if (value == null) return null
    schema.getType match {
      case Schema.Type.UNION => toCatalyst(value, nonNull(schema))
      case Schema.Type.BOOLEAN | Schema.Type.FLOAT | Schema.Type.DOUBLE => value
      case Schema.Type.INT =>
        if (schema.getLogicalType != null && schema.getLogicalType.getName == "date")
          value.asInstanceOf[Int]
        else value
      case Schema.Type.LONG => schema.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" =>
          value.asInstanceOf[Long] * 1000L
        case _ => value   // plain long and timestamp-micros are already micros
      }
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(value.toString)
      case Schema.Type.BYTES => schema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          val bytes = byteArray(value)
          Decimal(BigDecimal(BigInt(bytes), d.getScale), d.getPrecision, d.getScale)
        case _ => byteArray(value)
      }
      case Schema.Type.FIXED =>
        value.asInstanceOf[GenericData.Fixed].bytes().clone()
      case Schema.Type.RECORD =>
        val rec = value.asInstanceOf[GenericRecord]
        val fields = schema.getFields.asScala
        InternalRow.fromSeq(fields.map(f => toCatalyst(rec.get(f.pos()), f.schema())).toSeq)
      case Schema.Type.ARRAY =>
        val elems = value.asInstanceOf[java.util.Collection[Any]].asScala
        new GenericArrayData(elems.map(toCatalyst(_, schema.getElementType)).toArray)
      case Schema.Type.MAP =>
        val m = value.asInstanceOf[java.util.Map[Any, Any]].asScala
        val keys = new GenericArrayData(m.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any])
        val vals = new GenericArrayData(m.values.map(toCatalyst(_, schema.getValueType)).toArray)
        new ArrayBasedMapData(keys, vals)
      case t => throw new IllegalArgumentException(s"unsupported Avro type $t")
    }
  }

  private def byteArray(value: Any): Array[Byte] = value match {
    case bb: java.nio.ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case a: Array[Byte] => a
    case other => throw new IllegalArgumentException(s"unexpected bytes value $other")
  }

  /** Catalyst value → Avro runtime value (for encode). */
  def fromCatalyst(value: Any, schema: Schema): Any = {
    if (value == null) return null
    schema.getType match {
      case Schema.Type.UNION => fromCatalyst(value, nonNull(schema))
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.FLOAT | Schema.Type.DOUBLE => value
      case Schema.Type.LONG => schema.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-millis" =>
          value.asInstanceOf[Long] / 1000L
        case _ => value
      }
      case Schema.Type.STRING => value.toString
      case Schema.Type.ENUM =>
        GenericData.get().createEnum(value.toString, schema)
      case Schema.Type.BYTES => schema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          java.nio.ByteBuffer.wrap(
            value.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
        case _ => java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      }
      case Schema.Type.RECORD =>
        val row = value.asInstanceOf[InternalRow]
        val sparkSchema = sparkType(schema).asInstanceOf[StructType]
        val rec = new GenericData.Record(schema)
        schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          val v = if (row.isNullAt(i)) null
            else fromCatalyst(row.get(i, sparkSchema(i).dataType), f.schema())
          rec.put(i, v)
        }
        rec
      case Schema.Type.ARRAY =>
        val arr = value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val elemType = sparkType(nonNull(schema.getElementType))
        arr.toObjectArray(elemType).map(fromCatalyst(_, schema.getElementType)).toList.asJava
      case Schema.Type.MAP =>
        val m = value.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val valType = sparkType(nonNull(schema.getValueType))
        val keys = m.keyArray().toObjectArray(StringType)
        val vals = m.valueArray().toObjectArray(valType)
        keys.zip(vals).map { case (k, v) =>
          k.toString -> fromCatalyst(v, schema.getValueType)
        }.toMap.asJava
      case t => throw new IllegalArgumentException(s"unsupported Avro type $t")
    }
  }

  import org.apache.spark.sql.GraftBridge

  /** Decode a binary column with a fixed Avro schema; malformed → null. */
  def from_avro(data: Column, schemaJson: String): Column =
    GraftBridge.column(AvroDecodeExpression(GraftBridge.expression(data), schemaJson))

  /** Encode a struct column to Avro binary with a fixed schema. */
  def to_avro(data: Column, schemaJson: String): Column =
    GraftBridge.column(AvroEncodeExpression(GraftBridge.expression(data), schemaJson))

  /** Serialize a GenericRecord (test fixtures, SR round-trips). */
  def serialize(rec: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder: BinaryEncoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Deserialize Avro binary with separate writer/reader schemas (the
    * schema-evolution path the SR mode uses).
    */
  def deserialize(bytes: Array[Byte], writer: Schema, reader: Schema): GenericRecord = {
    val decoder: BinaryDecoder = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, decoder)
  }
}

/** `binary → struct` static-schema Avro decode. Non-codegen eval is
  * intentional: the cost is the Avro decode itself (same as the
  * reference's row-at-a-time decode); the surrounding plan stays in
  * whole-stage codegen.
  */
case class AvroDecodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[Any](schema)

  override def dataType: DataType = AvroCodec.sparkType(schema)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_avro"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
      AvroCodec.toCatalyst(reader.read(null, decoder), schema)
    } catch {
      case _: Exception => null   // malformed → null; Result split upstream
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpression =
    copy(child = newChild)
}

/** `struct → binary` static-schema Avro encode. */
case class AvroEncodeExpression(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_to_avro"

  override def nullSafeEval(input: Any): Any = {
    val rec = AvroCodec.fromCatalyst(input, schema).asInstanceOf[GenericRecord]
    AvroCodec.serialize(rec, schema)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpression =
    copy(child = newChild)
}
