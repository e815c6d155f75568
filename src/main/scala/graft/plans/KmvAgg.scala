package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** One-pass KMV (bottom-k distinct hashes) aggregate — the
  * `TypedImperativeAggregate` form of [[graft.ops.Sketch.kmvSketch]]:
  * buffer = the ≤k smallest DISTINCT values of the input hash column,
  * map-side partials merge as sorted-set unions, and at most k longs
  * per group cross the shuffle (the row_number construction shuffles
  * every distinct hash to rank it). Output is the ascending LongArray
  * sketch — exactly the `kmv` column layout, so
  * [[graft.ops.Sketch.kmvStats]] / `kmvUnionK` / `kmvMatchCount` /
  * `kmvMerge` consume it unchanged, and the result is bit-identical
  * to the relational build over any partitioning (bottom-k of a set
  * is partition-invariant; the oracle twin of q102 pins it in the
  * driver's gate). Like [[TopKAggregate]] this is an aggregate
  * Catalyst cannot express declaratively without shuffling the
  * distinct set; like [[graft.functions.HllAgg]] it is ONE stateful
  * operator, so it composes with watermarked streaming windows.
  */
case class KmvAggregate(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit =
    // insert only if it belongs in the bottom-k; evict the displaced
    // max so the buffer never exceeds k entries (same fold as
    // Stateful.kmvRunning)
    if ((buf.size < k || h < buf.last) && buf.add(h)) {
      if (buf.size > k) buf.remove(buf.last)
    }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow)
      : mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long])
      : mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(4 + buf.size * 8)
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach(dos.writeLong)
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAggregate =
    copy(inputAggBufferOffset = offset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvAgg {

  /** Aggregate: the ascending bottom-k sketch of a 61-bit hash column —
    * `agg(KmvAgg.kmv_sketch($"hx", 256).as("kmv"))`.
    */
  def kmv_sketch(hashCol: Column, k: Int): Column =
    GraftBridge.column(KmvAggregate(GraftBridge.expression(hashCol), k)
      .toAggregateExpression())
}
