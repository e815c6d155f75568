package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass count-min aggregate — the `TypedImperativeAggregate` form
  * of [[graft.ops.Sketch.cmsCounts]]: buffer = the flattened d×w
  * counter matrix, updated in place per input hash and merged
  * CELL-WISE (add is associative/commutative, so the table is
  * partition-invariant and bit-identical to the relational build —
  * q103's oracle twin pins it in the driver's gate). The relational
  * construction explodes d cell rows per input token through the
  * shuffle; this form ships ONE d×w buffer per map partition per
  * group — at 100 TB that is d×corpus rows versus groups×32 KiB.
  * Output is the row-major counter array; probe cell (j, c) at
  * element_at(cms, j·w + c + 1). Completes the one-pass aggregate
  * trio ([[graft.functions.HllAgg]], [[KmvAggregate]]) and composes
  * with watermarked streaming windows the same way.
  */
case class CmsAggregate(
    child: Expression,
    w: Int,
    d: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(w > 0 && d > 0, s"need positive dimensions, got w=$w d=$d")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < d) {
        // same position family as the column form (hashAt mod w)
        buf(j * w + (graft.functions.HashFns.hashAtLong(h, j) % w).toInt) += 1
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAggregate =
    copy(inputAggBufferOffset = offset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CmsAgg {

  /** Aggregate: the row-major d×w count-min table of a 61-bit hash
    * column — `agg(CmsAgg.cms_counts($"hx", 1024, 4).as("cms"))`.
    */
  def cms_counts(hashCol: Column, w: Int, d: Int): Column =
    GraftBridge.column(CmsAggregate(GraftBridge.expression(hashCol), w, d)
      .toAggregateExpression())
}
