package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded-heap top-k-per-group aggregate — the scalable form of
  * "top N per key".
  *
  * `row_number().over(partitionBy(key).orderBy(x))` + filter (q05's
  * shape) shuffles and sorts EVERY row of every group; this aggregate
  * keeps a k-row heap per group with map-side partial aggregation, so
  * the shuffle carries at most k rows per group per map partition —
  * at 100 TB that is the difference between shuffling the table and
  * shuffling k×|keys| rows.
  *
  * Input is a struct column; rank order is field0 DESC, remaining
  * fields ASC (ties break deterministically). Output is the array of
  * the top-k input structs in rank order.
  *
  * SURVEY §4 lists `TypedImperativeAggregate` as the extension point
  * for aggregates Catalyst can't express declaratively; this is the
  * first real use (the reference itself has no aggregates to mirror —
  * this belongs to the beyond-reference relational surface).
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"k must be positive, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** a ranks before b ⇔ compare(a, b) < 0: field0 desc, rest asc. */
  @transient private lazy val rankOrdering: InterpretedOrdering = {
    val sortOrders = structType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (i == 0) Descending else Ascending)
    }
    new InterpretedOrdering(sortOrders.toIndexedSeq)
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  // PriorityQueue dequeues its maximum = the WORST-ranked row
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](
      (a: InternalRow, b: InternalRow) => rankOrdering.compare(a, b))

  override def update(buf: mutable.PriorityQueue[InternalRow], input: InternalRow)
      : mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow].copy()
      if (buf.size < k) buf.enqueue(row)
      else if (rankOrdering.compare(row, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(row)
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
                     other: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (rankOrdering.compare(row, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(row)
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rankOrdering.asInstanceOf[Ordering[InternalRow]])
      .asInstanceOf[Array[Any]])

  @transient private lazy val project = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { row =>
      val unsafe = project(row)
      dos.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(dos, null)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggregate =
    copy(inputAggBufferOffset = offset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopK {

  /** Aggregate: top-k structs per group, ranked field0 DESC then
    * remaining fields ASC. `agg(top_k(struct($"price", $"id"), 3))`.
    */
  def top_k(structCol: Column, k: Int): Column =
    GraftBridge.column(TopKAggregate(GraftBridge.expression(structCol), k)
      .toAggregateExpression())

  /** The window-free "top N rows per key" operator: returns the
    * exploded rows with a 1-based `rn` rank column — drop-in
    * replacement for the row_number window pattern at a fraction of
    * the shuffle.
    */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                 rankCol: Column, tieCols: Seq[Column], k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = struct(rankCol +: tieCols: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(top_k(payload, k).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__row")): _*)
      .select(keyCols.map(col) ++ Seq(col("__row.*"), (col("__pos") + 1).cast("bigint").as("rn")): _*)
  }
}
