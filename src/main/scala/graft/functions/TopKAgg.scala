package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, ByteArrayInputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate (SURVEY §2.12's TypedImperativeAggregate path).
  *
  * `groupBy(key).agg(top_k(col, k))` keeps only k values per group in a
  * bounded min-heap buffer, combined map-side — at scale this replaces the
  * Window+row_number top-k (w1_topk_orders), which must shuffle EVERY row
  * to its key's partition before ranking. Here each map task ships at most
  * k doubles per key.
  */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Double]] {
  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.PriorityQueue[Double] =
    new java.util.PriorityQueue[Double](k + 1)

  override def update(buf: java.util.PriorityQueue[Double], input: InternalRow)
      : java.util.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Double],
                     other: java.util.PriorityQueue[Double])
      : java.util.PriorityQueue[Double] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.PriorityQueue[Double], v: Double): Unit = {
    // min-heap of size <= k: only values beating the current k-th survive
    if (buf.size < k) buf.add(v)
    else if (buf.peek() < v) { buf.poll(); buf.add(v) }
  }

  override def eval(buf: java.util.PriorityQueue[Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 } // heap drains ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"
  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** `top_k(col, k)`: array of the k largest values, descending. */
  def top_k(c: Column, k: Int): Column =
    GraftShims.column(TopKAgg(GraftShims.expression(c.cast("double")), k)
      .toAggregateExpression())
}
