package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom-filter word aggregation for the DocStore stats sidecar: each
  * input row contributes its precomputed bit POSITIONS (an array<int>,
  * one element per hash — the caller keeps the md5 position math in
  * ordinary Catalyst expressions so null handling and string casts stay
  * bit-identical to the historical shape), the buffer is the fixed
  * `ceil(bits/64)` long words, merge is elementwise OR, and the result
  * is the ascending array of NON-ZERO (i, w) word structs — byte-for-byte
  * the rows the former explode -> bit_or-by-(file, col, word) ->
  * collect_list -> pivot pipeline produced, at ONE aggregate instead of
  * three grouping exchanges, a pivot, and a join per stats pass. At
  * corpus scale that is the difference between "collectStats is one
  * map-side-combined pass" and a four-exchange shuffle chain over every
  * statted row.
  */
case class BloomWordsAgg(child: Expression, bits: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(bits > 0, "bits must be positive")

  private val nWords = (bits + 63) / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val pos = arr.getInt(j)
          buf(pos >>> 6) |= 1L << (pos & 63)
        }
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var nz = 0
    var i = 0
    while (i < nWords) { if (buf(i) != 0L) nz += 1; i += 1 }
    val out = new Array[Any](nz)
    i = 0; var j = 0
    while (i < nWords) {
      if (buf(i) != 0L) {
        out(j) = InternalRow(i, buf(i))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < nWords) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](nWords)
    var i = 0
    while (i < nWords) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = true),
      StructField("w", LongType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_words"
  override def withNewMutableAggBufferOffset(offset: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomWordsAgg =
    copy(child = newChildren.head)
}

object BloomWordsAgg {
  /** `bloom_words(positions, bits)`: OR every row's position array into a
    * `bits`-wide filter; result = ascending non-zero (word index, word)
    * structs — the stats sidecar's `bw_<col>` shape.
    */
  def bloom_words(positions: Column, bits: Int): Column =
    GraftShims.column(BloomWordsAgg(GraftShims.expression(positions), bits)
      .toAggregateExpression())
}
