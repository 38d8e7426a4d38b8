package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD'07 unbiased estimator).
  *
  * `groupBy(key).agg(kmv_sketch(hash, k))` keeps the k SMALLEST DISTINCT
  * hash values per group in a bounded tree buffer, combined map-side — the
  * build never shuffles distinct keys (each task ships at most k longs per
  * group), which is the whole point at 100 TB: a distinct count costs a
  * distinct-sized shuffle, a KMV sketch costs k longs.
  *
  * Versus HLL (ops.Hll): registers only support UNION, so an intersection
  * estimate must go through inclusion-exclusion, whose error scales with
  * the UNION size and routinely swamps a small intersection. A KMV sketch
  * is a uniform sample of the hash space below a group-specific threshold:
  * merged bottom-k sketches of two groups estimate |A ∪ B| directly AND
  * carry per-element membership, so |A ∩ B| comes from the Jaccard share
  * of the merged sample (ops.Kmv.pairwiseOverlap) — the estimator HLL
  * cannot express. Buffer is exactly k longs; output is the ascending
  * array<long> of surviving hashes (deterministic for a fixed input SET,
  * so partitioning/merge order can never change the sketch — pinned in
  * KmvSpec).
  *
  * The reference engine has no sketch surface; this extends the brief's
  * scale family (a8 HLL, a14 CMS, a23 MRL quantiles) with set-overlap
  * estimation between corpus slices.
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // bounded set of the k smallest distinct values: an incoming value
    // only displaces the current maximum, and duplicates are free (set)
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last() && buf.add(v)) { buf.pollLast(); () }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_sketch"
  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** `kmv_sketch(hash, k)`: ascending array of the k smallest distinct
    * long values. Pair with a deterministic cross-engine hash (ops.Kmv
    * uses an md5 prefix) when the sketch must cross the oracle gate.
    */
  def kmv_sketch(c: Column, k: Int): Column =
    GraftShims.column(KmvAgg(GraftShims.expression(c.cast("long")), k)
      .toAggregateExpression())
}
