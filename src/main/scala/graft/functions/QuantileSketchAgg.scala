package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile sketch — the STORED/MERGEABLE shape
  * for percentiles, completing the sketch warehouse symmetry (HLL
  * registers, CMS, Misra-Gries, TopK all already have it): build one
  * small sketch per group/partition/day ONCE, persist the bytes, then
  * answer any later quantile query by merging sketches — never
  * rescanning the 100 TB of raw rows that built them. Spark's own
  * percentile_approx (a13) answers one query per scan and its GK state
  * is not a storable column.
  *
  * Structure: the classic multi-level buffer collapse (Munro-Paterson /
  * MRL lineage — Manku, Rajagopalan, Lindsay SIGMOD'98): `levels(i)` is a
  * sorted run whose elements each stand for `2^i` input rows; a full
  * level sorts, keeps every second element, and promotes the half —
  * O(k * log(n/k)) stored doubles for n inputs. Compaction keeps odd or
  * even positions ALTERNATELY per level (deterministic — no RNG anywhere,
  * per the repo's reproducibility discipline), which cancels the
  * systematic rank bias a fixed offset would accumulate; the residual
  * per-compaction rank error is <= the collapsed level's weight, giving
  * the standard eps ~ log^2(n/k)/k bound. QuantileSketchSpec pins the
  * observed rank error (<= 1% of n on the 600k-row bench table at
  * k = 256, two partitionings) rather than the loose worst case.
  *
  * Determinism contract: identical input MULTISET in identical arrival
  * order -> identical bytes; across different partitionings the bytes
  * differ but every estimate stays inside the pinned rank-error bound
  * (same contract as a13's built-in GK, which is also merge-order-
  * sensitive).
  */
object QuantileSketch {

  /** Mutable sketch state. `buf0` holds weight-1 raw values (unsorted
    * until its first collapse); `levels(i)` (i >= 1) holds a SORTED run
    * of weight-2^i survivors, at most `k` long; `flips(i)` alternates
    * the kept parity per level.
    */
  final class Buffer(val k: Int) {
    var n: Long = 0L
    var buf0 = new java.util.ArrayList[Double](k)
    var levels: Array[Array[Double]] = Array.empty
    var flips: Array[Boolean] = Array.empty
    /** buf0's own kept-parity toggle. Distinct from `flips(0)` so the
      * weight-1 collapse and the level-1 collapse each alternate strictly
      * within themselves — sharing one flag would interleave the toggles
      * and break per-level alternation at the two lowest levels.
      */
    var flip0: Boolean = false

    private def ensureLevel(i: Int): Unit =
      if (levels.length < i) {
        val nl = Array.fill(math.max(i, levels.length))(Array.empty[Double])
        System.arraycopy(levels, 0, nl, 0, levels.length)
        val nf = new Array[Boolean](nl.length)
        System.arraycopy(flips, 0, nf, 0, flips.length)
        levels = nl; flips = nf
      }

    /** Keep every second element of a sorted run, parity alternating per
      * level; the survivors' weight doubles.
      */
    private def compact(sorted: Array[Double], level: Int): Array[Double] = {
      ensureLevel(level + 1)
      val start = if (flips(level)) 1 else 0
      flips(level) = !flips(level)
      val out = new Array[Double]((sorted.length - start + 1) / 2)
      var i = start; var j = 0
      while (i < sorted.length) { out(j) = sorted(i); j += 1; i += 2 }
      out
    }

    private def mergeSorted(a: Array[Double], b: Array[Double]): Array[Double] = {
      val out = new Array[Double](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length && j < b.length) {
        if (a(i) <= b(j)) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
        o += 1
      }
      while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
      while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
      out
    }

    /** Fold a sorted run into level `i` (weight 2^i), cascading collapses
      * while a level overflows `k`.
      */
    def promote(i: Int, run: Array[Double]): Unit = {
      var level = i
      var incoming = run
      while (incoming.nonEmpty) {
        ensureLevel(level)
        val merged = mergeSorted(levels(level - 1), incoming)
        if (merged.length < k) { levels(level - 1) = merged; return }
        levels(level - 1) = Array.empty
        incoming = compact(merged, level - 1)
        level += 1
      }
    }

    private def collapseBuf0(): Unit = {
      val arr = new Array[Double](buf0.size)
      var i = 0
      while (i < arr.length) { arr(i) = buf0.get(i); i += 1 }
      java.util.Arrays.sort(arr)
      buf0.clear()
      ensureLevel(1)
      val start = if (flip0) 1 else 0
      flip0 = !flip0
      val half = new Array[Double]((arr.length - start + 1) / 2)
      var j = 0; var p = start
      while (p < arr.length) { half(j) = arr(p); j += 1; p += 2 }
      promote(1, half)
    }

    def add(v: Double): Unit = {
      buf0.add(v); n += 1
      if (buf0.size >= k) collapseBuf0()
    }

    def mergeIn(other: Buffer): Unit = {
      n += other.n // covers other's buf0 and levels; append raw, not add()
      var i = 0
      while (i < other.buf0.size) {
        buf0.add(other.buf0.get(i))
        if (buf0.size >= k) collapseBuf0()
        i += 1
      }
      var l = 1
      while (l <= other.levels.length) {
        if (other.levels(l - 1).nonEmpty) promote(l, other.levels(l - 1))
        l += 1
      }
    }

    /** Estimated value at quantile `p` (0..1): walk the weighted merged
      * runs to rank ceil(p * n), midpoint-rank convention per element.
      */
    def quantile(p: Double): Double = {
      require(n > 0, "quantile of an empty sketch")
      val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < buf0.size) { items += ((buf0.get(i), 1L)); i += 1 }
      var l = 0
      while (l < levels.length) {
        val w = 1L << (l + 1)
        levels(l).foreach(v => items += ((v, w)))
        l += 1
      }
      val sorted = items.sortBy(_._1)
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L; var idx = 0
      while (idx < sorted.length) {
        cum += sorted(idx)._2
        if (cum >= target) return sorted(idx)._1
        idx += 1
      }
      sorted.last._1
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k); out.writeLong(n)
      out.writeBoolean(flip0)
      out.writeInt(buf0.size)
      var i = 0
      while (i < buf0.size) { out.writeDouble(buf0.get(i)); i += 1 }
      out.writeInt(levels.length)
      levels.indices.foreach { l =>
        out.writeBoolean(flips(l))
        out.writeInt(levels(l).length)
        levels(l).foreach(out.writeDouble)
      }
      out.flush(); bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buffer(in.readInt())
    b.n = in.readLong()
    b.flip0 = in.readBoolean()
    val n0 = in.readInt()
    var i = 0
    while (i < n0) { b.buf0.add(in.readDouble()); i += 1 }
    val nl = in.readInt()
    b.levels = new Array[Array[Double]](nl)
    b.flips = new Array[Boolean](nl)
    var l = 0
    while (l < nl) {
      b.flips(l) = in.readBoolean()
      val sz = in.readInt()
      val arr = new Array[Double](sz)
      var j = 0
      while (j < sz) { arr(j) = in.readDouble(); j += 1 }
      b.levels(l) = arr
      l += 1
    }
    b
  }

  /** `quantile_sketch(col, k)`: binary mergeable sketch of a double column. */
  def quantile_sketch(c: Column, k: Int = 256): Column =
    GraftShims.column(QuantileSketchAgg(GraftShims.expression(c.cast("double")), k)
      .toAggregateExpression())

  /** `quantile_sketch_merge(col)`: merge a column of stored sketches. */
  def quantile_sketch_merge(c: Column): Column =
    GraftShims.column(QuantileSketchMergeAgg(GraftShims.expression(c))
      .toAggregateExpression())

  /** `sketch_quantiles(sketch, probs)`: array of estimates, one per prob. */
  def sketch_quantiles(sketch: Column, probs: Seq[Double]): Column = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1], got $probs")
    sketch_quantiles(sketch,
      org.apache.spark.sql.functions.array(
        probs.map(org.apache.spark.sql.functions.lit): _*))
  }

  /** `sketch_count(sketch)`: the number of rows a stored sketch summarizes
    * — the support count a serving query reports next to its estimates.
    */
  def sketch_count(sketch: Column): Column =
    GraftShims.column(SketchCount(GraftShims.expression(sketch)))

  /** Column-probed variant: `probs` is any array<double> expression — a
    * per-row column, e.g. from joining a stored sketch table against a
    * quantile-request table ("p99 by day for these 40 percentiles") — not
    * only a literal list baked into the plan.
    */
  def sketch_quantiles(sketch: Column, probs: Column): Column =
    GraftShims.column(SketchQuantiles(GraftShims.expression(sketch),
      GraftShims.expression(probs.cast("array<double>"))))
}

/** Build aggregate: doubles in, sketch bytes out (null input rows skipped,
  * matching percentile_approx).
  */
case class QuantileSketchAgg(child: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buffer] {
  require(k >= 8, s"k must be >= 8, got $k")

  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(k)
  override def update(b: QuantileSketch.Buffer, in: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }
  override def merge(b: QuantileSketch.Buffer, o: QuantileSketch.Buffer)
      : QuantileSketch.Buffer = { b.mergeIn(o); b }
  override def eval(b: QuantileSketch.Buffer): Any = b.serialize()
  override def serialize(b: QuantileSketch.Buffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer =
    QuantileSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quantile_sketch"
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = c.head)
}

/** Merge aggregate: stored sketch bytes in, one merged sketch out — the
  * serve-side half of build-once/query-many.
  */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buffer] {

  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(0) // placeholder; first merge replaces k
  override def update(b: QuantileSketch.Buffer, in: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(in)
    if (v == null) b
    else {
      val o = QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]])
      if (b.k == 0) o else { b.mergeIn(o); b }
    }
  }
  override def merge(b: QuantileSketch.Buffer, o: QuantileSketch.Buffer)
      : QuantileSketch.Buffer =
    if (b.k == 0) o else if (o.k == 0) b else { b.mergeIn(o); b }
  override def eval(b: QuantileSketch.Buffer): Any = b.serialize()
  override def serialize(b: QuantileSketch.Buffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer =
    QuantileSketch.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "quantile_sketch_merge"
  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(child = c.head)
}

/** Decode a stored sketch's row count (a header read — no level walk). */
case class SketchCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def nullSafeEval(input: Any): Any =
    QuantileSketch.deserialize(input.asInstanceOf[Array[Byte]]).n
  override def dataType: DataType = LongType
  override def prettyName: String = "sketch_count"
  override protected def withNewChildInternal(newChild: Expression): SketchCount =
    copy(child = newChild)
}

/** Decode a stored sketch and answer a probe list — one eval per GROUP
  * row, not per input row, so CodegenFallback is off the hot path by
  * construction (the CountingCapFilter rationale). `probs` is an
  * array<double> EXPRESSION (a literal for the fixed-list API, or a
  * per-row column for request-table joins); out-of-range or null probes
  * fail loudly rather than estimating garbage.
  */
case class SketchQuantiles(sketch: Expression, probs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = probs

  override def nullSafeEval(sk: Any, ps: Any): Any = {
    val b = QuantileSketch.deserialize(sk.asInstanceOf[Array[Byte]])
    val arr = ps.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException("sketch_quantiles: null probe")
      val p = arr.getDouble(i)
      require(p >= 0.0 && p <= 1.0, s"sketch_quantiles: probe $p outside [0, 1]")
      out(i) = b.quantile(p)
      i += 1
    }
    new GenericArrayData(out)
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sketch_quantiles"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchQuantiles =
    copy(sketch = newLeft, probs = newRight)
}
