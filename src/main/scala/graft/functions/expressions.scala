package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.bit_count

/** Custom Catalyst expressions for the dedup/similarity hot path.
  *
  * The reference has no equivalent ops (its dedup is exact
  * `drop_duplicates`, /root/reference/dags/CotyData_IPN.py:166); these
  * implement the scale-path primitives (MinHash, SimHash, hyperplane LSH)
  * the brief requires. They are native expressions WITH codegen — not
  * UDFs — so they stay inside whole-stage codegen: the generated code
  * calls the static kernels in [[HashImpls]] directly, no boxing, no
  * closure serialization, null handling inherited from `defineCodeGen`.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minhashSig(input.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.minhashSig($c, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Z-order (Morton) key of two long columns, codegen'd — the clustering
  * key behind [[graft.ops.Zorder]]: range-partitioning by this key gives
  * every output file a tight min/max envelope on BOTH inputs, so parquet
  * stats prune scans on either predicate (the reference engine has no
  * layout control at all; this is the 100 TB data-skipping path).
  */
case class ZorderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  // 31 max: y's top bit at bits=32 would land in the sign bit, turning the
  // second half of the curve negative and breaking the total-order contract
  require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HashImpls.zorder2(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashImpls.zorder2($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 3-column Z-order key (see [[ZorderKey]]); bits <= 21 so the 3*bits
  * result stays clear of the sign bit.
  */
case class ZorderKey3(first: Expression, second: Expression, third: Expression,
                      bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(bits >= 1 && bits <= 21, "bits must be in [1,21]")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key3"
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    HashImpls.zorder3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.HashImpls.zorder3($a, $b, $c, $bits)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RhpSig(child: Expression, numPlanes: Int, seed: Long)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 64, "numPlanes must be in [1,64]")
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.rhpSig(input.asInstanceOf[ArrayData], numPlanes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.rhpSig($c, $numPlanes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** IVF nearest-cell assignment as a single codegen'd kernel. The centroid
  * matrix rides into generated code via `addReferenceObj` (it is model
  * state, small by construction: nCells x dim doubles). Pass UNIT
  * centroids: the kernel maximizes dot product, which equals the cosine
  * argmax when centroids are normalized. Composed higher-order functions
  * (zip_with/aggregate) are interpreted and re-evaluate the distance array
  * per reference — this expression replaced that shape after it benched
  * ~7x slower.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.nearestCell(input.asInstanceOf[ArrayData], centroids, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.nearestCell($c, $ref, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: array<float|double> embedding → one byte
  * per subspace (nearest codebook centroid by squared L2 on the
  * unit-normalized vector). The codebook matrix is model state
  * (m x k x subdim doubles, small by construction) riding into generated
  * code via `addReferenceObj`, like [[NearestCell]]'s centroids.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
                    normalize: Boolean = true)
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "codebooks must be non-empty")
  require(codebooks.head.length <= 256, "at most 256 codes per subspace (one byte)")
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.pqEncode(input.asInstanceOf[ArrayData], codebooks, isFloat, normalize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.pqEncode($c, $ref, $isFloat, $normalize)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: m*k squared L2 distances from the query's
  * unit-normalized subvectors to every codebook centroid, laid out
  * [s*k + c]. Evaluated once per query row; candidates then score in m
  * array reads via [[PqAdc]].
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]],
                 normalize: Boolean = true)
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.head.nonEmpty, "codebooks must be non-empty")
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.pqLut(input.asInstanceOf[ArrayData], codebooks, isFloat, normalize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashImpls.pqLut($c, $ref, $isFloat, $normalize)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cell-indexed PQ encode (LOPQ — Kalantidis & Avrithis, "Locally
  * Optimized Product Quantization", CVPR 2014): each coarse cell owns its
  * codebook, so the byte budget adapts to the cell's local residual
  * geometry. left = residual array, right = cell id; the full
  * per-cell codebook tensor rides into generated code via
  * `addReferenceObj` (nCells x m x k x subdim doubles — bounded model
  * state; keep nCells moderate, the LOPQ regime).
  */
case class PqEncodeCells(left: Expression, right: Expression,
                         cb4: Array[Array[Array[Array[Double]]]])
    extends BinaryExpression {
  require(cb4.nonEmpty && cb4.head.nonEmpty, "codebooks must be non-empty")
  require(cb4.head.head.length <= 256, "at most 256 codes per subspace (one byte)")
  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode_cells"
  override protected def nullSafeEval(res: Any, cell: Any): Any =
    HashImpls.pqEncodeCells(res.asInstanceOf[ArrayData], cell.asInstanceOf[Long], cb4, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbs", cb4, "double[][][][]")
    defineCodeGen(ctx, ev, (r, c) =>
      s"graft.functions.HashImpls.pqEncodeCells($r, $c, $ref, $isFloat)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cell-indexed per-query LUT — [[PqEncodeCells]]'s probe-side dual. */
case class PqLutCells(left: Expression, right: Expression,
                      cb4: Array[Array[Array[Array[Double]]]])
    extends BinaryExpression {
  require(cb4.nonEmpty && cb4.head.nonEmpty, "codebooks must be non-empty")
  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut_cells"
  override protected def nullSafeEval(res: Any, cell: Any): Any =
    HashImpls.pqLutCells(res.asInstanceOf[ArrayData], cell.asInstanceOf[Long], cb4, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbs", cb4, "double[][][][]")
    defineCodeGen(ctx, ev, (r, c) =>
      s"graft.functions.HashImpls.pqLutCells($r, $c, $ref, $isFloat)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric PQ distance between a code array and a query LUT — the
  * codegen'd inner loop of the compressed ANN scan.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    HashImpls.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.HashImpls.pqAdc($c, $l)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PassJoin segment keys for the index side of an edit-distance join:
  * one packed "n|i|segment" key per segment (tau+1 of them), or a
  * per-length "small" bucket for degenerate lengths. See
  * [[HashImpls.passJoinIndexKeys]] for the losslessness argument.
  */
case class PassJoinIndexKeys(child: Expression, tau: Int) extends UnaryExpression {
  require(tau >= 1, "tau must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "passjoin_index_keys"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.passJoinIndexKeys(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.passJoinIndexKeys($c, $tau)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PassJoin candidate keys for the probe side: every (candidate length,
  * segment, +-tau shift) substring the theorem allows — a bounded
  * (2tau+1)(tau+1)(2tau+1) keys per probe, deduplicated.
  */
case class PassJoinProbeKeys(child: Expression, tau: Int) extends UnaryExpression {
  require(tau >= 1, "tau must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "passjoin_probe_keys"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.passJoinProbeKeys(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.passJoinProbeKeys($c, $tau)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom-filter membership probe against a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (Spark's public sketch API;
  * `DataFrameStatFunctions.bloomFilter` builds it distributed). The filter
  * rides into generated code via `addReferenceObj` like the PQ codebooks;
  * false positives are possible by contract, false negatives are not —
  * callers MUST re-verify with an exact join. Long keys only (join keys).
  */
case class BloomMightContain(child: Expression,
                             filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT key, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-grams of a token array as one codegen'd kernel. The composed
  * higher-order form (`transform(sequence(1, size-n+1), i ->
  * concat_ws(" ", element_at(t, i), ...))`) evaluates interpreted, and a
  * lambda body referencing the array per element re-evaluates the child
  * expression each time — this expression replaces that shape in the
  * n-gram dedup/decontamination paths (null-token skipping matches
  * concat_ws; `distinct` matches array_distinct's keep-first).
  */
case class Ngrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"
  override protected def nullSafeEval(input: Any): Any =
    TextImpls.ngrams(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextImpls.ngrams($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SORTED distinct word k-shingles as one codegen'd kernel (see
  * [[TextImpls.shinglesSorted]]) — replaces the interpreted
  * transform/slice/concat_ws/filter/array_distinct chain of the near-dup
  * shingling path, and its sorted output feeds [[SortedIntersectCount]]
  * in the verify stage without a per-pair sort. Short-document semantics
  * (whole text as one shingle when tokens < k) deliberately match the
  * composed shape, NOT [[Ngrams]] (which yields none).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_sorted"
  override protected def nullSafeEval(input: Any): Any =
    TextImpls.shinglesSorted(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextImpls.shinglesSorted($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Merge-walk intersection count of two sorted duplicate-free string
  * arrays (see [[TextImpls.sortedIntersectCount]]) — the exact-verify
  * kernel of the set-similarity join, replacing array_intersect's per-row
  * hash-set build.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextImpls.sortedIntersectCount(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextImpls.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization as a codegen'd expression — the standard
  * corpus-prep canonicalization ("é" as one codepoint vs "e"+combining
  * accent must hash/dedup/join identically). A Scala UDF would close over
  * nothing and still pay serialization + interpreted eval; this inherits
  * `defineCodeGen` null handling and stays inside whole-stage codegen,
  * with an ASCII fast path that skips the String round-trip. DuckDB's
  * nfc_normalize is the cross-engine oracle (t20).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextImpls.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextImpls.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API. */
object functions {
  private def expr(c: Column): Expression = GraftShims.expression(c)
  private def toCol(e: Expression): Column = GraftShims.column(e)

  /** Unicode NFC normalization (codegen'd; ASCII fast path). */
  def nfc_normalize(s: Column): Column = toCol(NfcNormalize(expr(s)))

  def minhash_sig(tokens: Column, numHashes: Int, seed: Long = 42L): Column =
    toCol(MinHashSig(expr(tokens), numHashes, seed))

  def simhash64(tokens: Column): Column = toCol(SimHash64(expr(tokens)))

  /** Z-order (Morton) key over the low `bits` bits of two columns, codegen'd. */
  def zorder_key(x: Column, y: Column, bits: Int = 16): Column =
    toCol(ZorderKey(expr(x.cast("long")), expr(y.cast("long")), bits))

  /** 3-column Z-order key (bits <= 21), codegen'd. */
  def zorder_key3(x: Column, y: Column, z: Column, bits: Int = 16): Column =
    toCol(ZorderKey3(expr(x.cast("long")), expr(y.cast("long")),
      expr(z.cast("long")), bits))

  def rhp_sig(embedding: Column, numPlanes: Int, seed: Long = 42L): Column =
    toCol(RhpSig(expr(embedding), numPlanes, seed))

  /** Nearest unit-centroid cell id (IVF assignment), codegen'd. */
  def nearest_cell(embedding: Column, unitCentroids: Seq[Seq[Double]]): Column =
    toCol(NearestCell(expr(embedding), unitCentroids.map(_.toArray).toArray))

  /** Hamming distance between two packed 64-bit signatures — built-ins only
    * (XOR + bit_count), codegen'd.
    */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Space-joined word n-grams of a token array, codegen'd. */
  def ngrams(tokens: Column, n: Int, distinct: Boolean = false): Column =
    toCol(Ngrams(expr(tokens), n, distinct))

  /** Sorted distinct word k-shingles (codegen'd; see [[Shingles]]). */
  def shingles_sorted(tokens: Column, k: Int): Column =
    toCol(Shingles(expr(tokens), k))

  /** PQ codes (one byte per subspace) for an embedding, codegen'd.
    * `normalize = false` is the residual-PQ path: the input is already a
    * residual whose magnitude is the signal.
    */
  def pq_encode(embedding: Column, codebooks: Array[Array[Array[Double]]],
                normalize: Boolean = true): Column =
    toCol(PqEncode(expr(embedding), codebooks, normalize))

  /** PQ asymmetric-distance lookup table for a query embedding, codegen'd. */
  def pq_lut(embedding: Column, codebooks: Array[Array[Array[Double]]],
             normalize: Boolean = true): Column =
    toCol(PqLut(expr(embedding), codebooks, normalize))

  /** Asymmetric PQ distance of a code array against a query LUT, codegen'd. */
  def pq_adc(codes: Column, lut: Column): Column =
    toCol(PqAdc(expr(codes), expr(lut)))

  /** Cell-indexed (LOPQ) residual encode / LUT, codegen'd. */
  def pq_encode_cells(res: Column, cell: Column,
                      cb4: Array[Array[Array[Array[Double]]]]): Column =
    toCol(PqEncodeCells(expr(res), expr(cell), cb4))
  def pq_lut_cells(res: Column, cell: Column,
                   cb4: Array[Array[Array[Array[Double]]]]): Column =
    toCol(PqLutCells(expr(res), expr(cell), cb4))

  /** Bloom-filter membership probe (long keys), codegen'd. */
  def bloom_might_contain(key: Column,
                          filter: org.apache.spark.util.sketch.BloomFilter): Column =
    toCol(BloomMightContain(expr(key), filter))

  /** Intersection size of two sorted duplicate-free string arrays,
    * codegen'd merge walk.
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(expr(a), expr(b)))

  /** PassJoin blocking keys (index / probe sides), codegen'd. */
  def passjoin_index_keys(s: Column, tau: Int): Column =
    toCol(PassJoinIndexKeys(expr(s), tau))
  def passjoin_probe_keys(s: Column, tau: Int): Column =
    toCol(PassJoinProbeKeys(expr(s), tau))
}
