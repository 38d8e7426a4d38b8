package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels invoked from generated code (see expressions.scala).
  *
  * All hashing is self-contained (FNV-1a + splitmix64) so signatures are
  * deterministic across JVMs, partitions, and Spark versions — a hard
  * requirement for dedup keys that must agree across a 1000-executor
  * cluster and across reruns.
  */
object HashImpls {

  final val Prime64 = 0x100000001b3L
  final val Basis64 = 0xcbf29ce484222325L

  /** FNV-1a over UTF8 bytes. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = Basis64
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime64; i += 1 }
    h
  }

  /** Morton/Z-order interleave of the low `bits` bits of x (even output
    * positions) and y (odd positions). Total order on the result is the
    * Z-curve walk of the (x, y) grid — nearby points in either dimension
    * stay nearby in the key, which is what makes min/max file stats
    * selective on BOTH columns after range-partitioning by the key.
    */
  def zorder2(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i) | ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** 3-way Morton interleave: x stride-3 offset 0, y offset 1, z offset 2.
    * bits <= 21 keeps 3*bits inside the positive long range.
    */
  def zorder3(x: Long, y: Long, z: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((x >>> i) & 1L) << (3 * i) |
             ((y >>> i) & 1L) << (3 * i + 1) |
             ((z >>> i) & 1L) << (3 * i + 2)
      i += 1
    }
    out
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature: one pass over the shingle array computing all
    * `numHashes` permutation minima (hash family = splitmix64(base ^ f(j))).
    * Null/absent shingles are skipped; an empty array yields Long.MaxValue
    * in every slot (matches "no shingles" semantics).
    */
  def minhashSig(shingles: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv64(shingles.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val h = splitmix64(base ^ splitmix64(seed + j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token array: per-bit vote of each token's hash,
    * sign of the vote becomes the bit. Near-duplicate documents land within
    * a small Hamming distance.
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = splitmix64(fnv64(tokens.getUTF8String(i)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** IVF cell assignment: argmax of dot(emb, centroid) over a small
    * centroid matrix (callers pass UNIT centroids, making dot-argmax ==
    * cosine-argmax). Ties keep the first (lowest) cell id. One tight loop,
    * no allocation — the per-row kernel that lets cell assignment run as a
    * projection inside whole-stage codegen instead of a join + window.
    */
  def nearestCell(emb: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Long = {
    val d = emb.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var cIdx = 0
    while (cIdx < centroids.length) {
      val c = centroids(cIdx)
      val m = math.min(d, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        dot += (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * c(i)
        i += 1
      }
      if (dot > bestDot) { bestDot = dot; best = cIdx }
      cIdx += 1
    }
    best.toLong
  }

  /** Copy an embedding into a unit-normalized double[] (zero vectors pass
    * through unscaled). PQ kernels normalize INSIDE the kernel so corpus
    * encoding and query LUTs can never disagree about scaling.
    */
  def toUnit(emb: ArrayData, isFloat: Boolean): Array[Double] = {
    val d = emb.numElements()
    val v = new Array[Double](d)
    var ss = 0.0
    var i = 0
    while (i < d) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      v(i) = x; ss += x * x; i += 1
    }
    val n = math.sqrt(ss)
    if (n > 0.0) { i = 0; while (i < d) { v(i) /= n; i += 1 } }
    v
  }

  /** Copy an embedding into a double[] verbatim — the residual-PQ path,
    * where the input is already a residual whose MAGNITUDE is the signal
    * and must not be rescaled.
    */
  def toRaw(emb: ArrayData, isFloat: Boolean): Array[Double] = {
    val d = emb.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      v(i) = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      i += 1
    }
    v
  }

  /** Product-quantization encode: per-subspace nearest codebook centroid
    * (squared L2 on the unit-normalized vector — or the raw vector when
    * `normalize` is false, the residual-PQ path; ties keep the lowest
    * code). codebooks(s)(c) is the subdim-length centroid c of subspace s;
    * the result is one byte per subspace — the compressed representation a
    * 100 TB embedding store scans instead of raw floats.
    */
  def pqEncode(emb: ArrayData, codebooks: Array[Array[Array[Double]]],
               isFloat: Boolean, normalize: Boolean): ArrayData = {
    val v = if (normalize) toUnit(emb, isFloat) else toRaw(emb, isFloat)
    val m = codebooks.length
    val codes = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val sub = codebooks(s)
      val subdim = sub(0).length
      val off = s * subdim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        val cent = sub(c)
        var dist = 0.0
        var j = 0
        while (j < subdim) {
          val x = if (off + j < v.length) v(off + j) else 0.0
          val diff = x - cent(j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric-distance lookup table for one query: m*k squared L2
    * distances from each query subvector to each codebook centroid, laid
    * out [s*k + c]. Computed ONCE per query (O(k*dim)); scoring a candidate
    * is then m array reads ([[pqAdc]]).
    */
  def pqLut(emb: ArrayData, codebooks: Array[Array[Array[Double]]],
            isFloat: Boolean, normalize: Boolean): ArrayData = {
    val v = if (normalize) toUnit(emb, isFloat) else toRaw(emb, isFloat)
    val m = codebooks.length
    val k = codebooks(0).length
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val sub = codebooks(s)
      val subdim = sub(0).length
      val off = s * subdim
      var c = 0
      while (c < k) {
        val cent = sub(c)
        var dist = 0.0
        var j = 0
        while (j < subdim) {
          val x = if (off + j < v.length) v(off + j) else 0.0
          val diff = x - cent(j)
          dist += diff * diff
          j += 1
        }
        lut(s * k + c) = dist
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  /** Cell-indexed PQ encode/LUT (LOPQ: one codebook per coarse cell).
    * cb4(cell) is that cell's m x k x subdim codebook; residual inputs are
    * never normalized (magnitude is the signal).
    */
  def pqEncodeCells(emb: ArrayData, cell: Long,
                    cb4: Array[Array[Array[Array[Double]]]],
                    isFloat: Boolean): ArrayData =
    pqEncode(emb, cb4(cell.toInt), isFloat, normalize = false)

  def pqLutCells(emb: ArrayData, cell: Long,
                 cb4: Array[Array[Array[Array[Double]]]],
                 isFloat: Boolean): ArrayData =
    pqLut(emb, cb4(cell.toInt), isFloat, normalize = false)

  /** Asymmetric distance: sum of per-subspace LUT entries selected by the
    * candidate's codes. k is implied by the layout (lut.length / codes
    * .length). The per-candidate cost is m reads — the reason PQ scans
    * sustain billions of comparisons.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val k = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getDouble(s * k + (codes.getByte(s) & 0xff))
      s += 1
    }
    acc
  }

  // ---- PassJoin segment blocking (edit-distance join) -------------------
  //
  // Lossless theorem (Li, Deng, Feng: PassJoin, VLDB 2012 — public
  // algorithm): if lev(s, r) <= tau and s is partitioned into tau+1
  // segments, r contains at least one segment EXACTLY, starting within
  // +-tau of its position in s. Index side emits one key per segment;
  // probe side emits keys for every candidate length/segment/shift. Keys
  // pack as "n|i|substring" strings so both sides equi-join on one column.
  //
  // Segment scheme for length n: base = n/(tau+1), rem = n%(tau+1); the
  // first tau+1-rem segments have length base, the rest base+1. Strings
  // with n <= 2*tau can have empty/degenerate segments where the theorem's
  // containment is vacuous — they block into a per-length "small" bucket
  // instead (candidate sets stay tiny: only strings within tau of that
  // length land there).

  private def segBounds(n: Int, tau: Int): Array[(Int, Int)] = {
    val parts = tau + 1
    val base = n / parts
    val rem = n % parts
    val out = new Array[(Int, Int)](parts)
    var start = 0
    var i = 0
    while (i < parts) {
      val len = if (i < parts - rem) base else base + 1
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  def passJoinIndexKeys(s: UTF8String, tau: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n <= 2 * tau) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(s"small|$n")))
    }
    val keys = segBounds(n, tau).zipWithIndex.map { case ((start, len), i) =>
      UTF8String.fromString(s"$n|$i|${str.substring(start, start + len)}")
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  def passJoinProbeKeys(r: UTF8String, tau: Int): ArrayData = {
    val str = r.toString
    val m = str.length
    val keys = scala.collection.mutable.LinkedHashSet.empty[String]
    var n = math.max(0, m - tau)
    while (n <= m + tau) {
      if (n <= 2 * tau) keys += s"small|$n"
      else {
        val delta = m - n
        val bounds = segBounds(n, tau)
        var i = 0
        while (i < bounds.length) {
          val (start, len) = bounds(i)
          // multi-match-aware window (PassJoin §4): take segment i as the
          // FIRST matching one — each earlier segment then holds >= 1
          // error, so <= tau - i errors remain after it, pinning the
          // match position from the right: |p - (start+delta)| <= tau - i;
          // the left side always allows |p - start| <= tau. For the last
          // segment this pins p to exactly start+delta (suffix-aligned).
          var p = math.max(0, math.max(start - tau, start + delta - (tau - i)))
          val pMax = math.min(m - len, math.min(start + tau, start + delta + (tau - i)))
          while (p <= pMax) {
            keys += s"$n|$i|${str.substring(p, p + len)}"
            p += 1
          }
          i += 1
        }
      }
      n += 1
    }
    new GenericArrayData(keys.toArray.map(k =>
      UTF8String.fromString(k)).asInstanceOf[Array[Any]])
  }

  /** Random-hyperplane LSH signature over a float embedding: bit p is the
    * sign of dot(w_p, x) with w_p[i] = ±1 derived from splitmix64(seed,p,i).
    * numPlanes <= 64; the result packs into one long (cheap shuffle key).
    */
  def rhpSig(emb: ArrayData, numPlanes: Int, seed: Long): Long = {
    val d = emb.numElements()
    var out = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val w = if ((splitmix64(seed ^ (p.toLong << 32) ^ i.toLong) & 1L) == 1L) 1.0 else -1.0
        dot += w * emb.getFloat(i)
        i += 1
      }
      if (dot > 0) out |= (1L << p)
      p += 1
    }
    out
  }
}
