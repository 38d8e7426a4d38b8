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
