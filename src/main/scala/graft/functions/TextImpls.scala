package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels invoked from generated code (see expressions.scala).
  *
  * Word n-gram generation lived as composed higher-order functions
  * (`transform(sequence(...), i -> concat_ws(element_at...))`) first; those
  * evaluate interpreted, re-evaluate per-element children, and sit outside
  * whole-stage codegen. This kernel is one tight loop per row.
  */
object TextImpls {

  private val Space = UTF8String.fromString(" ")

  /** Unicode NFC normalization (canonical composition). Fast path: pure
    * ASCII bytes are NFC by definition and skip the String round-trip
    * entirely — on a mostly-ASCII corpus the kernel is a byte scan.
    */
  def nfc(s: UTF8String): UTF8String = {
    // getByte, not getBytes: an UnsafeRow-backed string rarely spans its
    // full backing array, so getBytes would copy per row — the fast path
    // must stay allocation-free to be a fast path
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  /** Space-joined word n-grams of a token array. Null tokens are skipped
    * inside a gram (concat_ws semantics); arrays shorter than `n` yield an
    * empty result; `distinct` keeps first occurrences in order
    * (array_distinct semantics).
    */
  def ngrams(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      words(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](cnt - n + 1)
    val gram = new Array[UTF8String](n)
    var k = 0
    while (k <= cnt - n) {
      var j = 0
      while (j < n) { gram(j) = words(k + j); j += 1 }
      out(k) = UTF8String.concatWs(Space, gram: _*)
      k += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var m = 0
      while (m < out.length) { seen.add(out(m).asInstanceOf[UTF8String]); m += 1 }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  /** SORTED distinct word k-shingles of a token array — the near-dup
    * path's shingle kernel ([[graft.functions.Shingles]]). Semantics match
    * the composed-HOF shape it replaced
    * (`array_distinct(filter(transform(sequence(0, greatest(size-k, 0)),
    * i -> concat_ws(" ", slice(toks, i+1, k))), s -> s != ""))`):
    * a document SHORTER than k tokens yields its whole text as ONE
    * shingle (not zero — `ngrams` semantics differ there), null tokens
    * are skipped inside a shingle (concat_ws), and empty shingles are
    * dropped. Output order is ascending byte-wise (UTF8String.compareTo)
    * instead of first-occurrence — MinHash signatures are
    * order-independent (min over element hashes) and Jaccard is a set
    * measure, and sorted output feeds [[sortedIntersectCount]] directly,
    * replacing array_intersect/array_union's per-pair hash-set builds in
    * the verify stage.
    */
  def shinglesSorted(toks: ArrayData, k: Int): ArrayData = {
    val cnt = toks.numElements()
    val words = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      words(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val nOut = math.max(cnt - k, 0) + 1
    val out = new Array[UTF8String](nOut)
    val gram = new Array[UTF8String](k)
    var m = 0
    var s = 0
    while (s < nOut) {
      val w = math.min(k, cnt - s) // short doc: one window of all tokens
      var j = 0
      while (j < w) { gram(j) = words(s + j); j += 1 }
      while (j < k) { gram(j) = null; j += 1 } // concatWs skips nulls
      val g = UTF8String.concatWs(Space, gram: _*)
      if (g.numBytes() > 0) { out(m) = g; m += 1 }
      s += 1
    }
    java.util.Arrays.sort(out.asInstanceOf[Array[Object]], 0, m)
    // dedupe adjacent equals in place (sorted => distinct == unique-adjacent)
    var u = 0
    var r = 0
    while (r < m) {
      if (u == 0 || !out(r).equals(out(u - 1))) { out(u) = out(r); u += 1 }
      r += 1
    }
    val res = new Array[Any](u)
    var q = 0
    while (q < u) { res(q) = out(q); q += 1 }
    new GenericArrayData(res)
  }

  /** Intersection size of two SORTED, duplicate-free string arrays as one
    * merge walk — zero allocation, byte-wise UTF8String compares only.
    * `array_intersect` builds a per-row hash set of UTF8Strings; at
    * millions of verify pairs that allocation is the dominant cost
    * (SetSimJoin's measurement). Callers must sort with `array_sort`
    * (same byte-wise order as UTF8String.compareTo) and dedupe first —
    * unsorted input silently undercounts, so keep this behind APIs that
    * own the sorting.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
