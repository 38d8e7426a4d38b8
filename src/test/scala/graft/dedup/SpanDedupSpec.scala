package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SpanDedupSpec extends SparkTestBase {

  import SpanDedup.dupSpanStats

  test("hand-checked corpus: shared and repeated spans are counted, unique ones are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // 9 tokens, 7 trigrams
      (2L, "a quick brown fox jumps over a fence today ok"), // shares "quick brown fox"(+2 more)
      (3L, "x y z x y z x y z"),                             // self-repeating
      (4L, "totally unique words without any overlap here"),
      (5L, "hi")                                             // < n tokens: no spans
    ).toDF("doc_id", "text")
    val r = dupSpanStats(docs, n = 3).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    // doc1: trigrams at 7 starts; shared with doc2: "quick brown fox",
    // "brown fox jumps", "fox jumps over" -> 3 dup
    assert(r(1L) == (7L, 3L))
    assert(r(2L) == (8L, 3L))
    // doc3: 7 trigrams; "x y z" x3 and "y z x"/"z x y" x2 each -> all 7 dup
    assert(r(3L) == (7L, 7L))
    assert(r(4L) == (5L, 0L))
    assert(!r.contains(5L))
  }

  test("hash keys == string keys on the real corpus (both scales of n)") {
    val docs = graft.core.Tables.documents(spark, sf001)
    for (n <- Seq(3, 5)) {
      val h = dupSpanStats(docs, n, hashKeys = true).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val s = dupSpanStats(docs, n, hashKeys = false).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(h == s, s"n=$n")
    }
  }

  test("dup_fraction is n_dup / n_shingles exactly") {
    val rows = dupSpanStats(graft.core.Tables.documents(spark, sf001), n = 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
  }
}
