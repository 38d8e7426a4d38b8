package graft.text

import graft.SparkTestBase
import graft.core.Tables

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the dictionary from Sennrich et al. (ACL 2016), figure 1
  private val dictDf =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")

  test("training reproduces the published example's first merges") {
    val merges = Bpe.trainMerges(dictDf, nMerges = 5)
    // ties at weight 9 resolve lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
  }

  test("encoding follows the greedy lowest-rank loop; unseen words fall back to chars") {
    val rank = Bpe.trainMerges(dictDf, nMerges = 5).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", rank).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", rank).toSeq == Seq("low", "</w>"))
    assert(Bpe.encodeWord("xyz", rank).toSeq == Seq("x", "y", "z", "</w>"))
  }

  test("tokens always concatenate back to the word plus the end marker") {
    val rank = Bpe.trainMerges(dictDf, nMerges = 5).zipWithIndex.toMap
    for (w <- Seq("lowest", "newestest", "a", "réclame", "low"))
      assert(Bpe.encodeWord(w, rank).mkString == w + "</w>", w)
  }

  test("supplementary characters are whole base symbols, never surrogate halves") {
    // U+1F600 (emoji) and U+20089 (CJK-B) are outside the BMP: two UTF-16
    // units each. Base symbols must be one string per CODE POINT, and
    // every emitted token must be a valid (unpaired-surrogate-free) string.
    val emoji = new String(Character.toChars(0x1F600))
    val cjkb = new String(Character.toChars(0x20089))
    val word = s"a$emoji$cjkb"
    val toks = Bpe.encodeWord(word, Map.empty)
    assert(toks.toSeq == Seq("a", emoji, cjkb, "</w>"), toks.toSeq)
    assert(toks.forall(t => t.codePoints().toArray.forall(cp =>
      !Character.isSurrogate(cp.toChar) || Character.charCount(cp) == 2)))
    // training on a dict containing the word keeps merges codepoint-aligned
    val merges = Bpe.trainMerges(Seq((word, 5L)).toDF("word", "freq"), nMerges = 2)
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { s =>
        // no token fragment starts or ends mid-code-point
        assert(!Character.isLowSurrogate(s.charAt(0)), s"leading low surrogate in $s")
        assert(!Character.isHighSurrogate(s.charAt(s.length - 1)), s"trailing high surrogate in $s")
      }
    }
  }

  test("corpus-trained encode is deterministic and partitioning-invariant") {
    val docs = Tables.documents(spark, sf001).limit(300)
    val merges = Bpe.trainMerges(Bpe.wordFreq(docs), nMerges = 30, vocabCap = 2000)
    val a = Bpe.encodeDocs(docs, merges).collect().map(d => d.doc_id -> d).toMap
    val b = Bpe.encodeDocs(docs.repartition(13), merges)
      .collect().map(d => d.doc_id -> d).toMap
    assert(a == b)
    // merges genuinely compress: subword count strictly below char count
    // and at or above word count
    val some = a.values.filter(_.n_words > 0)
    assert(some.nonEmpty)
    assert(some.forall(d => d.n_bpe_tokens >= d.n_words))
    // retraining on a different partitioning picks identical merges
    val merges2 = Bpe.trainMerges(Bpe.wordFreq(docs.repartition(7)),
      nMerges = 30, vocabCap = 2000)
    assert(merges == merges2)
  }
}
