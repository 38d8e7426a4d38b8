package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich, Haddow & Birch,
  * ACL 2016) — REAL greedy-merge BPE, not the whitespace/regex
  * approximation: the token-counting signal a training-data pipeline
  * actually bills by.
  *
  * The algorithm is two-phase by construction, and the phases have very
  * different scale shapes:
  *  - TRAINING operates on the word-frequency dictionary, not the corpus
  *    (the paper's formulation): one distributed groupBy builds
  *    (word, freq), the top-`vocabCap` rows by (freq desc, word asc)
  *    collect as bounded model state — the same class as an IVF codebook
  *    — and the merge loop runs driver-side over that dict. A 100 TB
  *    corpus has a bounded frequent-word set; capping deterministically
  *    makes the collect size data-independent.
  *  - APPLICATION is embarrassingly parallel: the merge list broadcasts
  *    (implicitly, via closure serialization — a few KB), and each
  *    partition re-tokenizes its documents with the greedy
  *    lowest-rank-merge loop (the published GPT-2 idiom). No shuffle
  *    beyond whatever the caller aggregates afterward.
  *
  * Determinism: merge selection breaks frequency ties by lexicographic
  * pair order, so the same corpus always trains the same merge table on
  * any partitioning; application is per-word pure. The end-of-word
  * marker `</w>` keeps "est" in "widest" distinct from "est" at a word
  * end, per the paper.
  */
object Bpe {

  type Merge = (String, String)
  private val EndOfWord = "</w>"

  /** A word's base symbols: one string PER UNICODE CODE POINT (not per
    * UTF-16 unit — splitting units would cut emoji/CJK-B supplementary
    * characters into unpaired surrogate halves and let merges cross code
    * points). Matches the codepoint-level alphabet of published BPE.
    */
  private def symbols(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** (word, freq) over whitespace-lowercased tokens — the dictionary BPE
    * trains on. One map-side-combined groupBy however large the corpus.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `nMerges` merges on the top-`vocabCap` words of the dict.
    * Bounded driver work: O(vocabCap * avgWordLen) per merge round.
    */
  def trainMerges(wordFreqDf: DataFrame, nMerges: Int,
                  vocabCap: Int = 10000): Seq[Merge] = {
    // deterministic cap: (freq desc, word asc) is a total order
    val dict: Array[(Array[String], Long)] =
      wordFreqDf.orderBy(col("freq").desc, col("word"))
        .limit(vocabCap)
        .collect()
        .map(r => (symbols(r.getString(0)) :+ EndOfWord, r.getLong(1)))
    val words = dict.map(_._1.clone())
    val freqs = dict.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < nMerges) {
      // count adjacent symbol pairs, weighted by word frequency
      val counts = scala.collection.mutable.HashMap.empty[Merge, Long]
      var w = 0
      while (w < words.length) {
        val s = words(w)
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + freqs(w)
          i += 1
        }
        w += 1
      }
      if (counts.isEmpty) round = nMerges
      else {
        // max freq, ties to the lexicographically smallest pair — the
        // determinism contract
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        w = 0
        while (w < words.length) {
          val s = words(w)
          if (s.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += s(i); i += 1 }
            }
            words(w) = out.toArray
          }
          w += 1
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize one word with the trained merges: repeatedly apply the
    * LOWEST-RANK applicable merge (the published greedy loop) until none
    * applies. Pure per word; tokens concatenate back to word + `</w>`.
    */
  def encodeWord(word: String, rank: Map[Merge, Int]): Array[String] = {
    var s: Array[String] = symbols(word) :+ EndOfWord
    var done = s.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < s.length - 1) {
        val r = rank.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val out = new Array[String](s.length - 1)
        var j = 0
        while (j < bestAt) { out(j) = s(j); j += 1 }
        out(bestAt) = s(bestAt) + s(bestAt + 1)
        j = bestAt + 2
        while (j < s.length) { out(j - 1) = s(j); j += 1 }
        s = out
        done = s.length <= 1
      }
    }
    s
  }

  final case class BpeDoc(doc_id: Long, n_words: Int, n_bpe_tokens: Int,
                          tokens_md5: String)

  /** Per-document BPE stats: word count, subword-token count, and an md5
    * over the joined token stream (order-preserving content witness, the
    * ld1 pattern). Application is one mapPartitions over the corpus; the
    * merge table rides the closure.
    */
  def encodeDocs(docs: DataFrame, merges: Seq[Merge],
                 idCol: String = "doc_id",
                 textCol: String = "text"): Dataset[BpeDoc] = {
    import docs.sparkSession.implicits._
    val rank = merges.zipWithIndex.toMap
    val idIdx = docs.schema.fieldIndex(idCol)
    val txtIdx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(idIdx)
        val text = if (r.isNullAt(txtIdx)) "" else r.getString(txtIdx)
        val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        var nTok = 0
        md.reset()
        var first = true
        words.foreach { w =>
          val toks = encodeWord(w, rank)
          nTok += toks.length
          toks.foreach { t =>
            if (!first) md.update(' '.toByte)
            md.update(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            first = false
          }
        }
        BpeDoc(id, words.length, nTok,
          md.digest().map(b => f"$b%02x").mkString)
      }
    }
  }
}
