package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring over a document corpus (text-analysis family).
  *
  * Standard Okapi BM25: idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b +
  * b*|d|/avgdl)). Corpus statistics (N, avgdl, df per term) are computed
  * once and folded into the per-document expression as literals — the
  * scoring pass is a pure projection on the scan, no join, no shuffle.
  * Cross-engine float parity is NOT promised (log/ordering differ), so
  * BM25 is pinned by invariant tests rather than a DuckDB oracle.
  */
object Bm25 {

  final case class TermStats(term: String, df: Long, idf: Double)

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Corpus stats for the query terms (one aggregation pass). Terms are
    * lowercased to match the lowercased tokenizer.
    */
  def termStats(docs: DataFrame, textCol: String, terms0: Seq[String]): (Long, Double, Seq[TermStats]) = {
    val terms = terms0.map(_.toLowerCase)
    val t = tokens(col(textCol))
    val aggs = count(lit(1)).as("n") +: avg(size(t)).as("avgdl") +:
      terms.zipWithIndex.map { case (term, i) =>
        sum(when(array_contains(t, term), 1L).otherwise(0L)).as(s"df_$i")
      }
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val avgdl = if (row.isNullAt(1)) 1.0 else row.getDouble(1) // empty corpus
    val stats = terms.zipWithIndex.map { case (term, i) =>
      val df = if (row.isNullAt(2 + i)) 0L else row.getLong(2 + i) // empty corpus
      // BM25+ style idf, floored at 0 (never negative for very common terms).
      // Quantized to a 1e-7 grid: libm log implementations differ by a few
      // ulps across engines, and idf is the ONLY transcendental input to the
      // score — snapping it makes BM25 bit-reproducible everywhere while
      // perturbing the value ~9 orders of magnitude below ranking relevance.
      val raw = math.max(0.0, math.log((n - df + 0.5) / (df + 0.5) + 1.0))
      val idf = math.floor(raw * 1e7 + 0.5) / 1e7
      TermStats(term, df, idf)
    }
    (n, avgdl, stats)
  }

  /** doc scores for a bag-of-terms query (empty term set scores 0.0). */
  def score(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (_, avgdl, stats) = termStats(docs, textCol, terms)
    val t = tokens(col(textCol))
    val dl = size(t).cast("double")
    val norm = lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avgdl))
    val termScores: Seq[Column] = stats.map { s =>
      val tf = size(filter(t, x => x === s.term)).cast("double")
      lit(s.idf) * tf * lit(k1 + 1) / (tf + norm)
    }
    docs.select(col(idCol), termScores.foldLeft(lit(0.0))(_ + _).as("bm25"))
  }
}
