package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-substring span statistics — the corpus-level "repeated
  * n-token span" measure behind suffix-array training-data dedup (Lee et
  * al., "Deduplicating Training Data Makes Language Models Better"): a
  * span is duplicated when the same n-token shingle occurs anywhere else
  * in the corpus (another document, or again in the same one). Documents
  * shorter than n tokens have no spans and are absent from the output.
  *
  * The reference's dedup surface is exact whole-row `drop_duplicates`
  * (/root/reference/dags/CotyData_IPN.py:166); this measures sub-document
  * duplication, the signal whole-row dedup can't see.
  *
  * Scale shape: shingling is the codegen'd [[graft.functions.Ngrams]]
  * projection; occurrence counting is a partial-aggregated groupBy on the
  * shingle key (map-side combine collapses repeats before the shuffle);
  * the dup-mark join runs on the SAME key the aggregation just
  * partitioned by (no extra exchange on the counted side); the final
  * per-document rollup is one more keyed aggregation. With
  * `hashKeys = true` (default) the shuffle carries an 8-byte xxhash64 of
  * each shingle instead of the string — at 100 TB the shuffle volume is
  * the shingle-key space, not the corpus text. SpanDedupSpec pins hash
  * keys == string keys on the test corpus (a 64-bit collision would
  * surface as a gate mismatch, not silent drift).
  */
object SpanDedup {

  /** Per-document span stats: `n_shingles` (token n-grams in the doc),
    * `n_dup` (those occurring >= 2 times corpus-wide), `dup_fraction`
    * (exact integer/integer double division — never rounded).
    */
  def dupSpanStats(docs: DataFrame, n: Int, idCol: String = "doc_id",
                   textCol: String = "text", hashKeys: Boolean = true): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val grams = docs
      .select(col(idCol), explode(graft.functions.functions.ngrams(toks, n)).as("gram"))
    val keyed = grams.select(col(idCol),
      (if (hashKeys) xxhash64(col("gram")) else col("gram")).as("k"))
    val dupKeys = keyed.groupBy("k").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("k")
    val dups = keyed.join(dupKeys, Seq("k"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_dup"))
    keyed.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_shingles"))
          .as("dup_fraction"))
  }
}
