package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.functions.bloom_might_contain

/** Bloom-pruned semi-join — the shuffle-volume pattern for the key-set
  * size band where a broadcast hash join stops fitting but a bit-sketch
  * still does (100M dim keys ≈ gigabytes as a hash table, ~120 MB as a
  * 1%-FPP Bloom filter). The fact side drops non-matching rows AT THE
  * SCAN, before the shuffle, so the exchange carries the matching
  * fraction plus the false-positive rate instead of the whole table; the
  * exact join afterwards removes the false positives, so the RESULT is
  * exact (gate-oracled against a plain IN-subquery).
  *
  * This generalizes the reference's filter-then-join habit
  * (/root/reference/dags/Funciones_CotyData.py:200-231 filters pandas
  * frames before merging) to a size regime pandas never reaches.
  *
  * The filter builds distributed via Spark's public sketch aggregate
  * (`DataFrameStatFunctions.bloomFilter`), and the probe is the codegen'd
  * [[graft.functions.BloomMightContain]] expression, so the prune stays
  * inside whole-stage codegen on the scan.
  */
object BloomJoin {

  /** One shared prune: build the sketch distributed, filter the fact scan. */
  private def pruned(fact: DataFrame, keys: DataFrame, factKey: String,
                     keyCol: String, expectedKeys: Long, fpp: Double): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    fact.filter(bloom_might_contain(col(factKey), bf))
  }

  /** Exact semi-join of `fact` against `keys`, Bloom-pruned before the
    * shuffle. `expectedKeys`/`fpp` size the sketch; an undersized
    * `expectedKeys` only degrades pruning (more false positives survive
    * to the exact join), never correctness. No distinct on the key side —
    * semi-joins ignore right-side multiplicity.
    */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame,
                    factKey: String, keyCol: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    pruned(fact, keys, factKey, keyCol, expectedKeys, fpp)
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_semi")

  /** Exact ANTI-join with a Bloom fast path — the incremental-ingest dedup
    * shape (drop rows whose key a previous load already saw): a
    * bloom-NEGATIVE row is DEFINITELY new and passes through with no join
    * at all; only the bloom-positive fraction (true matches + FPP) pays
    * the exact anti-join shuffle. With a mostly-new batch, almost nothing
    * shuffles. Null fact keys route to the pass-through branch, matching
    * plain anti-join semantics (null never equals a seen key).
    */
  def bloomAntiJoin(fact: DataFrame, keys: DataFrame,
                    factKey: String, keyCol: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val probe = coalesce(bloom_might_contain(col(factKey), bf), lit(false))
    val definitelyNew = fact.filter(!probe)
    val maybeSeen = fact.filter(probe)
      .join(keys.select(col(keyCol).as(factKey)), Seq(factKey), "left_anti")
    definitelyNew.unionByName(maybeSeen)
  }

  /** The pruned-but-unverified frame (false positives included) — exposed
    * so tests can assert the prune actually dropped rows at the scan.
    */
  def bloomPruned(fact: DataFrame, keys: DataFrame,
                  factKey: String, keyCol: String,
                  expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame =
    pruned(fact, keys, factKey, keyCol, expectedKeys, fpp)
}
