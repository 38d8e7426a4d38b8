package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.KmvAgg.kmv_sketch

/** KMV (k-minimum-values) distinct sketches with set-OVERLAP estimation
  * (Beyer et al. SIGMOD'07): per-group bottom-k of a uniform hash.
  *
  * What it buys at 100 TB: "how many distinct shingles does each corpus
  * slice have, and how many do slices SHARE" without a distinct-sized
  * shuffle or a pairwise distinct join. The build ships at most k longs
  * per group per task ([[graft.functions.KmvAgg]] — bounded buffer,
  * map-side combined); every estimate afterwards reads the sketch table
  * (groups x k longs), never the data. Cross-slice overlap is the
  * contamination/redundancy diagnostic a training-data pipeline runs
  * before mixing sources; HLL can't express it (registers union-only —
  * inclusion-exclusion error scales with the union), while a merged KMV
  * sketch is a uniform sample of A ∪ B whose members witness their own
  * side membership.
  *
  * Estimator algebra (all deterministic, so DuckDB restates it exactly):
  *  - hashes = first 13 hex chars of md5(key) parsed as a long: uniform on
  *    [0, 16^13) = [0, 2^52), exactly representable in doubles and
  *    identical in any engine with md5 (the smp1/Bloom pattern).
  *  - unsaturated sketch (n < k) IS the exact distinct hash set: estimates
  *    switch to exact counts.
  *  - saturated: est(|A|) = (k-1) * 2^52 / kth_smallest (the unbiased
  *    Beyer et al. form).
  *  - pair (A,B): bottom-k of (sketch_A ∪ sketch_B) is a valid KMV sketch
  *    of A ∪ B; its members that appear in BOTH input sketches are exactly
  *    the merged sample's A∩B members (sound because merged kth <= each
  *    side's kth), so est(J) = c/n_u and est(|A∩B|) = est(J) * est(|A∪B|).
  */
object Kmv {

  /** 16^13 = 2^52: the hash domain size. 52 bits keeps every hash value
    * exactly representable as a double on both engines.
    */
  val HashDomain: Long = 1L << 52

  /** Uniform [0, 2^52) hash of any key, identical in Spark and DuckDB:
    * md5 of the key's string form, first 13 hex chars as a long.
    */
  def hashKey(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  /** Per-group sketch table: (grp, mins array<long> ascending, <= k each).
    * One pass, bounded map-side state, no distinct shuffle.
    */
  def build(df: DataFrame, grp: Column, key: Column, k: Int): DataFrame = {
    requireK(k)
    df.select(grp.as("grp"), hashKey(key).as("hv"))
      .groupBy("grp").agg(kmv_sketch(col("hv"), k).as("mins"))
  }

  /** Distinct-count estimates from a built sketch table: exact when the
    * sketch is unsaturated, (k-1) * 2^52 / kth otherwise.
    */
  def estimateDistinct(sketch: DataFrame, k: Int): DataFrame = {
    requireK(k)
    sketch.select(col("grp"),
      size(col("mins")).as("n_sketch"),
      element_at(col("mins"), -1).as("kth"),
      when(size(col("mins")) < k, size(col("mins")).cast("double"))
        .otherwise(lit(((k - 1).toLong << 52).toDouble) /
          element_at(col("mins"), -1).cast("double"))
        .as("est_distinct"))
  }

  /** Merge a stored sketch table with several rows per group (e.g. one
    * per micro-batch from [[graft.streaming.Streams.storeKmvSketches]],
    * or one per day from a sketch store) back to one row per group:
    * re-sketching the stored members IS the merge, because bottom-k of
    * bottom-k's == bottom-k of the union (pinned in KmvSpec) — state
    * stays bounded at k and the result is bit-identical to building one
    * sketch over all the data.
    */
  def mergeSketches(stored: DataFrame, k: Int): DataFrame = {
    requireK(k)
    stored.select(col("grp"), explode(col("mins")).as("hv"))
      .groupBy("grp").agg(kmv_sketch(col("hv"), k).as("mins"))
  }

  /** All-pairs overlap estimates over the SKETCH table (groups x k longs —
    * the pair join never touches data; the sketch side broadcasts).
    * Emits per (grp_a < grp_b): merged-sample size, shared-member count,
    * and the union / Jaccard / intersection estimates.
    */
  def pairwiseOverlap(sketch: DataFrame, k: Int): DataFrame = {
    requireK(k)
    val a = sketch.select(col("grp").as("grp_a"), col("mins").as("ma"))
    val b = sketch.select(col("grp").as("grp_b"), col("mins").as("mb"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("merged", slice(array_sort(array_union(col("ma"), col("mb"))), 1, k))
      .withColumn("n_u", size(col("merged")))
      // merged members present in BOTH sketches: each is <= merged kth <=
      // min(kth_a, kth_b), so sketch membership witnesses set membership
      .withColumn("c",
        size(array_intersect(col("merged"), array_intersect(col("ma"), col("mb")))))
      .withColumn("est_union",
        when(col("n_u") < k, col("n_u").cast("double"))
          .otherwise(lit(((k - 1).toLong << 52).toDouble) /
            element_at(col("merged"), -1).cast("double")))
      .withColumn("est_jaccard", col("c").cast("double") / col("n_u").cast("double"))
      .withColumn("est_intersect", col("est_jaccard") * col("est_union"))
      .select("grp_a", "grp_b", "n_u", "c", "est_union", "est_jaccard", "est_intersect")
  }

  private def requireK(k: Int): Unit =
    require(k >= 2 && k <= 2048,
      s"k must be in [2, 2048] (estimator needs k-1 > 0; (k-1)*2^52 must fit a long), got $k")
}
