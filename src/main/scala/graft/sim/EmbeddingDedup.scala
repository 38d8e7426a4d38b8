package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.MinHashDedup

/** Embedding-cosine near-duplicate detection (the brief's fifth dedup
  * mode): near-dups = vector pairs with cosine >= threshold.
  *
  * Candidates come from the same random-hyperplane band keys as ANN
  * ([[Ann.bandKeys]]) — high-cosine pairs agree on hyperplane signs with
  * high probability, so the candidate join is an equi-join on compact band
  * keys, never an all-pairs compare. Groups reuse the dedup component
  * machinery (union-find over verified pairs).
  */
object EmbeddingDedup {

  /** Pairs (id_a < id_b, cosine) with cosine >= threshold.
    *
    * Band geometry matters: wide bands (8 hyperplane bits) keep random
    * pairs out of the buckets (collision ~2^-8 per band) while
    * high-cosine pairs still collide in >=1 of the 8 bands with ~99%
    * probability at threshold 0.95. Candidate ids are deduped BEFORE the
    * embeddings are re-attached, so the wide vectors never pass through
    * the distinct.
    */
  def nearPairs(df: DataFrame, threshold: Double,
                idCol: String = "vec_id", embCol: String = "embedding",
                numPlanes: Int = 64, bands: Int = 8, seed: Long = 42L,
                maxBucket: Int = 10000): DataFrame = {
    val keys = Ann.bandKeys(df, idCol, embCol, numPlanes, bands, seed)
      .select(col("band"), col("band_value"), col(idCol))
    val counts = keys.groupBy("band", "band_value").agg(count(lit(1)).as("__n"))
    val sized = graft.dedup.BucketDrops.keepUnderCap(counts, "__n", maxBucket, "rhp")
    val pruned = keys.join(sized.select("band", "band_value"), Seq("band", "band_value"))
    val a = pruned.select(col("band"), col("band_value"), col(idCol).as("id_a"))
    val b = pruned.select(col("band"), col("band_value"), col(idCol).as("id_b"))
    val candidateIds = a.join(b, Seq("band", "band_value"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = df.select(col(idCol), col(embCol))
    candidateIds
      .join(vecs.select(col(idCol).as("id_a"), col(embCol).as("emb_a")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(embCol).as("emb_b")), Seq("id_b"))
      .withColumn("cosine", Ann.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** vec_id, group_id, group_size from the near-dup component graph.
    * Components via [[MinHashDedup.componentGroups]]: driver union-find for
    * small pair sets, distributed star contraction above `localThreshold`
    * — the collect is bounded, never corpus- or pair-count-proportional.
    */
  def groups(df: DataFrame, threshold: Double,
             idCol: String = "vec_id", embCol: String = "embedding",
             localThreshold: Int = 1000000): DataFrame = {
    val pairs = nearPairs(df, threshold, idCol, embCol).cache()
    val g = MinHashDedup.componentGroups(df, pairs, idCol, localThreshold)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("group_id")
    g.withColumn("group_size", count(lit(1)).over(w))
  }
}
