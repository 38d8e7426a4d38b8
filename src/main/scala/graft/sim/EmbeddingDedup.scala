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

  /** Pairs (id_a < id_b, cosine) with cosine >= threshold. */
  def nearPairs(df: DataFrame, threshold: Double,
                idCol: String = "vec_id", embCol: String = "embedding",
                numPlanes: Int = 32, bands: Int = 16, seed: Long = 42L,
                maxBucket: Int = 10000): DataFrame = {
    val keys = Ann.bandKeys(df, idCol, embCol, numPlanes, bands, seed)
    val sized = keys.groupBy("band", "band_value").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket && col("__n") > 1)
    val pruned = keys.join(sized.select("band", "band_value"), Seq("band", "band_value"))
    val a = pruned.select(col("band"), col("band_value"),
      col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = pruned.select(col("band"), col("band_value"),
      col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.join(b, Seq("band", "band_value"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "emb_a", "emb_b").distinct()
      .withColumn("cosine", Ann.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** vec_id, group_id, group_size from the near-dup component graph. */
  def groups(df: DataFrame, threshold: Double,
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val pairs = nearPairs(df, threshold, idCol, embCol).cache()
    val pairArr = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val g = MinHashDedup.groupsLocal(df, pairArr, idCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("group_id")
    g.withColumn("group_size", count(lit(1)).over(w))
  }
}
