package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with k-means, then prune
  * near-duplicate pairs *within* each cluster — the clustering bounds the
  * pair search so the quadratic step never sees the whole corpus.
  *
  * Reference behavior: the reference engine has no semantic-dedup operator;
  * this extends its dedup family (exact keep-first, MinHash, SimHash) with
  * the published embedding-space method a training-data pipeline needs.
  *
  * Everything here is EXACT INTEGER arithmetic so an independent engine
  * (the DuckDB oracle) reproduces it bit-for-bit:
  *
  *  - embeddings quantize to `floor(x * scale + 0.5)` longs (scale=1000 —
  *    three decimal digits is far finer than any 0.95-cosine decision);
  *  - Lloyd's iterations run a FIXED count from a deterministic seed (the
  *    k smallest vec_ids), assignment ties break to the smallest cluster
  *    id, and centroid means are `floor(sum/count + 0.5)` longs;
  *  - the cosine test `cos(a,b) >= t` with t² = thrNum/thrDen is evaluated
  *    as `dot >= 0 && thrDen·dot² >= thrNum·|a|²·|b|²` — no float division
  *    or sqrt ever happens, so no rounding boundary exists to disagree on.
  *
  * Overflow bound: with d dims and quantization scale s, the test needs
  * `thrDen · (d·s²)² < 2^63`, i.e. d·s² < ~1.5e8 at thrDen=400 — d=64,
  * s=1000 sits 2 000× inside it. Callers raising `scale` or d must keep
  * that product bounded (documented rather than checked per-row: the bound
  * is a config-time property, not a data property).
  *
  * Scale design (100 TB): each Lloyd round is one broadcast of k·d longs
  * out and one partially-aggregated groupBy((cluster, dim)) back — every
  * partition emits at most k·d partial rows regardless of its row count.
  * Assignment is a shuffle-free map (a `least`/`when` chain over k literal
  * centroid arrays — whole-stage-friendly scalar comparisons once the
  * per-centroid distances are computed). The only quadratic step is the
  * within-cluster self-join, shuffled on the cluster id; SemDeDup's own
  * scaling argument applies — pick k ∝ N/S to bound expected cluster size
  * S, so per-cluster pair work is O(S²) and the join never degenerates to
  * all-pairs. For skewed clusters, compose with [[graft.ops.Skew]] salting
  * or cap membership upstream; at the gate's SF the clusters are ≤ ~100.
  */
object SemDedup {

  /** vec_id ASC, then quantized vector as array<long>. */
  def quantize(emb: DataFrame, scale: Long = 1000L): DataFrame =
    emb.select(
      col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => floor(x * lit(scale.toDouble) + lit(0.5)).cast("long")).as("qv"))

  private def sqDist(qv: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(qv, lit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Assign every vector to its nearest centroid (ties -> smallest cluster
    * id). Shuffle-free: centroids ride along as literals.
    */
  private def assign(q: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    val dists = centroids.zipWithIndex.map { case (c, j) =>
      sqDist(col("qv"), c).as(s"d$j")
    }
    val withD = q.select(col("vec_id") +: col("qv") +: dists.toSeq: _*)
    val minD = least(centroids.indices.map(j => col(s"d$j")): _*)
    val cluster = centroids.indices.tail.foldLeft(
      when(col("d0") === minD, lit(0))) { (acc, j) =>
      acc.when(col(s"d$j") === minD, lit(j))
    }
    withD.select(col("vec_id"), col("qv"), cluster.as("cluster"))
  }

  /** One Lloyd update: integer means per (cluster, dim); clusters that
    * lost all members keep their previous centroid. Partial aggregation
    * bounds every partition's shuffle output at k·d rows.
    */
  private def update(assigned: DataFrame, prev: Array[Array[Long]]): Array[Array[Long]] = {
    val means = assigned
      .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .select(col("cluster"), col("pos"),
        floor(col("s").cast("double") / col("c") + lit(0.5)).cast("long").as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val byCluster = means.groupBy(_._1)
    prev.indices.map { j =>
      byCluster.get(j) match {
        case Some(dims) => dims.sortBy(_._2).map(_._3)
        case None       => prev(j)
      }
    }.toArray
  }

  /** Deterministic k-means assignment: seed with the k smallest vec_ids,
    * run `iters` fixed Lloyd rounds, return (vec_id, qv, cluster).
    */
  def fitAssign(emb: DataFrame, k: Int = 10, iters: Int = 2,
                scale: Long = 1000L): DataFrame = {
    val q = quantize(emb, scale)
    val seeds: Array[Array[Long]] = q.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    require(seeds.length == k, s"need >= $k vectors to seed $k clusters")
    var centroids = seeds
    var it = 0
    while (it < iters) {
      centroids = update(assign(q, centroids), centroids)
      it += 1
    }
    assign(q, centroids)
  }

  /** Full SemDeDup: cluster, then within each cluster drop every vector
    * that has a smaller-vec_id neighbor with cos >= sqrt(thrNum/thrDen)
    * (the paper keeps one representative per semantic-duplicate set; the
    * smallest id is the deterministic choice). Returns
    * (vec_id, cluster, kept 0/1) for every input vector.
    */
  def dedup(emb: DataFrame, k: Int = 10, iters: Int = 2,
            thrNum: Long = 361L, thrDen: Long = 400L,
            scale: Long = 1000L): DataFrame = {
    val assigned = fitAssign(emb, k, iters, scale)
      .withColumn("n2",
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x))
    val a = assigned.select(col("cluster"), col("vec_id").as("id_a"),
      col("qv").as("qa"), col("n2").as("na"))
    val b = assigned.select(col("cluster"), col("vec_id").as("id_b"),
      col("qv").as("qb"), col("n2").as("nb"))
    val dot = aggregate(
      zip_with(col("qa"), col("qb"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val dups = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dot", dot)
      .where(col("dot") >= 0 &&
        lit(thrDen) * col("dot") * col("dot") >= lit(thrNum) * col("na") * col("nb"))
      .select(col("id_b").as("vec_id")).distinct()
    assigned
      .join(dups.withColumn("dup", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        coalesce(lit(1L) - col("dup"), lit(1L)).as("kept"))
  }
}
