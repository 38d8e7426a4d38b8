package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.functions.{hamming64, rhp_sig}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the brief:
  *  - [[bruteForceTopK]]: exact cosine — the baseline/oracle. Queries are
  *    broadcast, the corpus streams: O(|corpus| * |queries|) but a single
  *    narrow scan of the corpus, no shuffle of the corpus side.
  *  - [[lshTopK]]: random-hyperplane LSH (custom codegen'd expression
  *    [[graft.functions.RhpSig]]) with banded multi-probe: candidates are
  *    corpus vectors sharing at least one signature band with the query —
  *    an equi-join on compact long keys, so at 100 TB the corpus is hashed
  *    once and only bucket-mates are scored.
  */
object Ann {

  def cosine(a: Column, b: Column): Column = {
    val dot   = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
                          lit(0.0), (acc, v) => acc + v)
    val normA = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
                          lit(0.0), (acc, v) => acc + v))
    val normB = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
                          lit(0.0), (acc, v) => acc + v))
    dot / (normA * normB)
  }

  /** Exact top-k neighbors for each query vector (excluding self-matches). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col(idCol))
    corpus.join(broadcast(q), col("q_id") =!= col(idCol))
      .withColumn("cos", cosine(col("q_emb"), col(embCol)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col(idCol), col("cos"))
  }

  /** (id, band, band_value) LSH keys: `numPlanes` hyperplane bits split
    * into `bands` bands. More bands => higher recall, more candidates.
    */
  def bandKeys(df: DataFrame, idCol: String, embCol: String,
               numPlanes: Int, bands: Int, seed: Long): DataFrame = {
    val width = numPlanes / bands
    val mask = (1L << width) - 1
    df.select(col(idCol), col(embCol),
        rhp_sig(col(embCol), numPlanes, seed).as("rhp"))
      .select(col(idCol), col(embCol),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("rhp"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_value"))
  }

  /** Approximate top-k: LSH-bucketed candidates, exact cosine re-rank. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", embCol: String = "embedding",
              numPlanes: Int = 32, bands: Int = 8, seed: Long = 42L): DataFrame = {
    val ck = bandKeys(corpus, idCol, embCol, numPlanes, bands, seed)
    val qk = bandKeys(queries, idCol, embCol, numPlanes, bands, seed)
      .select(col("band"), col("band_value"),
        col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val cands = ck.join(qk, Seq("band", "band_value"))
      .filter(col("q_id") =!= col(idCol))
      .select(col("q_id"), col("q_emb"), col(idCol), col(embCol))
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col(idCol))
    cands.withColumn("cos", cosine(col("q_emb"), col(embCol)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col(idCol), col("cos"))
  }

  /** Hamming distance between two packed RHP signatures (probing helper). */
  def rhpHamming(a: Column, b: Column): Column = hamming64(a, b)

  /** Lloyd-refined IVF centroids: deterministic-sample init, then `iters`
    * assign/update rounds. Each round is one broadcast(centroids) pass over
    * the corpus for assignment plus a per-(cell, dim) mean — the update
    * collects only nCells x dim numbers to the driver (the MLlib-KMeans
    * shape: model state on the driver, data never collected). Cells that
    * end a round empty keep their previous centroid.
    */
  def lloydCentroids(corpus: DataFrame, nCells: Int, iters: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids: Seq[(Long, Seq[Double])] =
      corpus.orderBy(col(idCol)).limit(nCells)
        .select(col(embCol).cast("array<double>"))
        .collect().toSeq
        .zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }
    var it = 0
    while (it < iters) {
      val cDf = centroids.toDF("cell_id", "centroid")
      val w = Window.partitionBy(col(idCol)).orderBy(col("cell_cos").desc, col("cell_id"))
      val means = corpus.crossJoin(broadcast(cDf))
        .withColumn("cell_cos", cosine(col(embCol), col("centroid")))
        .withColumn("cell_rk", row_number().over(w))
        .filter(col("cell_rk") === 1)
        .select(col("cell_id"), posexplode(col(embCol).cast("array<double>")))
        .groupBy("cell_id", "pos").agg(avg("col").as("m"))
        .collect()
      val byCell = means.groupBy(_.getLong(0))
      centroids = centroids.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            (cid, arr.toSeq)
          case None => (cid, old) // empty cell: keep previous centroid
        }
      }
      it += 1
    }
    centroids.toDF("cell_id", "centroid")
  }

  /** IVF-style ANN: the corpus is partitioned into `nCells` coarse cells
    * ([[lloydCentroids]]: sampled init + `lloydIters` k-means rounds, so
    * cells track the data's cluster structure instead of its id order);
    * each vector joins its nearest cell once, queries probe their `nProbe`
    * nearest cells and re-rank exactly.
    *
    * At scale: cell assignment is one broadcast(centroids) pass over the
    * corpus; a query touches ~nProbe/nCells of the data.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", embCol: String = "embedding",
              nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 2): DataFrame = {
    val centroids = lloydCentroids(corpus, nCells, lloydIters, idCol, embCol)
    def nearestCells(df: DataFrame, n: Int, out: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("cell_cos").desc, col("cell_id"))
      df.crossJoin(broadcast(centroids))
        .withColumn("cell_cos", cosine(col(embCol), col("centroid")))
        .withColumn("cell_rk", row_number().over(w))
        .filter(col("cell_rk") <= n)
        .select(col(idCol), col(embCol), col("cell_id").as(out))
    }
    val cells = nearestCells(corpus, 1, "cell")
    val probes = nearestCells(queries, nProbe, "cell")
      .select(col("cell"), col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col(idCol))
    cells.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col(idCol))
      .select(col("q_id"), col("q_emb"), col(idCol), col(embCol)).distinct()
      .withColumn("cos", cosine(col("q_emb"), col(embCol)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col(idCol), col("cos"))
  }
}
