package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the standard pre-conditioner in
  * large-scale similarity pipelines (decorrelate + equalize variance
  * before LSH/PQ quantization; e.g. Jégou & Chum, ECCV 2012 on PCA for
  * descriptor indexing).
  *
  * Scale shape, in three strictly-bounded stages:
  *  - one distributed pass accumulates per-partition (count, sum[d],
  *    gram[d x d]) — d=64 means 4 KB + 32 KB per partition, collected as
  *    bounded model state (the codebook pattern; the data itself never
  *    moves);
  *  - the d x d covariance eigendecomposes ON THE DRIVER with a cyclic
  *    Jacobi sweep (self-contained, deterministic — no native linear-
  *    algebra dependency), microseconds at embedding dims;
  *  - projection/whitening is embarrassingly parallel: the k x d
  *    component matrix rides the closure and each row maps to
  *    `(x - mean) U / sqrt(lambda + eps)` in one mapPartitions — no
  *    shuffle at any size.
  *
  * Determinism: partials combine in partition order and Jacobi is
  * sweep-ordered, so the same data on the same partitioning always fits
  * the same model; eigenvector signs are canonicalized (largest-magnitude
  * coordinate positive). Float-sum drift across DIFFERENT partitionings
  * is inherent to floating point and bounded by the specs' tolerances.
  */
object Pca {

  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]], // k rows of d
                            eigenvalues: Array[Double],       // k, desc
                            eps: Double)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors-as-rows), sorted by descending
    * eigenvalue, each vector's largest-|coordinate| made positive.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
                                 maxSweeps: Int = 64,
                                 tol: Double = 1e-14)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // canonical sign: largest-|coordinate| positive (first on ties)
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(col(j)) > math.abs(col(best))) best = j; j += 1 }
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** Fit a k-component whitening model over `embCol` (array<float|double>).
    * One data pass; driver work is O(d^3) on a d x d matrix.
    */
  def fit(corpus: DataFrame, k: Int, embCol: String = "embedding",
          eps: Double = 1e-9): PcaModel = {
    // null embeddings carry nothing to fit on; dropping them beats an
    // executor NPE deep inside the accumulation loop
    val parts = corpus.select(col(embCol).cast("array<double>"))
      .filter(col(embCol).isNotNull).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        var sum: Array[Double] = null
        var gram: Array[Double] = null
        while (it.hasNext) {
          val v = it.next().getSeq[Double](0).toArray
          if (sum == null) {
            sum = new Array[Double](v.length)
            gram = new Array[Double](v.length * v.length)
          }
          n += 1
          var i = 0
          while (i < v.length) {
            sum(i) += v(i)
            var j = 0
            val base = i * v.length
            while (j < v.length) { gram(base + j) += v(i) * v(j); j += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((pid, n, sum, gram))
      }.collect().sortBy(_._1) // combine in partition order: deterministic
    require(parts.nonEmpty, "cannot fit PCA on an empty corpus")
    val d = parts(0)._3.length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    var n = 0L
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * d)
    parts.foreach { case (_, pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { gram(i) += pg(i); i += 1 }
    }
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) => gram(i * d + j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(mean, evecs.take(k), evals.take(k), eps)
  }

  final case class Whitened(vec_id: Long, white: Array[Double])

  /** Project + whiten every row: `y_c = (x - mean)·u_c / sqrt(l_c + eps)`.
    * Pure map, model in the closure, no shuffle.
    */
  def whiten(corpus: DataFrame, model: PcaModel,
             idCol: String = "vec_id",
             embCol: String = "embedding"): Dataset[Whitened] = {
    import corpus.sparkSession.implicits._
    val scaled = model.components.zip(model.eigenvalues).map { case (u, l) =>
      val inv = 1.0 / math.sqrt(math.max(l, 0.0) + model.eps)
      u.map(_ * inv)
    }
    val mean = model.mean
    val projected = corpus.select(col(idCol), col(embCol).cast("array<double>"))
      .filter(col(embCol).isNotNull)
    projected.mapPartitions { rows =>
      rows.map { r =>
        val x = r.getSeq[Double](1).toArray
        val y = new Array[Double](scaled.length)
        var c = 0
        while (c < scaled.length) {
          val u = scaled(c)
          var s = 0.0
          var i = 0
          while (i < u.length) { s += (x(i) - mean(i)) * u(i); i += 1 }
          y(c) = s
          c += 1
        }
        Whitened(r.getLong(0), y)
      }
    }
  }
}
