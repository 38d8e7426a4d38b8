package graft.sim

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobi solves the hand-checkable 2x2 exactly") {
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(math.abs(math.abs(evecs(1)(0)) - r) < 1e-9)
  }

  // deterministic anisotropic cloud in d=6: strong direction e0+e1,
  // weaker e2, trigonometric jitter elsewhere (no RNG — reproducible)
  private def cloud(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val t = math.sin(i * 0.7) * 10.0         // dominant variance
      val u = math.cos(i * 1.3) * 3.0          // secondary
      val e = Seq(t + 0.01 * math.sin(i * 5.1), t - 0.01 * math.cos(i * 4.3),
        u, 0.1 * math.sin(i * 2.9), 0.1 * math.cos(i * 3.7), 0.05 * math.sin(i * 6.1))
      (i.toLong, e.map(_.toFloat))
    }

  test("top component aligns with the dominant direction; eigenvalues descend") {
    val df = cloud(600).toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 3)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    // dominant direction is (1,1,0,...)/sqrt(2)
    val r = 1.0 / math.sqrt(2.0)
    val cos = m.components(0)(0) * r + m.components(0)(1) * r
    assert(math.abs(cos) > 0.999, s"top component ${m.components(0).toSeq}")
    // components are orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b) dot=$dot")
    }
  }

  test("whitened output has identity covariance on the fitted sample") {
    val df = cloud(600).toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 3)
    val y = Pca.whiten(df, m).collect().map(_.white)
    val n = y.length.toDouble
    val mean = Array.tabulate(3)(c => y.map(_(c)).sum / n)
    for (a <- 0 until 3; b <- 0 until 3) {
      val cov = y.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / n
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(cov - want) < 0.05, s"cov($a,$b)=$cov")
    }
  }

  test("whiten matches the closed-form driver computation bit-for-bit") {
    val rows = cloud(100)
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 3)
    val scaled = m.components.zip(m.eigenvalues).map { case (u, l) =>
      u.map(_ * (1.0 / math.sqrt(math.max(l, 0.0) + m.eps)))
    }
    val got = Pca.whiten(df, m).collect().map(w => w.vec_id -> w.white.toSeq).toMap
    rows.foreach { case (id, e) =>
      val x = e.map(_.toDouble)
      val want = scaled.map(u =>
        u.indices.map(i => (x(i) - m.mean(i)) * u(i)).sum).toSeq
      assert(got(id) == want, s"id=$id") // identical fold order -> identical bits
    }
  }

  test("whitened-space IVF serving (the e9 composition) recall@10 >= 0.9 vs whitened brute") {
    import org.apache.spark.sql.functions.col
    // clustered anisotropic cloud: 8 separated directions + jitter — the
    // data where whitening matters and IVF cells must track clusters.
    // Brute-force-in-whitened-space is e9's recall oracle (the registered
    // query serves a fitted IVF index; this pins what that approximation
    // gives up).
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding").cache()
    val m = Pca.fit(corpus, k = 8)
    val white = Pca.whiten(corpus, m).toDF()
      .select(col("vec_id"), col("white").as("embedding")).cache()
    val queries = white.filter(col("vec_id") < 16)
    val k = 10
    val ivf = Ann.fitIvf(white, nCells = 8, lloydIters = 2)
    val cells = white.select(col("vec_id"), col("embedding"),
      ivf.assign(col("embedding")).as("cell"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("q_id")),
                             r.getLong(r.fieldIndex("vec_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = asMap(Ann.bruteForceTopK(white, queries, k))
    val served = asMap(Ann.ivfSearch(ivf, cells, queries, k, nProbe = 4))
    val recalls = exact.map { case (q, e) =>
      served.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"whitened IVF recall@$k = $recall")
    white.unpersist(); corpus.unpersist()
  }

  test("fit is deterministic on a fixed partitioning; projection is partition-pure") {
    val df = cloud(400).toDF("vec_id", "embedding").repartition(8)
      .cache()
    val m1 = Pca.fit(df, k = 2)
    val m2 = Pca.fit(df, k = 2)
    assert(m1.mean.toSeq == m2.mean.toSeq &&
      m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    val a = Pca.whiten(df, m1).collect().map(w => w.vec_id -> w.white.toSeq).toMap
    val b = Pca.whiten(df.repartition(3), m1).collect()
      .map(w => w.vec_id -> w.white.toSeq).toMap
    assert(a == b) // projection is per-row pure: partitioning cannot matter
    df.unpersist()
  }
}
