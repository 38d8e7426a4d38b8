package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Filtered ANN with adaptive probing (Ann.ivfSearchAdaptive).
  *
  * Pins the two halves of the contract:
  *  - CORRECTNESS under selectivity: when the candidate target covers all
  *    survivors the result is EXACTLY the filtered brute-force ranking;
  *    at any selectivity every query gets min(k, survivors) rows (no
  *    holes — the failure mode of fixed-nProbe post-filtering, shown
  *    failing here on the same data); recall >= 0.9 vs filtered brute on
  *    the real corpus with a selective filter.
  *  - ECONOMY under density: a hand-built two-cell geometry where the
  *    near cell alone covers the target proves the far cell is NOT
  *    probed at oversample = 1 (a far-cell decoy with a better cosine is
  *    missed — the IVF approximation, not a bug) and IS probed once the
  *    oversample raises the target past the near cell's count (the decoy
  *    appears, matching brute force) — the knob trades recall for probe
  *    cost exactly as documented.
  */
class AnnFilterSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001).cache()
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "rk", "vec_id").orderBy("q_id", "rk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  private def fittedCells(model: Ann.IvfModel) =
    emb.select(col("vec_id"), col("embedding"), col("label"),
      model.assign(col("embedding")).as("cell"))

  test("target covering all survivors == filtered brute force, row for row") {
    val model = Ann.fitIvf(emb, nCells = 8, lloydIters = 2)
    val cells = fittedCells(model).filter(col("label") === 3)
    // 43 survivors at sf0.001; oversample 100 * k = 500 >> 43 -> all
    // non-empty cells probed -> exact
    val adaptive = rows(Ann.ivfSearchAdaptive(model, cells, queries,
      k = 5, oversample = 100.0))
    val brute = rows(Ann.bruteForceTopK(emb.filter(col("label") === 3),
      queries, k = 5))
    assert(adaptive === brute)
  }

  test("every query gets min(k, survivors) rows at any selectivity; fixed nProbe leaves holes") {
    val model = Ann.fitIvf(emb, nCells = 8, lloydIters = 2)
    val survivors = emb.filter(col("label") === 3).count() // 43 of 500
    val k = 5
    val cells = fittedCells(model).filter(col("label") === 3)
    val perQuery = Ann.ivfSearchAdaptive(model, cells, queries, k, oversample = 1.0)
      .groupBy("q_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nq = queries.count()
    assert(perQuery.size.toLong == nq)
    perQuery.foreach { case (q, n) =>
      assert(n == math.min(k.toLong, survivors), s"query $q got $n rows")
    }
    // the same filter POST-applied to a fixed-nProbe search under-returns
    // for at least one query (the hole adaptive probing exists to close);
    // if this ever stops holding, the data got easier, not the claim wrong
    val fixedPost = Ann.ivfSearch(model, fittedCells(model), queries,
        k = k, nProbe = 1)
      .join(emb.filter(col("label") === 3).select(col("vec_id")), Seq("vec_id"))
      .groupBy("q_id").count().collect().map(_.getLong(1))
    assert(fixedPost.isEmpty || fixedPost.exists(_ < k),
      "fixed nProbe=1 + post-filter returned k survivors for every query — " +
        "pick a more selective filter for this pin")
  }

  test("recall@5 vs filtered brute >= 0.9 on CLUSTERED data (selective filter)") {
    // the recall claim is only meaningful where cells correlate with
    // cosine neighborhoods (the e3 convention — on uniform data IVF recall
    // is the probed fraction by construction): 8 tight clusters around
    // the 8D basis vectors, label = i % 3 (filter keeps ~1/3 of EVERY
    // cluster), hand-placed centroids so the geometry is deterministic
    val dim = 8
    val pts = for (c <- 0 until 8; j <- 0 until 50) yield {
      val v = Array.tabulate(dim) { d =>
        val jit = (((j * 31 + d * 17 + c * 7) % 13) - 6) / 40.0f
        (if (d == c) 1.0f else 0.0f) + jit
      }
      ((c * 50 + j).toLong, v, j % 3)
    }
    val corpus = pts.toDF("vec_id", "embedding", "label")
    val model = Ann.IvfModel((0 until 8).map(c =>
      Seq.tabulate(dim)(d => if (d == c) 1.0 else 0.0)))
    val cells = corpus.select(col("vec_id"), col("embedding"),
        model.assign(col("embedding")).as("cell"))
      .filter(col("label") === 0)
    val qs = corpus.filter(col("vec_id") % 50 === 1) // one query per cluster
      .select("vec_id", "embedding")
    val exact = rows(Ann.bruteForceTopK(corpus.filter(col("label") === 0),
      qs, k = 5)).map(t => (t._1, t._3)).toSet
    val got = rows(Ann.ivfSearchAdaptive(model, cells, qs,
      k = 5, oversample = 4.0)).map(t => (t._1, t._3)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"filtered recall@5 = $recall")
  }

  // hand-placed two-cell geometry (no Lloyd — deterministic by
  // construction): cell 0 centered (1,0), cell 1 centered (0,1).
  // Corpus: 4 strong cell-0 points (cos ~0.999 to the query), 2 weak
  // cell-0 points (cos ~0.3), and a DECOY in cell 1 at cos 0.6 — better
  // than the weak points, worse than the strong ones.
  private def decoyCorpus = Seq(
    (101L, Array(0.999f, 0.04f)), (102L, Array(0.998f, 0.06f)),
    (103L, Array(0.997f, 0.08f)), (104L, Array(0.996f, 0.09f)),
    (105L, Array(0.3f, -0.95f)), (106L, Array(0.31f, -0.95f)),
    (201L, Array(0.6f, 0.8f))
  ).toDF("vec_id", "embedding")

  private def decoyModel = Ann.IvfModel(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))

  test("oversample=1 probes only the near cell (decoy missed); oversample=2 finds it") {
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cells = decoyCorpus.select(col("vec_id"), col("embedding"),
      decoyModel.assign(col("embedding")).as("cell"))
    // sanity: the decoy landed in cell 1, everything else in cell 0
    val byCell = cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell(201L) == 1L && byCell.filterKeys(_ != 201L).values.forall(_ == 0L))
    // k=5, oversample=1 -> target = 6 = cell 0's count -> cell 1 unprobed:
    // rank 5 is a weak cell-0 point, NOT the better decoy
    val economic = rows(Ann.ivfSearchAdaptive(decoyModel, cells, q,
      k = 5, oversample = 1.0))
    assert(economic.size == 5 && Set(105L, 106L).contains(economic.last._3),
      s"expected a weak near-cell point at rank 5, got ${economic.last}")
    assert(!economic.exists(_._3 == 201L))
    // oversample=2 -> target = 10 > 6 -> cell 1 probed: result == brute,
    // decoy at rank 5
    val wide = rows(Ann.ivfSearchAdaptive(decoyModel, cells, q,
      k = 5, oversample = 2.0))
    assert(wide === rows(Ann.bruteForceTopK(decoyCorpus, q, k = 5)))
    assert(wide.last._3 == 201L)
  }

  test("no survivors -> empty result; self-match excluded among survivors") {
    val model = decoyModel
    val cells = decoyCorpus.select(col("vec_id"), col("embedding"),
        model.assign(col("embedding")).as("cell"))
      .filter(col("vec_id") < 0) // nothing survives
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Ann.ivfSearchAdaptive(model, cells, q, k = 3).isEmpty)
    // a query that is itself a surviving corpus row never matches itself
    val all = decoyCorpus.select(col("vec_id"), col("embedding"),
      model.assign(col("embedding")).as("cell"))
    val self = Seq((101L, Array(0.999f, 0.04f))).toDF("vec_id", "embedding")
    val got = rows(Ann.ivfSearchAdaptive(model, all, self, k = 6, oversample = 2.0))
    assert(got.nonEmpty && !got.exists(_._3 == 101L))
  }

  test("knn_search TVF (SQL surface) is row-identical to the Column path") {
    emb.filter(col("label") === 3).createOrReplaceTempView("annf_corpus_v")
    queries.createOrReplaceTempView("annf_queries_v")
    val sql = spark.sql("SELECT q_id, rk, vec_id, cos FROM knn_search(" +
        "'annf_corpus_v', 'annf_queries_v', 'vec_id', 'embedding', 5)")
      .orderBy("q_id", "rk").collect().toSeq
    val column = Ann.bruteForceTopK(emb.filter(col("label") === 3),
        queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    assert(sql.nonEmpty && sql == column)
  }

  test("cells assigned by a different model fail loudly (geometry mismatch)") {
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val foreign = decoyCorpus.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 7).as("cell")) // ids 0..6 vs a 2-cell model
    val e = intercept[IllegalArgumentException] {
      Ann.ivfSearchAdaptive(decoyModel, foreign, q, k = 3)
    }
    assert(e.getMessage.contains("different model"))
  }

  test("survivor counts cached per (model, filter): repeat batches launch no counting job") {
    val model = Ann.fitIvf(emb, nCells = 8, lloydIters = 2)
    val cells = fittedCells(model).filter(col("label") === 3)
    val first = rows(Ann.ivfSearchAdaptive(model, cells, queries,
      k = 5, oversample = 4.0))
    val after1 = Ann.survivorCountMisses.get()
    // a DIFFERENT query batch over the SAME (model, filter): served from
    // the cached counts, zero counting jobs
    val q2 = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
    assert(Ann.ivfSearchAdaptive(model, cells, q2,
      k = 5, oversample = 4.0).count() > 0)
    assert(Ann.survivorCountMisses.get() == after1,
      "second query batch over the same filter recounted survivors")
    // the repeated first batch is row-identical and still count-free
    val again = rows(Ann.ivfSearchAdaptive(model, cells, queries,
      k = 5, oversample = 4.0))
    assert(again === first)
    assert(Ann.survivorCountMisses.get() == after1)
    // a different filter is a different key: exactly one fresh count
    rows(Ann.ivfSearchAdaptive(model,
      fittedCells(model).filter(col("label") === 2), queries, k = 5))
    assert(Ann.survivorCountMisses.get() == after1 + 1)
  }

  test("regenerated data refreshes the cached counts (FitCache staleness rule)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annc").toString
    decoyCorpus.filter(col("vec_id") =!= 201L)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
    def cellsDf = spark.read.parquet(dir).select(col("vec_id"), col("embedding"),
      decoyModel.assign(col("embedding")).as("cell"))
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(rows(Ann.ivfSearchAdaptive(decoyModel, cellsDf, q,
      k = 5, oversample = 2.0)).size == 5)
    val m = Ann.survivorCountMisses.get()
    // the corpus grows in place: same path, same plan shape — the input-
    // file fingerprint must miss the stale entry and recount
    decoyCorpus.filter(col("vec_id") === 201L)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val r2 = rows(Ann.ivfSearchAdaptive(decoyModel, cellsDf, q,
      k = 6, oversample = 2.0))
    assert(Ann.survivorCountMisses.get() == m + 1,
      "appended data served stale survivor counts")
    assert(r2.exists(_._3 == 201L), "appended row missing from the search")
  }

  test("ranking is partition-invariant") {
    val model = Ann.fitIvf(emb, nCells = 8, lloydIters = 2)
    def run(parts: Int) = {
      val cells = emb.repartition(parts)
        .select(col("vec_id"), col("embedding"), col("label"),
          model.assign(col("embedding")).as("cell"))
        .filter(col("label") === 3)
      rows(Ann.ivfSearchAdaptive(model, cells, queries, k = 5, oversample = 4.0))
    }
    assert(run(1) === run(13))
  }
}
