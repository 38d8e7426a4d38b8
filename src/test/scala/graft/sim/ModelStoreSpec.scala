package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ModelStoreSpec extends SparkTestBase {

  private lazy val emb = graft.core.Tables.embeddings(spark, sf001)
  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("graft-models").resolve(name).toString

  test("IVF save/load round-trips bit-exactly; loaded model serves identically") {
    val fitted = Ann.fitIvf(emb, nCells = 8, lloydIters = 1)
    val p = tmp("ivf.bin")
    ModelStore.saveIvf(spark, p, fitted)
    val loaded = ModelStore.loadIvf(spark, p)
    assert(loaded.centroids == fitted.centroids) // bit-exact doubles
    def serve(m: Ann.IvfModel) = {
      val cells = emb.select(col("vec_id"), col("embedding"),
        m.assign(col("embedding")).as("cell"))
      Ann.ivfSearch(m, cells, emb.filter(col("vec_id") < 5), k = 3, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    }
    assert(serve(loaded) == serve(fitted))
  }

  test("PQ save/load round-trips bit-exactly; loaded codebooks encode identically") {
    val fitted = Pq.fitPq(emb, m = 8, k = 16, iters = 1)
    val p = tmp("pq.bin")
    ModelStore.savePq(spark, p, fitted)
    val loaded = ModelStore.loadPq(spark, p)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
           fitted.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val a = Pq.encodeCorpus(fitted, emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = Pq.encodeCorpus(loaded, emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b)
  }

  test("a torn save never leaves a loadable model; wrong magic refuses") {
    val p = tmp("bad.bin")
    // simulate a crash mid-write: only the tmp file exists
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p + "__tmp"), "partial")
    intercept[java.io.FileNotFoundException] { ModelStore.loadIvf(spark, p) }
    // a committed PQ blob refuses to load as IVF (magic check)
    val pq = tmp("pq2.bin")
    ModelStore.savePq(spark, pq, Pq.fitPq(emb, m = 8, k = 16, iters = 1))
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, pq) }
  }
}
