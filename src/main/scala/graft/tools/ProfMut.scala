package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the mutation-script bench queries (d8/d9/d10/x30):
  * per-step wall time of one rep, to see where the per-poll constant
  * lives. Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfMut".
  */
object ProfMut {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "profmut")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.DocStore
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profmut] $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.core.Tables.documents(spark, d).select("doc_id", "lang", "n_chars")
    val base = java.nio.file.Files.createTempDirectory("profmut").toString
    val seed = s"$base/seed/store"
    time("seed-build") {
      DocStore.insertMany(docs, seed)
      DocStore.compact(spark, seed, targetFiles = 1, format = Some("parquet"))
      DocStore.cluster(spark, seed, col("doc_id"), targetFiles = 8,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val work = s"$base/run$rep"
      time("copy") {
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$base/seed"), new java.io.File(work))
      }
      val store = s"$work/store"
      time("update1") { DocStore.updateMany(spark, store,
        col("doc_id").between(10L, 29L), Map("n_chars" -> (col("n_chars") + lit(50L)))) }
      time("update2") { DocStore.updateMany(spark, store,
        col("doc_id").between(130L, 149L), Map("n_chars" -> (col("n_chars") + lit(50L)))) }
      time("vacuum") { DocStore.vacuum(spark, store, minLiveFraction = 0.9) }
      time("delete") { DocStore.deleteMany(spark, store,
        Some(col("doc_id").between(250L, 259L))) }
      time("update3") { DocStore.updateMany(spark, store,
        col("doc_id").between(300L, 309L), Map("n_chars" -> (col("n_chars") + lit(7L)))) }
      time("read") { DocStore.find(spark, store)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id").collect().length }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
