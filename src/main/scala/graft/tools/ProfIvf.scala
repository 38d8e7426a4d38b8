package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the d9b steady-state IVF poll. */
object ProfIvf {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "profivf")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.DocStore
    @volatile var phase = "setup"
    if (sys.env.contains("GRAFT_PROFIVF_QUERIES"))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          val head = qe.analyzed.toString.linesIterator.take(1).mkString
          println(f"[q] ${durationNs / 1e9}%6.3f s  $phase | $funcName | ${head.take(100)}")
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    def time[T](label: String)(f: => T): T = {
      phase = label
      val t0 = System.nanoTime(); val r = f
      println(f"[profivf] $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val emb = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val model = time("fit") { graft.sim.Ann.cachedIvf(d,
      graft.core.Tables.embeddings(spark, d), nCells = 16, lloydIters = 2) }
    val base = java.nio.file.Files.createTempDirectory("profivf").toString
    time("seed") {
      DocStore.insertMany(emb.filter(col("vec_id") % 40 =!= 7), s"$base/src")
      DocStore.compact(spark, s"$base/src", targetFiles = 1, format = Some("parquet"))
      DocStore.cluster(spark, s"$base/src", col("vec_id"), targetFiles = 8,
        statsCols = Seq("vec_id"), bloomCols = Seq("vec_id"))
      graft.streaming.Streams.syncIvfIndex(spark, s"$base/src", s"$base/idx", model)
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val work = s"$base/run$rep"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(base + "/src"), new java.io.File(s"$work/src"))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(base + "/idx"), new java.io.File(s"$work/idx"))
      time("insert") { DocStore.insertMany(emb.filter(col("vec_id") % 40 === 7), s"$work/src") }
      time("delete") { DocStore.deleteMany(spark, s"$work/src",
        Some(col("vec_id").between(100L, 119L)), retain = 3) }
      time("poll") { graft.streaming.Streams.syncIvfIndex(spark, s"$work/src", s"$work/idx", model) }
      time("search") { graft.sim.Ann.ivfSearch(model, spark.read.parquet(s"$work/idx"),
          emb.filter(col("vec_id") < 10), k = 5, nProbe = 4)
        .select(col("q_id"), col("rk"), col("vec_id"))
        .orderBy("q_id", "rk").localCheckpoint(true).count() }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
