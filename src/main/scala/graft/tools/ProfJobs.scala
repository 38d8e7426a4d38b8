package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Job-level profiler for one COW mutation + one IVF sync poll: registers
  * a listener and prints every Spark job's wall time and call site, so
  * the per-commit fixed constant decomposes into its actual jobs.
  */
object ProfJobs {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "profjobs")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.DocStore
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var label = "setup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val site = p.flatMap(pp => Option(pp.getProperty("callSite.short")))
          .orElse(p.flatMap(pp => Option(pp.getProperty("spark.job.description"))))
          .getOrElse("?") + " :: " +
          p.flatMap(pp => Option(pp.getProperty("callSite.long")))
            .getOrElse("").linesIterator.filter(_.contains("graft"))
            .take(2).mkString(" <- ")
        starts.put(js.jobId, (System.nanoTime(), s"$label | $site"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          println(f"[job] ${(System.nanoTime() - t0) / 1e9}%6.3f s  #${je.jobId}%-4d $site")
        }
      }
    })
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val head = qe.analyzed.toString.linesIterator.take(1).mkString
        println(f"[query] ${durationNs / 1e9}%6.3f s  $label | $funcName | ${head.take(110)}")
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    def time[T](l: String)(f: => T): T = {
      label = l
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.core.Tables.documents(spark, d).select("doc_id", "lang", "n_chars")
    val base = java.nio.file.Files.createTempDirectory("profjobs").toString
    val store = s"$base/store"
    time("seed") {
      DocStore.insertMany(docs, store)
      DocStore.compact(spark, store, targetFiles = 1, format = Some("parquet"))
      DocStore.cluster(spark, store, col("doc_id"), targetFiles = 8,
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id"))
    }
    Thread.sleep(300)
    println("=== one warm COW updateMany ===")
    time("update-warm1") { DocStore.updateMany(spark, store,
      col("doc_id").between(10L, 29L), Map("n_chars" -> (col("n_chars") + lit(50L)))) }
    Thread.sleep(300)
    time("update-warm2") { DocStore.updateMany(spark, store,
      col("doc_id").between(130L, 149L), Map("n_chars" -> (col("n_chars") + lit(50L)))) }
    Thread.sleep(300)
    time("vacuum") { DocStore.vacuum(spark, store, minLiveFraction = 0.9) }
    Thread.sleep(300)
    time("delete") { DocStore.deleteMany(spark, store,
      Some(col("doc_id").between(250L, 259L))) }
    Thread.sleep(300)
    time("find-read") { DocStore.find(spark, store)
      .select(col("doc_id"), col("lang"), col("n_chars")).orderBy("doc_id").count() }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    spark.stop()
  }
}
