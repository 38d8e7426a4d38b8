package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level profile of the d7_neardup_sync lifecycle: which of the
  * six steps (2 inserts, 3 polls, 1 delete) carries the cost that the
  * nearDupBatch stage marks don't account for.
  */
object ProfNd {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "profnd")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.sources.DocStore
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $l%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.core.Tables.documents(spark, d).select("doc_id", "text")
    docs.count() // warm the scan
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val base = java.nio.file.Files.createTempDirectory("profnd").toString
      val src = s"$base/src"; val idx = s"$base/idx"
      def poll(l: String) = time(l) {
        graft.streaming.Streams.syncNearDupIndex(spark, src, idx,
          idCol = "doc_id", textCol = "text", k = 3, threshold = 0.5)
      }
      time("insert1") { DocStore.insertMany(docs.filter(col("doc_id") % 3 === 0), src) }
      poll("poll1-seed")
      time("insert2") { DocStore.insertMany(docs.filter(col("doc_id") % 3 === 1), src) }
      poll("poll2-append")
      time("delete") { DocStore.deleteMany(spark, src, Some(col("doc_id") % 11 === 0)) }
      poll("poll3-takedown")
      time("read-matches") {
        spark.read.parquet(s"$idx/matches")
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy("id_a", "id_b").localCheckpoint(true)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
